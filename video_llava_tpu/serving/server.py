"""OpenAI-compatible chat-completions server over our JAX Vicuna.

Replaces the FastChat-served Vicuna-13b-v1.5 judge endpoint the
reference assumes (quantitative_evaluation/README.md:5-16,
grounding_evaluation/eval_grounding.py annotate()): the judge scripts
and entity matching talk to this server through eval/openai_client.

Single-model, request-serialized (device programs are already the
bottleneck); batching across requests is a later optimization.
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, VideoLLaVAConfig
from video_llava_tpu.engine.generate import generate_with_keywords
from video_llava_tpu.runtime.conversation import conv_templates
from video_llava_tpu.runtime.tokenizer import Tokenizer


@dataclasses.dataclass
class ChatModel:
    """Text-only chat wrapper for serving."""

    params: dict
    cfg: VideoLLaVAConfig
    tokenizer: Tokenizer
    conv_mode: str = "vicuna_v1_1"
    cache_dtype: jnp.dtype = jnp.bfloat16
    seq_pad_multiple: int = 128

    def chat(
        self,
        messages: List[dict],
        temperature: float = 0.2,
        max_tokens: int = 512,
        seed: Optional[int] = None,
    ) -> str:
        conv = conv_templates[self.conv_mode].copy()
        system = [m["content"] for m in messages if m["role"] == "system"]
        if system:
            conv.system = system[0]
        for m in messages:
            if m["role"] == "user":
                conv.append_message(conv.roles[0], m["content"])
            elif m["role"] == "assistant":
                conv.append_message(conv.roles[1], m["content"])
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        tok = self.tokenizer
        ids = tok.encode(prompt)
        s_real = len(ids)
        pad = -s_real % self.seq_pad_multiple
        input_ids = np.full((1, s_real + pad), tok.pad_token_id, np.int32)
        input_ids[0, :s_real] = ids

        gen = GenerationConfig(
            max_new_tokens=max_tokens,
            temperature=temperature,
            do_sample=temperature > 0,
            eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
        )
        stop_str = conv.stop_string()
        text, _ = generate_with_keywords(
            self.params,
            self.cfg,
            gen,
            jnp.asarray(input_ids),
            jnp.asarray([s_real], jnp.int32),
            None,
            jax.random.PRNGKey(seed if seed is not None else 0),
            decode_fn=lambda t: tok.decode(t, skip_special_tokens=True),
            keywords=(stop_str,) if stop_str and stop_str != "</s>" else (),
            cache_dtype=self.cache_dtype,
        )
        if stop_str and text.endswith(stop_str):
            text = text[: -len(stop_str)]
        return text.strip()


def make_handler(model: ChatModel, model_name: str):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/").endswith("/models"):
                self._json(
                    200,
                    {"object": "list",
                     "data": [{"id": model_name, "object": "model"}]},
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.rstrip("/").endswith("/chat/completions"):
                self._json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length))
                with lock:
                    text = model.chat(
                        req["messages"],
                        temperature=float(req.get("temperature", 0.2)),
                        max_tokens=int(req.get("max_tokens", 512)),
                        seed=req.get("seed"),
                    )
                self._json(
                    200,
                    {
                        "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
                        "object": "chat.completion",
                        "created": int(time.time()),
                        "model": req.get("model", model_name),
                        "choices": [
                            {
                                "index": 0,
                                "message": {"role": "assistant", "content": text},
                                "finish_reason": "stop",
                            }
                        ],
                        "usage": {},
                    },
                )
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

    return Handler


def serve(
    model: ChatModel,
    host: str = "0.0.0.0",
    port: int = 8000,
    model_name: str = "vicuna-13b-v1.5",
    block: bool = True,
) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(model, model_name))
    if block:
        print(f"serving {model_name} on {host}:{port}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server

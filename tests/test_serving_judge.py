"""Serving + judge harness integration: our OpenAI-compatible server
over a tiny model, and the judge retry loop against a stub judge."""

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.eval.judge import aggregate, judge_messages, run_judge
from video_llava_tpu.eval.openai_client import ChatCompletionClient
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.tokenizer import ByteTokenizer
from video_llava_tpu.serving.server import ChatModel, serve


@pytest.fixture(scope="module")
def tiny_server():
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    model = ChatModel(
        params=params, cfg=cfg, tokenizer=tok, cache_dtype=jnp.float32,
        seq_pad_multiple=64,
    )
    server = serve(model, host="127.0.0.1", port=0, block=False)
    yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    server.shutdown()


def test_chat_completions_endpoint(tiny_server):
    client = ChatCompletionClient(api_base=tiny_server)
    out = client.create(
        "test-model",
        [{"role": "user", "content": "Hello"}],
        temperature=0.0,
        max_tokens=4,
    )
    assert out["object"] == "chat.completion"
    assert isinstance(out["choices"][0]["message"]["content"], str)


def test_models_endpoint(tiny_server):
    import requests

    resp = requests.get(tiny_server + "/models", timeout=10)
    assert resp.status_code == 200
    assert resp.json()["data"][0]["id"]


class _StubJudge(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        _ = self.rfile.read(length)
        body = json.dumps(
            {
                "choices": [
                    {"message": {"role": "assistant",
                                 "content": "{'pred': 'yes', 'score': 4}"}}
                ]
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_judge_harness_with_stub(tmp_path):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubJudge)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    api_base = f"http://127.0.0.1:{server.server_address[1]}/v1"

    preds = {
        f"vid_{i}": {"question": "q?", "answer": "a", "pred": "a"}
        for i in range(3)
    }
    out_dir = str(tmp_path / "judge")
    run_judge(preds, "activitynet_qa", out_dir, num_workers=2,
              api_base=api_base)
    results = aggregate(out_dir)
    assert results["accuracy"] == 1.0
    assert results["average_score"] == 4.0
    server.shutdown()


def test_judge_prompt_formats():
    msgs = judge_messages(
        "correctness", {"question": "Q", "answer": "A", "pred": "P"}
    )
    assert "factual accuracy" in msgs[0]["content"]
    assert "Question: Q" in msgs[1]["content"]
    msgs = judge_messages(
        "consistency",
        {"question1": "Q1", "question2": "Q2", "answer": "A",
         "pred1": "P1", "pred2": "P2"},
    )
    assert "Question 2: Q2" in msgs[1]["content"]


def test_batched_serving(tiny_server_factory=None):
    """Concurrent requests batch into one device program and all
    complete."""
    import concurrent.futures

    import dataclasses as _dc

    import jax as _jax
    import jax.numpy as _jnp

    from video_llava_tpu.config import LlamaConfig as _L, VideoLLaVAConfig as _V
    from video_llava_tpu.models import video_llava as _vl
    from video_llava_tpu.runtime.tokenizer import ByteTokenizer as _BT
    from video_llava_tpu.serving.server import ChatModel as _CM, serve as _serve

    tok = _BT()
    cfg = _dc.replace(
        _V.tiny(),
        llm=_L.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = _vl.init_params(_jax.random.PRNGKey(0), cfg, _jnp.float32)
    model = _CM(params=params, cfg=cfg, tokenizer=tok,
                cache_dtype=_jnp.float32, seq_pad_multiple=64)
    server = _serve(model, host="127.0.0.1", port=0, block=False,
                    batching=True, max_batch=4, window_ms=100)
    api = f"http://127.0.0.1:{server.server_address[1]}/v1"
    client = ChatCompletionClient(api_base=api)

    def ask(i):
        return client.chat_text(
            "m", [{"role": "user", "content": f"Question {i}?"}],
            temperature=0.0, max_tokens=4,
        )

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(ask, range(4)))
    assert len(outs) == 4
    assert all(isinstance(o, str) for o in outs)
    server.shutdown()


def test_chat_completions_streaming(tiny_server):
    """'stream': true returns OpenAI-style SSE chunks whose concatenated
    deltas match the non-streamed completion for the same request."""
    import requests

    body = {
        "model": "test-model",
        "messages": [{"role": "user", "content": "Hi"}],
        "temperature": 0.0,
        "max_tokens": 8,
        "seed": 0,
    }
    plain = requests.post(
        tiny_server + "/chat/completions", json=body, timeout=120
    ).json()["choices"][0]["message"]["content"]

    resp = requests.post(
        tiny_server + "/chat/completions",
        json={**body, "stream": True},
        stream=True,
        timeout=120,
    )
    assert resp.status_code == 200
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    chunks = []
    saw_done = False
    saw_role = False
    finish = None
    for line in resp.iter_lines():
        if not line:
            continue
        assert line.startswith(b"data: ")
        payload = line[len(b"data: "):]
        if payload == b"[DONE]":
            saw_done = True
            break
        obj = json.loads(payload)
        assert obj["object"] == "chat.completion.chunk"
        delta = obj["choices"][0]["delta"]
        if delta.get("role"):
            saw_role = True
        if "content" in delta:
            chunks.append(delta["content"])
        if obj["choices"][0]["finish_reason"]:
            finish = obj["choices"][0]["finish_reason"]
    assert saw_role and saw_done and finish == "stop"
    assert "".join(chunks).strip() == plain


def test_chat_model_speculative_matches_plain():
    """ChatModel(speculative=True) must produce the same greedy text as
    the plain path (PLD is exact for greedy)."""
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    kw = dict(params=params, cfg=cfg, tokenizer=tok,
              cache_dtype=jnp.float32, seq_pad_multiple=64)
    msgs = [{"role": "user", "content": "Rate this answer: the answer"}]
    plain = ChatModel(**kw).chat(msgs, temperature=0.0, max_tokens=8)
    spec = ChatModel(**kw, speculative=True).chat(
        msgs, temperature=0.0, max_tokens=8
    )
    assert spec == plain


def test_batched_serving_speculative_matches_plain():
    """The batching worker's speculative path returns the same greedy
    texts as its plain path. max_batch=1 keeps the batch composition
    deterministic across the two runs (argmax ties can break
    differently under different batch shapes); batch>1 equality is
    covered deterministically in tests/test_speculative.py."""
    import concurrent.futures

    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    def run(speculative):
        model = ChatModel(params=params, cfg=cfg, tokenizer=tok,
                          cache_dtype=jnp.float32, seq_pad_multiple=64,
                          speculative=speculative)
        server = serve(model, host="127.0.0.1", port=0, block=False,
                       batching=True, max_batch=1, window_ms=50)
        api = f"http://127.0.0.1:{server.server_address[1]}/v1"
        client = ChatCompletionClient(api_base=api)

        def ask(i):
            return client.chat_text(
                "m", [{"role": "user", "content": f"Question {i}?"}],
                temperature=0.0, max_tokens=6,
            )

        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            outs = list(ex.map(ask, range(3)))
        server.shutdown()
        return outs

    assert run(True) == run(False)


def test_batching_worker_stops_on_shutdown():
    """server.shutdown() must stop the BatchingChatModel worker thread
    (leaked forever-waiting workers from earlier tests accumulated in
    long single-process suite runs — see serving/server.py close())."""
    import jax as _jax
    import jax.numpy as _jnp

    from video_llava_tpu.config import VideoLLaVAConfig as _VC
    from video_llava_tpu.models import video_llava as _vl
    from video_llava_tpu.runtime.tokenizer import ByteTokenizer
    from video_llava_tpu.serving.server import ChatModel as _CM, serve as _serve
    import dataclasses as _dc

    tok = ByteTokenizer()
    base = _VC.tiny()
    cfg = _dc.replace(
        base,
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = _vl.init_params(_jax.random.PRNGKey(0), cfg, _jnp.float32)
    model = _CM(params=params, cfg=cfg, tokenizer=tok,
                cache_dtype=_jnp.float32, seq_pad_multiple=64)
    server = _serve(model, host="127.0.0.1", port=0, block=False,
                    batching=True, max_batch=2, window_ms=10)
    server.shutdown()
    # after shutdown the batching worker must exit (close() joins it)
    import threading as _th
    import time as _time

    deadline = _time.time() + 10
    while _time.time() < deadline:
        alive = [
            t for t in _th.enumerate()
            if getattr(t, "_target", None) is not None
            and getattr(t._target, "__qualname__", "").startswith(
                "BatchingChatModel._run"
            )
            and t.is_alive()
        ]
        if not alive:
            break
        _time.sleep(0.1)
    assert not alive, "BatchingChatModel worker still running after shutdown"

"""Continuous-batching serving mode (serving/server.py
ContinuousChatModel over engine/continuous.py): concurrent requests
interleave in the persistent slot batch, results match the plain
ChatModel's greedy output, and streaming deltas concatenate to the
JSON text."""

import dataclasses
import concurrent.futures
import json

import jax
import jax.numpy as jnp
import pytest

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.eval.openai_client import ChatCompletionClient
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.tokenizer import ByteTokenizer
from video_llava_tpu.serving.server import (
    ChatModel,
    ContinuousChatModel,
    serve,
)


@pytest.fixture(scope="module")
def plain_model():
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return ChatModel(
        params=params, cfg=cfg, tokenizer=tok, cache_dtype=jnp.float32,
        seq_pad_multiple=16, speculative=False,
    )


@pytest.fixture(scope="module")
def cont_server(plain_model):
    server = serve(
        plain_model, host="127.0.0.1", port=0, block=False,
        continuous=True, num_slots=2, max_cache_len=256,
    )
    yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    server.shutdown()


def test_concurrent_requests_interleave(cont_server, plain_model):
    """4 concurrent greedy requests through 2 slots all match the
    plain (non-batched) ChatModel output."""
    client = ChatCompletionClient(api_base=cont_server)

    def ask(i):
        return client.chat_text(
            "m", [{"role": "user", "content": f"Question {i}?"}],
            temperature=0.0, max_tokens=6,
        )

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(ask, range(4)))
    for i, out in enumerate(outs):
        exp = plain_model.chat(
            [{"role": "user", "content": f"Question {i}?"}],
            temperature=0.0, max_tokens=6,
        )
        assert out == exp, i


def test_metrics_and_health_endpoints(cont_server):
    import requests

    assert requests.get(
        cont_server + "/healthz", timeout=10
    ).json()["status"] == "ok"
    m = requests.get(cont_server + "/metrics", timeout=10).json()
    assert m["slots_total"] == 2
    assert "spec_chunks" in m and "pending" in m


def test_continuous_streaming_matches_json(cont_server):
    import requests

    body = {
        "model": "m",
        "messages": [{"role": "user", "content": "Stream this"}],
        "temperature": 0.0,
        "max_tokens": 6,
    }
    plain = requests.post(
        cont_server + "/chat/completions", json=body, timeout=120
    ).json()["choices"][0]["message"]["content"]

    resp = requests.post(
        cont_server + "/chat/completions", json={**body, "stream": True},
        timeout=120, stream=True,
    )
    pieces, finished = [], False
    for line in resp.iter_lines():
        if not line or not line.startswith(b"data: "):
            continue
        payload = line[len(b"data: ") :]
        if payload == b"[DONE]":
            finished = True
            break
        chunk = json.loads(payload)
        delta = chunk["choices"][0]["delta"]
        if "content" in delta:
            pieces.append(delta["content"])
    assert finished
    assert "".join(pieces) == plain


@pytest.fixture(scope="module")
def paged_server(plain_model):
    server = serve(
        plain_model, host="127.0.0.1", port=0, block=False,
        continuous=True, num_slots=2, max_cache_len=256,
        prefix_cache=True,  # implies paged
    )
    yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    server.shutdown()


def test_paged_prefix_server_matches_plain(paged_server, plain_model):
    """--prefix_cache serving: repeated conversation prefixes (the
    template preamble) skip prefill; answers still match the plain
    ChatModel, and /metrics reports the hits and pool state."""
    import urllib.request

    client = ChatCompletionClient(api_base=paged_server)
    msgs = lambda q: [  # noqa: E731
        {"role": "system", "content": "You are a helpful assistant "
         "answering questions about videos carefully."},
        {"role": "user", "content": q},
    ]
    for q in ("First question?", "Second, sharing the preamble?"):
        out = client.chat_text("m", msgs(q), temperature=0.0, max_tokens=6)
        assert out == plain_model.chat(msgs(q), temperature=0.0,
                                       max_tokens=6)
    metrics = json.loads(
        urllib.request.urlopen(
            paged_server.replace("/v1", "/metrics")
        ).read()
    )
    assert metrics["prefix_hit_tokens"] > 0
    assert metrics["prefix_blocks_cached"] > 0
    assert metrics["blocks_free"] > 0

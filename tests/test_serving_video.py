"""Multimodal (video) serving over the OpenAI chat-completions API.

The reference exposes video chat only through its gradio demo
(video_chatgpt/demo/video_demo.py); here the same product pipeline —
native decode, CLIP encode + pooling + projection, feature splice —
serves OpenAI vision-style requests ({"type": "video_url"} content
parts) on the chat-completions endpoint (serving/server.py)."""

import base64
import dataclasses

import numpy as np
import pytest
import requests

import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.tokenizer import ByteTokenizer
from video_llava_tpu.serving.server import (
    ChatModel,
    _load_video_frames,
    _split_content,
    serve,
)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    from video_llava_tpu.media.loader import encode_video

    rng = np.random.default_rng(3)
    path = tmp_path_factory.mktemp("vids") / "clip.mp4"
    encode_video(
        str(path),
        rng.integers(0, 255, size=(12, 64, 64, 3), dtype=np.uint8),
        fps=8,
        codec="mpeg4",
    )
    return str(path)


@pytest.fixture(scope="module")
def tiny_video_server():
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


def _video_messages(url, text="What is happening in the video?"):
    return [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": text},
                {"type": "video_url", "video_url": {"url": url}},
            ],
        }
    ]


def test_split_content_forms():
    assert _split_content("hi") == ("hi", [])
    text, media = _split_content(
        [
            {"type": "text", "text": "a"},
            {"type": "video_url", "video_url": {"url": "file:///x.mp4"}},
            {"type": "text", "text": "b"},
        ]
    )
    assert text == "a\nb" and media == ["file:///x.mp4"]
    with pytest.raises(ValueError):
        _split_content([{"type": "image_url", "image_url": {"url": "u"}}])


def test_load_video_frames_path_and_data_url(video_path):
    frames = _load_video_frames(video_path, 56)
    assert frames.shape[1:] == (56, 56, 3) and frames.dtype == np.uint8
    with open(video_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    frames2 = _load_video_frames(f"data:video/mp4;base64,{b64}", 56)
    np.testing.assert_array_equal(frames, frames2)
    frames3 = _load_video_frames("file://" + video_path, 56)
    np.testing.assert_array_equal(frames, frames3)


def test_video_chat_completion(tiny_video_server, video_path):
    resp = requests.post(
        tiny_video_server + "/chat/completions",
        json={
            "model": "tiny",
            "messages": _video_messages(video_path),
            "max_tokens": 8,
            "temperature": 0.0,
        },
        timeout=300,
    )
    assert resp.status_code == 200, resp.text
    msg = resp.json()["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)


def test_video_chat_completion_data_url_stream(tiny_video_server, video_path):
    with open(video_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    resp = requests.post(
        tiny_video_server + "/chat/completions",
        json={
            "model": "tiny",
            "messages": _video_messages(f"data:video/mp4;base64,{b64}"),
            "max_tokens": 8,
            "temperature": 0.0,
            "stream": True,
        },
        timeout=300,
        stream=True,
    )
    assert resp.status_code == 200
    lines = [l for l in resp.iter_lines() if l]
    assert lines[-1] == b"data: [DONE]"


def test_video_prompt_matches_inference_runtime(tiny_video_server,
                                                video_path):
    """The served prompt must carry the reference's video-token block
    exactly where runtime.inference puts it (same splice contract)."""
    from video_llava_tpu.runtime.inference import build_video_question

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
    ids, _, media = model.build_prompt(_video_messages(video_path, "Q?"))
    want_block = build_video_question(
        "Q?", cfg.video_token_len, cfg.use_vid_start_end
    )
    assert media == [video_path]
    ids_plain, _, _ = model.build_prompt(
        [{"role": "user", "content": want_block}]
    )
    assert ids == ids_plain


def _tiny_model(speculative=False):
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
        seq_pad_multiple=64, speculative=speculative,
    )


def test_video_through_continuous_server(video_path):
    """Video requests on a --continuous server route through the
    single-shot feature-splice path (the slot engine is token-id
    based); text requests keep using the slot engine."""
    server = serve(
        _tiny_model(), host="127.0.0.1", port=0, block=False,
        continuous=True, num_slots=2, max_cache_len=512,
    )
    base = f"http://127.0.0.1:{server.server_address[1]}/v1"
    try:
        resp = requests.post(
            base + "/chat/completions",
            json={"model": "tiny",
                  "messages": _video_messages(video_path),
                  "max_tokens": 6, "temperature": 0.0},
            timeout=300,
        )
        assert resp.status_code == 200, resp.text
        resp2 = requests.post(
            base + "/chat/completions",
            json={"model": "tiny",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 6, "temperature": 0.0},
            timeout=300,
        )
        assert resp2.status_code == 200, resp2.text
    finally:
        server.shutdown()


def test_video_through_batching_server(video_path):
    """Video requests on a --batching server run via run_exclusive on
    the worker thread (serialized with batched text generation)."""
    server = serve(
        _tiny_model(), host="127.0.0.1", port=0, block=False,
        batching=True, max_batch=2, window_ms=10,
    )
    base = f"http://127.0.0.1:{server.server_address[1]}/v1"
    try:
        resp = requests.post(
            base + "/chat/completions",
            json={"model": "tiny",
                  "messages": _video_messages(video_path),
                  "max_tokens": 6, "temperature": 0.0},
            timeout=300,
        )
        assert resp.status_code == 200, resp.text
    finally:
        server.shutdown()


def test_two_videos_rejected(tiny_video_server, video_path):
    messages = _video_messages(video_path) + _video_messages(video_path)
    resp = requests.post(
        tiny_video_server + "/chat/completions",
        json={"model": "tiny", "messages": messages, "max_tokens": 4},
        timeout=60,
    )
    assert resp.status_code == 500
    assert "one video" in resp.json()["error"]

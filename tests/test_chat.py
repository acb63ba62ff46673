"""Chat interface: multi-turn session mechanics with a tiny engine."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.chat import VideoChatGPTInterface
from video_llava_tpu.runtime.inference import InferenceEngine
from video_llava_tpu.runtime.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def chat(tmp_path_factory):
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    engine = InferenceEngine(
        params=params, cfg=cfg, tokenizer=tok,
        gen=GenerationConfig(max_new_tokens=4, do_sample=False),
        seq_pad_multiple=64, cache_dtype=jnp.float32,
    )
    iface = VideoChatGPTInterface(engine, temperature=0.0)

    # synthesize + upload a video
    from video_llava_tpu.media.loader import encode_video

    vdir = tmp_path_factory.mktemp("chatvid")
    path = str(vdir / "v.mp4")
    rng = np.random.default_rng(0)
    encode_video(
        path, rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8), fps=4,
        codec="mpeg4",
    )
    iface.upload_video(path)
    return iface, path


def test_first_turn_injects_video_token(chat):
    iface, path = chat
    iface.clear_history()
    iface.upload_video(path)
    iface.add_text("What is happening?", path)
    assert "<video>" in iface.state.messages[-2][1]
    out = iface.answer()
    assert isinstance(out, str)
    assert iface.state.messages[-1][-1] == out
    assert not iface.first_run


def test_multi_turn_keeps_history(chat):
    iface, path = chat
    iface.add_text("And then?", path)
    # second turn: no video token injection
    assert "<video>" not in iface.state.messages[-2][1]
    out = iface.answer()
    assert isinstance(out, str)
    assert len(iface.state.messages) >= 4


def test_long_input_truncated(chat):
    iface, path = chat
    iface.clear_history()
    iface.upload_video(path)
    iface.add_text("x" * 5000, path)
    msg = iface.state.messages[-2][1]
    assert len(msg) <= 1200 + len("\n<video>")


def test_post_process_code():
    f = VideoChatGPTInterface._post_process_code
    assert f("a\n```py\\_x\n```b") == "a\n```py_x\n```b"
    assert f("no code \\_ here") == "no code \\_ here"

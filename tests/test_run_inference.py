"""End-to-end QA runner: tiny model + synthetic encoded videos through
the dataset loop, output-JSON shape parity with the reference runners."""

import dataclasses
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.eval.run_inference import run_consistency, run_qa
from video_llava_tpu.media.loader import encode_video
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.inference import InferenceEngine
from video_llava_tpu.runtime.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def engine_and_videos(tmp_path_factory):
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
        params=params,
        cfg=cfg,
        tokenizer=tok,
        gen=GenerationConfig(max_new_tokens=4, do_sample=False),
        seq_pad_multiple=64,
        cache_dtype=jnp.float32,
    )
    vdir = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    for name in ["clip_a", "clip_b"]:
        frames = rng.integers(0, 255, size=(12, 64, 64, 3), dtype=np.uint8)
        encode_video(str(vdir / f"{name}.mp4"), frames, fps=6, codec="mpeg4")
    return engine, str(vdir)


def test_run_qa(engine_and_videos):
    engine, vdir = engine_and_videos
    samples = [
        {"id": 1, "video_name": "clip_a", "question": "What?", "answer": "x"},
        {"id": 2, "video_name": "missing", "question": "?", "answer": "y"},
        {"id": 3, "video_name": "clip_b", "question": "Who?", "answer": "z"},
    ]
    results = run_qa(engine, samples, vdir, "pg-video-llava", num_frames=8)
    # missing video is skipped, the others produce predictions
    assert [r["id"] for r in results] == [1, 3]
    assert all("pred" in r and isinstance(r["pred"], str) for r in results)
    assert results[0]["answer"] == "x"  # pass-through fields preserved


def test_run_consistency(engine_and_videos):
    engine, vdir = engine_and_videos
    samples = [
        {"video_name": "clip_a", "Q1": "What?", "Q2": "What exactly?", "A": "x"}
    ]
    results = run_consistency(engine, samples, vdir, "pg-video-llava",
                              num_frames=8)
    assert len(results) == 1
    assert "pred1" in results[0] and "pred2" in results[0]

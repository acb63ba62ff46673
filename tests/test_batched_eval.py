"""Batched QA runner: batch results match shapes/fields and survive
missing videos; Orbax checkpoint round trip."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.eval.run_inference import run_qa_batched
from video_llava_tpu.media.loader import encode_video
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.inference import InferenceEngine
from video_llava_tpu.runtime.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
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
    vdir = tmp_path_factory.mktemp("bvids")
    rng = np.random.default_rng(0)
    for name in ["a", "b", "c"]:
        encode_video(
            str(vdir / f"{name}.mp4"),
            rng.integers(0, 255, size=(6, 64, 64, 3), dtype=np.uint8),
            fps=3, codec="mpeg4",
        )
    return engine, str(vdir)


def test_batched_runner(setup):
    engine, vdir = setup
    samples = [
        {"id": i, "video_name": n, "question": f"Q{i}?", "answer": "x"}
        for i, n in enumerate(["a", "b", "missing", "c"])
    ]
    results = run_qa_batched(
        engine, samples, vdir, "pg-video-llava", batch_size=2, num_frames=8,
        max_new_tokens=4,
    )
    assert [r["id"] for r in results] == [0, 1, 3]
    assert all(isinstance(r["pred"], str) for r in results)


def test_orbax_roundtrip(tmp_path, setup):
    engine, _ = setup
    from video_llava_tpu.engine.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {"params": engine.params["projector"], "step": jnp.int32(7)}
    save_checkpoint(str(tmp_path), 7, state)
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-7")
    target = jax.tree.map(np.zeros_like, state)
    restored = restore_checkpoint(latest_checkpoint(str(tmp_path)), target)
    assert int(restored["step"]) == 7
    a = jax.tree.leaves(state["params"])[0]
    b = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_continuous_runner_matches_batched(setup):
    """run_qa_continuous: same greedy predictions as run_qa_batched,
    same missing-video fault tolerance, slot-engine scheduling."""
    from video_llava_tpu.eval.run_inference import run_qa_continuous

    engine, vdir = setup
    samples = [
        {"id": i, "video_name": n, "question": f"Q{i}?", "answer": "x"}
        for i, n in enumerate(["a", "b", "missing", "c"])
    ]
    batched = run_qa_batched(
        engine, samples, vdir, "pg-video-llava", batch_size=2,
        num_frames=8, max_new_tokens=4,
    )
    cont = run_qa_continuous(
        engine, samples, vdir, "pg-video-llava", batch_size=2,
        num_slots=2, max_cache_len=1024, num_frames=8, max_new_tokens=4,
    )
    assert [r["id"] for r in cont] == [0, 1, 3]
    assert [r["pred"] for r in cont] == [r["pred"] for r in batched]

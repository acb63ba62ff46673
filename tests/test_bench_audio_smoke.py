"""Smoke test of bench.py's BASELINE-config-4 audio harness
(_make_wav/_build_transcriber/_bench_audio) at tiny scale on CPU —
the on-chip bench only changes the component sizes."""

import importlib
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_audio_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("BENCH_AUDIO_SIZE", "tiny-test")
    monkeypatch.setenv("BENCH_AUDIO_PATH", str(tmp_path / "a.wav"))
    monkeypatch.setenv("BENCH_AUDIO_ITERS", "1")
    monkeypatch.syspath_prepend(REPO_ROOT)
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")

    bench._make_wav(str(tmp_path / "a.wav"), seconds=35)  # 2 chunks

    calls = {}

    def fake_e2e(params, frames, ids, lens, rng):
        calls["ids"] = np.asarray(ids)
        return jnp.zeros((1, 4), jnp.int32)

    out = bench._bench_audio(
        fake_e2e, {}, None, jnp.zeros((1, 16), jnp.int32), None
    )
    assert out["audio_decode_s"] > 0
    assert out["asr_s"] > 0
    assert out["align_s"] >= 0
    assert out["transcript_s"] >= out["audio_decode_s"]
    assert out["e2e_with_audio_s"] >= out["transcript_s"]
    assert out["transcript_chars"] > 0
    # the transcript actually reached the prompt
    assert calls["ids"].shape == (1, 16)

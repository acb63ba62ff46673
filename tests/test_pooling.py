"""Spatio-temporal pooling: parity with the reference formula
(video_chatgpt/inference.py:13-44) and Pallas-vs-jnp agreement."""

import numpy as np
import jax.numpy as jnp

from video_llava_tpu.ops.pooling import (
    spatio_temporal_pool,
    spatio_temporal_pool_pallas,
)


def _reference_pool_np(features: np.ndarray) -> np.ndarray:
    """Direct transcription of the documented semantics: mean over
    space per frame (zero-padded to 100 rows) ++ mean over time."""
    t, s, c = features.shape
    temporal = features.mean(axis=1)
    if t < 100:
        temporal = np.concatenate(
            [temporal, np.zeros((100 - t, c), features.dtype)], axis=0
        )
    spatial = features.mean(axis=0)
    return np.concatenate([temporal, spatial], axis=0)


def test_full_length_video():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 256, 64)).astype(np.float32)
    got = np.asarray(spatio_temporal_pool(jnp.asarray(x), out_dtype=jnp.float32))
    np.testing.assert_allclose(got, _reference_pool_np(x), rtol=1e-5, atol=1e-5)
    assert got.shape == (356, 64)


def test_short_video_padding():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(7, 16, 32)).astype(np.float32)
    got = np.asarray(spatio_temporal_pool(jnp.asarray(x), out_dtype=jnp.float32))
    np.testing.assert_allclose(got, _reference_pool_np(x), rtol=1e-5, atol=1e-5)
    # padded temporal rows are exactly zero
    assert (got[7:100] == 0).all()


def test_masked_static_shape_matches_dynamic():
    """Static t=100 with num_valid_frames=n must equal pooling the first
    n frames dynamically (the reference's variable-length behavior)."""
    rng = np.random.default_rng(2)
    n = 23
    x = np.zeros((100, 16, 32), np.float32)
    x[:n] = rng.normal(size=(n, 16, 32)).astype(np.float32)
    got = np.asarray(
        spatio_temporal_pool(
            jnp.asarray(x), num_valid_frames=jnp.int32(n), out_dtype=jnp.float32
        )
    )
    want = _reference_pool_np(x[:n])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batched():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 100, 16, 32)).astype(np.float32)
    n = jnp.asarray([100, 50], jnp.int32)
    got = np.asarray(
        spatio_temporal_pool(jnp.asarray(x), num_valid_frames=n, out_dtype=jnp.float32)
    )
    assert got.shape == (2, 116, 32)
    x1 = x[1].copy()
    x1[50:] = 0
    np.testing.assert_allclose(
        got[1], _reference_pool_np(x1[:50]), rtol=1e-5, atol=1e-5
    )


def test_pallas_matches_jnp():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(100, 256, 128)).astype(np.float32)
    want = np.asarray(spatio_temporal_pool(jnp.asarray(x), out_dtype=jnp.float32))
    got = np.asarray(
        spatio_temporal_pool_pallas(
            jnp.asarray(x), out_dtype=jnp.float32, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_masked():
    rng = np.random.default_rng(5)
    x = np.zeros((100, 64, 128), np.float32)
    x[:31] = rng.normal(size=(31, 64, 128)).astype(np.float32)
    want = np.asarray(
        spatio_temporal_pool(
            jnp.asarray(x), num_valid_frames=jnp.int32(31), out_dtype=jnp.float32
        )
    )
    got = np.asarray(
        spatio_temporal_pool_pallas(
            jnp.asarray(x),
            num_valid_frames=jnp.int32(31),
            out_dtype=jnp.float32,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

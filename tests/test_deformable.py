"""Multi-scale deformable attention vs the HF torch reference."""

import numpy as np
import torch
import jax.numpy as jnp

from video_llava_tpu.ops.deformable import multi_scale_deformable_attention


def _hf_msda(value, spatial_shapes, locs, weights):
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        MultiScaleDeformableAttention,
    )

    fn = MultiScaleDeformableAttention()
    return fn(
        torch.from_numpy(value),
        torch.as_tensor(spatial_shapes, dtype=torch.long),
        list(spatial_shapes),
        None,
        torch.from_numpy(locs),
        torch.from_numpy(weights),
        64,
    ).numpy()


def test_msda_matches_hf():
    rng = np.random.default_rng(0)
    b, nh, d, q, p = 2, 4, 8, 10, 4
    shapes = [(8, 12), (4, 6), (2, 3)]
    total = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, total, nh, d)).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, size=(b, q, nh, len(shapes), p, 2)).astype(
        np.float32
    )
    w = rng.uniform(size=(b, q, nh, len(shapes), p)).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    want = _hf_msda(value, shapes, locs, w)
    got = np.asarray(
        multi_scale_deformable_attention(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_msda_out_of_bounds_zero_padding():
    rng = np.random.default_rng(1)
    b, nh, d, q, p = 1, 2, 4, 3, 2
    shapes = [(4, 4)]
    value = rng.normal(size=(b, 16, nh, d)).astype(np.float32)
    # all locations far outside -> zeros
    locs = np.full((b, q, nh, 1, p, 2), 3.0, np.float32)
    w = np.ones((b, q, nh, 1, p), np.float32) / p
    got = np.asarray(
        multi_scale_deformable_attention(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-7)
    want = _hf_msda(value, shapes, locs, w)
    np.testing.assert_allclose(got, want, atol=1e-6)

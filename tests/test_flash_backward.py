"""Pallas flash-attention backward kernels vs XLA autodiff oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.ops.attention import attention_reference, flash_attention


def _grads(fn, q, k, v):
    return jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) * 0.1) ** 2,
                    argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,skv", [(64, 64), (67, 67)])
def test_bwd_matches_xla(causal, sq, skv):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, sq, 4, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, skv, 4, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, skv, 4, 32)).astype(np.float32))
    g1 = _grads(
        lambda q, k, v: flash_attention(q, k, v, causal, None, 32, 32, True),
        q, k, v,
    )
    g2 = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=causal), q, k, v
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_bwd_gqa():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 32, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32))
    g1 = _grads(
        lambda q, k, v: flash_attention(q, k, v, True, None, 16, 16, True),
        q, k, v,
    )
    g2 = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=True), q, k, v
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_bwd_right_aligned():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 48, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 48, 2, 32)).astype(np.float32))
    g1 = _grads(
        lambda q, k, v: flash_attention(q, k, v, True, None, 16, 16, True),
        q, k, v,
    )
    g2 = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=True), q, k, v
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

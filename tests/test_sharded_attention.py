"""shard_map-wrapped Pallas flash attention on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.ops.attention import (
    attention_reference,
    sharded_flash_attention,
)
from video_llava_tpu.parallel import make_mesh


def test_sharded_matches_reference():
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(0)
    # batch 2 shards on 'data'(2); 8 heads shard on 'model'(4)
    q = jnp.asarray(rng.normal(size=(2, 64, 8, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 8, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 8, 32)).astype(np.float32))
    want = attention_reference(q, k, v, causal=True)
    got = sharded_flash_attention(q, k, v, mesh, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sharded_gqa():
    mesh = make_mesh(1, 4)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 32, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 32, 4, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 32, 4, 16)).astype(np.float32))
    want = attention_reference(q, k, v, causal=False)
    got = sharded_flash_attention(q, k, v, mesh, causal=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dispatch_guard():
    from video_llava_tpu.ops.attention import _sharded_dispatch_ok

    mesh = make_mesh(2, 4)
    q = jnp.zeros((2, 8, 8, 16))
    k = jnp.zeros((2, 8, 8, 16))
    assert _sharded_dispatch_ok(q, k, mesh)
    assert not _sharded_dispatch_ok(jnp.zeros((3, 8, 8, 16)), k, mesh)
    assert not _sharded_dispatch_ok(jnp.zeros((2, 8, 6, 16)), k, mesh)
    assert not _sharded_dispatch_ok(q, k, None)

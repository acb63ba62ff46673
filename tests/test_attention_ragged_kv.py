"""Flash attention with non-block-aligned KV (e.g. CLIP's 257 tokens)."""

import numpy as np
import jax.numpy as jnp

from video_llava_tpu.ops.attention import attention_reference, flash_attention


def test_noncausal_ragged_kv():
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 257, 4, 64  # CLIP ViT-L token count
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    want = attention_reference(q, k, v, causal=False)
    got = flash_attention(q, k, v, False, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_causal_ragged_kv():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 45, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 45, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 45, 2, 32)).astype(np.float32))
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, None, 16, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

"""Flash attention kernel vs XLA reference, incl. causal, GQA,
ragged shapes, right-aligned offsets, decode masking, and gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.ops.attention import (
    attention_reference,
    decode_attention,
    flash_attention,
)


def _rand_qkv(rng, b, sq, skv, h, h_kv, d, dtype=np.float32):
    q = rng.normal(size=(b, sq, h, d)).astype(dtype)
    k = rng.normal(size=(b, skv, h_kv, d)).astype(dtype)
    v = rng.normal(size=(b, skv, h_kv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,skv", [(64, 64), (128, 128)])
def test_flash_matches_reference(causal, sq, skv):
    q, k, v = _rand_qkv(np.random.default_rng(0), 2, sq, skv, 4, 4, 64)
    want = attention_reference(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal, None, 32, 32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_ragged_q_causal():
    """sq not a multiple of block_q; causal padding correctness."""
    q, k, v = _rand_qkv(np.random.default_rng(1), 1, 67, 67, 2, 2, 32)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, None, 32, 32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gqa():
    q, k, v = _rand_qkv(np.random.default_rng(2), 2, 64, 64, 8, 2, 32)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, None, 32, 32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_right_aligned_causal():
    """sq < skv: queries sit at the end of the key sequence (chunked
    prefill convention)."""
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 16, 80, 2, 2, 32)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, None, 16, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match_reference():
    q, k, v = _rand_qkv(np.random.default_rng(4), 1, 32, 32, 2, 2, 32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, True, None, 16, 16, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_decode_attention_masks_cache_tail():
    """Decode over a half-filled cache must equal attention over only
    the valid prefix."""
    rng = np.random.default_rng(5)
    b, L, h, d, n = 2, 64, 4, 32, 40
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, L, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, L, h, d)).astype(np.float32))
    lens = jnp.asarray([n, L], jnp.int32)
    got = decode_attention(q, k, v, lens)
    want0 = attention_reference(q[:1], k[:1, :n], v[:1, :n])
    want1 = attention_reference(q[1:], k[1:], v[1:])
    np.testing.assert_allclose(np.asarray(got[:1]), np.asarray(want0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1:]), np.asarray(want1), atol=2e-5)


def test_flash_bhsd_matches_bshd():
    """Pre-transposed/pre-padded entry == the BSHD flash path on the
    valid rows (pad keys masked via kv_len)."""
    import numpy as np
    from video_llava_tpu.ops.attention import (
        flash_attention,
        flash_attention_bhsd,
    )

    rng = np.random.default_rng(0)
    b, s, h, d = 2, 23, 4, 32
    s_pad = 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    want = flash_attention(q, k, v, causal=False, interpret=True)

    pad = lambda a: jnp.pad(
        a.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
    )
    got = flash_attention_bhsd(
        pad(q), pad(k), pad(v), kv_len=s, interpret=True
    )
    got = got[:, :, :s].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_flash_bhsd_long_nondivisible_pad():
    """s_pad > 512 whose only 16-multiple divisors are small (592 =
    16*37, the 336px CLIP pad): block sizes must divide s or the floor
    grid silently drops the last query rows (adversarial-review
    regression)."""
    import numpy as np
    from video_llava_tpu.ops.attention import (
        attention_reference,
        flash_attention_bhsd,
    )

    rng = np.random.default_rng(1)
    b, s, h, d = 1, 577, 2, 32
    s_pad = 592
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    lens = jnp.full((b,), s, jnp.int32)
    want = attention_reference(q, k, v, kv_valid_len=lens)

    pad = lambda a: jnp.pad(
        a.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
    )
    got = flash_attention_bhsd(
        pad(q), pad(k), pad(v), kv_len=s, interpret=True
    )
    got = got[:, :, :s].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

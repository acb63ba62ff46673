"""Pallas decode-attention kernel vs the masked XLA reference, bf16 and
int8 cache variants, GQA."""

import numpy as np
import jax.numpy as jnp

from video_llava_tpu.models.llama import _dequantize_kv, _quantize_kv
from video_llava_tpu.ops.attention import (
    attention_reference,
    decode_attention_pallas,
)


def _data(rng, b, L, h, h_kv, d):
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, L, h_kv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, L, h_kv, d)).astype(np.float32))
    lens = jnp.asarray([L // 2, L], jnp.int32)[:b]
    return q, k, v, lens


def test_bf16_cache_matches_reference():
    rng = np.random.default_rng(0)
    q, k, v, lens = _data(rng, 2, 64, 8, 8, 32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = decode_attention_pallas(q, k, v, lens, block_l=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_gqa_cache():
    rng = np.random.default_rng(1)
    q, k, v, lens = _data(rng, 2, 64, 8, 2, 32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = decode_attention_pallas(q, k, v, lens, block_l=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_int8_cache_matches_dequantized_reference():
    rng = np.random.default_rng(2)
    q, k, v, lens = _data(rng, 2, 64, 4, 4, 32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    want = attention_reference(
        q, _dequantize_kv(kq, ks, jnp.float32),
        _dequantize_kv(vq, vs, jnp.float32), kv_valid_len=lens,
    )
    # llama._quantize_kv returns the 4D KVCache scale layout; per-layer
    # kernels take the broadcastable (..., h, 1) form
    got = decode_attention_pallas(
        q, kq, vq, lens, k_scale=ks[..., None], v_scale=vs[..., None],
        block_l=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


# -- MXU (block-diagonal matmul) decode kernel --------------------------------


def test_mxu_bf16_cache_matches_reference():
    from video_llava_tpu.ops.attention import decode_attention_mxu

    rng = np.random.default_rng(3)
    q, k, v, lens = _data(rng, 2, 96, 8, 8, 32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = decode_attention_mxu(q, k, v, lens, block_l=32, interpret=True)
    # bf16 MXU dots vs f32 reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_mxu_int8_cache_matches_dequantized_reference():
    from video_llava_tpu.ops.attention import decode_attention_mxu

    rng = np.random.default_rng(4)
    q, k, v, lens = _data(rng, 2, 64, 4, 4, 32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    want = attention_reference(
        q, _dequantize_kv(kq, ks, jnp.float32),
        _dequantize_kv(vq, vs, jnp.float32), kv_valid_len=lens,
    )
    got = decode_attention_mxu(
        q, kq, vq, lens, k_scale=ks, v_scale=vs, block_l=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_mxu_full_and_single_block_lengths():
    """Length masking across blocks: len < one block, len == L."""
    from video_llava_tpu.ops.attention import decode_attention_mxu

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 1, 4, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 128, 4, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 128, 4, 32)).astype(np.float32))
    lens = jnp.asarray([7, 128], jnp.int32)
    want = attention_reference(q, k, v, kv_valid_len=lens)
    got = decode_attention_mxu(q, k, v, lens, block_l=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_mxu_stacked_matches_per_layer():
    """Whole-cache scalar-prefetch variant == slicing each layer into
    the per-layer MXU kernel (bf16 and int8 caches)."""
    from video_llava_tpu.ops.attention import (
        decode_attention_mxu,
        decode_attention_mxu_stacked,
    )

    rng = np.random.default_rng(6)
    nl, b, L, h, d = 3, 2, 64, 4, 32
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(nl, b, L, h, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(nl, b, L, h, d)).astype(np.float32))
    lens = jnp.asarray([23, 64], jnp.int32)
    for li in range(nl):
        want = decode_attention_mxu(
            q, kf[li], vf[li], lens, block_l=32, interpret=True
        )
        got = decode_attention_mxu_stacked(
            q, kf, vf, jnp.int32(li), lens, block_l=32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


def test_mxu_stacked_int8_cache_matches_per_layer():
    from video_llava_tpu.ops.attention import (
        decode_attention_mxu,
        decode_attention_mxu_stacked,
    )

    rng = np.random.default_rng(7)
    nl, b, L, h, d = 2, 1, 64, 4, 32
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    k = rng.normal(size=(nl, b, L, h, d)).astype(np.float32)
    v = rng.normal(size=(nl, b, L, h, d)).astype(np.float32)
    ks = np.abs(k).max(-1, keepdims=True) / 127.0 + 1e-8
    vs = np.abs(v).max(-1, keepdims=True) / 127.0 + 1e-8
    kq = jnp.asarray(np.clip(np.round(k / ks), -127, 127).astype(np.int8))
    vq = jnp.asarray(np.clip(np.round(v / vs), -127, 127).astype(np.int8))
    ks, vs = jnp.asarray(ks), jnp.asarray(vs)
    lens = jnp.asarray([50], jnp.int32)
    for li in range(nl):
        want = decode_attention_mxu(
            q, kq[li], vq[li], lens, k_scale=ks[li], v_scale=vs[li],
            block_l=32, interpret=True,
        )
        # stacked variant takes the KVCache 4D scale layout (no unit dim)
        got = decode_attention_mxu_stacked(
            q, kq, vq, jnp.int32(li), lens, k_scale=ks[..., 0],
            v_scale=vs[..., 0], block_l=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

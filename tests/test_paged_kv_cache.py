"""Paged KV cache (shared block pool + per-row block tables):
write/dense-view round trip, forward/decode parity vs the dense slot
cache (fp32 and int8), and the scalar-prefetch paged MXU decode kernel
in interpret mode.

No reference equivalent: the reference serves one request at a time
through FastChat (quantitative_evaluation/README.md); paging exists to
back continuous batching without provisioning batch x max_len HBM per
slot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.models import llama
from video_llava_tpu.models.llama import (
    KVCache,
    PagedKVCache,
    _paged_layer_dense,
    _write_paged_cache,
)


def test_paged_write_dense_roundtrip():
    """Block-aligned chunk writes + unaligned token writes land in the
    table-mapped pool blocks; the dense view reads them back in logical
    order; other layers stay untouched."""
    rng = np.random.default_rng(0)
    nl, nb, bs, h, d = 2, 10, 4, 2, 8
    b = 2
    pool = jnp.zeros((nl, nb, bs, h, d), jnp.float32)
    table = jnp.asarray([[7, 2, 9, 1], [3, 8, 5, 6]], jnp.int32)

    # chunked-prefill regime: s == 2 blocks, block-aligned pos 0
    x1 = jnp.asarray(rng.normal(size=(b, 8, h, d)).astype(np.float32))
    pool = _write_paged_cache(
        pool, x1, jnp.zeros((b,), jnp.int32), jnp.int32(1), table
    )
    # decode/speculative regime: s == 3 tokens crossing a block boundary
    x2 = jnp.asarray(rng.normal(size=(b, 3, h, d)).astype(np.float32))
    pool = _write_paged_cache(
        pool, x2, jnp.full((b,), 8, jnp.int32), jnp.int32(1), table
    )

    dense = _paged_layer_dense(pool, jnp.int32(1), table)  # (b, 16, ...)
    np.testing.assert_array_equal(np.asarray(dense[:, :8]), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(dense[:, 8:11]), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(dense[:, 11:]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(_paged_layer_dense(pool, jnp.int32(0), table)), 0.0
    )


def _forward_parity(cache_dtype):
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 12)))
    lens = jnp.full((2,), 12, jnp.int32)

    slot = KVCache.create(cfg, 2, 32, cache_dtype)
    l_s, slot = llama.forward(
        params, cfg, input_ids=ids, cache=slot, new_length=lens
    )
    # scrambled, disjoint block lists; block 0 reserved as the pad id
    paged = PagedKVCache.create(
        cfg, 2, num_blocks=17, block_size=4, max_blocks_per_row=8,
        dtype=cache_dtype,
    )
    table = jnp.asarray(
        [[3, 7, 1, 12, 5, 9, 2, 14], [4, 8, 6, 13, 10, 11, 15, 16]],
        jnp.int32,
    )
    paged = paged._replace(table=table)
    assert paged.block_size == 4
    l_p, paged = llama.forward(
        params, cfg, input_ids=ids, cache=paged, new_length=lens
    )
    np.testing.assert_allclose(
        np.asarray(l_p), np.asarray(l_s), atol=1e-4, rtol=1e-4
    )

    # 6 decode steps cross block boundaries at positions 12->16
    t = jnp.argmax(l_s[:, -1], -1).astype(jnp.int32)
    for _ in range(6):
        s_s, slot = llama.decode_step(params, cfg, t, slot)
        s_p, paged = llama.decode_step(params, cfg, t, paged)
        np.testing.assert_allclose(
            np.asarray(s_p), np.asarray(s_s), atol=1e-4, rtol=1e-4
        )
        t = jnp.argmax(s_s, -1).astype(jnp.int32)
    assert int(paged.length[0]) == 18
    assert type(paged) is PagedKVCache  # _replace kept the cache type


def test_paged_forward_matches_slot_fp32():
    _forward_parity(jnp.float32)


def test_paged_forward_matches_slot_int8():
    """Same per-token quantization order in both layouts -> the int8
    payloads are bit-identical and logits match to float tolerance."""
    _forward_parity(jnp.int8)


# -- scalar-prefetch paged MXU decode kernel ----------------------------------


def _pool_data(rng, nl, nb, bs, h, d, b, maxb):
    pk = rng.normal(size=(nl, nb, bs, h, d)).astype(np.float32)
    pv = rng.normal(size=(nl, nb, bs, h, d)).astype(np.float32)
    table = np.array([[5, 2, 9, 1], [7, 3, 11, 6]], np.int32)[:b, :maxb]
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    return pk, pv, table, q


def test_mxu_paged_matches_dense_gather():
    from video_llava_tpu.ops.attention import (
        decode_attention_mxu,
        decode_attention_mxu_paged,
    )

    rng = np.random.default_rng(8)
    nl, nb, bs, h, d, b, maxb = 2, 12, 16, 4, 32, 2, 4
    pk, pv, table, q = _pool_data(rng, nl, nb, bs, h, d, b, maxb)
    lens = jnp.asarray([37, 64], jnp.int32)  # partial + full rows
    for li in range(nl):
        dk = jnp.asarray(pk[li][table].reshape(b, maxb * bs, h, d))
        dv = jnp.asarray(pv[li][table].reshape(b, maxb * bs, h, d))
        want = decode_attention_mxu(q, dk, dv, lens, block_l=bs,
                                    interpret=True)
        got = decode_attention_mxu_paged(
            q, jnp.asarray(pk), jnp.asarray(pv), jnp.int32(li),
            jnp.asarray(table), lens, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


def test_mxu_paged_int8_matches_dense_gather():
    from video_llava_tpu.ops.attention import (
        decode_attention_mxu,
        decode_attention_mxu_paged,
    )

    rng = np.random.default_rng(9)
    nl, nb, bs, h, d, b, maxb = 2, 12, 16, 4, 32, 2, 4
    pk, pv, table, q = _pool_data(rng, nl, nb, bs, h, d, b, maxb)
    ks = np.abs(pk).max(-1) / 127.0 + 1e-8  # (nl, nb, bs, h)
    vs = np.abs(pv).max(-1) / 127.0 + 1e-8
    kq = np.clip(np.round(pk / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(pv / vs[..., None]), -127, 127).astype(np.int8)
    lens = jnp.asarray([23, 61], jnp.int32)
    for li in range(nl):
        dense = lambda a: jnp.asarray(
            a[li][table].reshape((b, maxb * bs) + a.shape[3:])
        )
        want = decode_attention_mxu(
            q, dense(kq), dense(vq), lens,
            k_scale=dense(ks)[..., None], v_scale=dense(vs)[..., None],
            block_l=bs, interpret=True,
        )
        got = decode_attention_mxu_paged(
            q, jnp.asarray(kq), jnp.asarray(vq), jnp.int32(li),
            jnp.asarray(table), lens,
            k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

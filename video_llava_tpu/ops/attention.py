"""Attention: XLA reference path + Pallas flash-attention TPU kernels.

Replaces the reference's CUDA flash-attn monkey patch
(video_chatgpt/train/llama_flash_attn_monkey_patch.py) and the stock HF
attention used by CLIP/LLaMA, as TPU-native kernels:

  * `attention_reference` — pure-jnp fused-by-XLA baseline (fp32 softmax).
  * `flash_attention`     — Pallas online-softmax forward with a
    recompute backward (custom_vjp), blocked over (batch*head, q-block)
    with K/V streamed through VMEM.
  * `decode_attention`    — single-step attention over a static-shape KV
    cache with a traced valid-length (no host sync during decode).

All public entry points take (batch, seq, heads, head_dim) ["BSHD"]
arrays; GQA (num_kv_heads < num_heads) is supported everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30

# Global attention implementation switch: "auto" = Pallas on a single
# TPU chip, shard_map-wrapped Pallas on a registered multi-chip mesh,
# XLA elsewhere; "xla"/"pallas" force a path.
_DEFAULT_IMPL = "auto"

# Mesh registered by the engine for sharded programs: attention is
# embarrassingly parallel over (batch, heads), so the Pallas kernel runs
# per-shard under shard_map with no collectives.
_GLOBAL_MESH = None


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "pallas")
    _DEFAULT_IMPL = impl


# Default ON after on-chip validation (scripts/validate_tpu_kernels.py
# + bench_serving.py, v5e): Mosaic compiles, cos 0.999999 vs the XLA
# dense-gather twin, and the continuous_paged serving mode runs 215.5
# vs 195.5 tok/s (the kernel streams pool blocks in place; the XLA
# path materializes a per-row dense cache every step). Escape hatch:
# enable_paged_kernel(False).
_PAGED_KERNEL = True


def enable_paged_kernel(on: bool = True) -> None:
    global _PAGED_KERNEL
    _PAGED_KERNEL = on


def set_attention_mesh(mesh) -> None:
    """Register the ('data','model') mesh so auto dispatch can use the
    shard_map-wrapped Pallas kernel inside pjit programs."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def sharded_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention under shard_map: batch shards on 'data', heads on
    'model'; each shard runs the single-device kernel locally."""
    from jax.sharding import PartitionSpec as P

    spec = P("data", None, "model", None)
    fn = jax.shard_map(
        lambda q_, k_, v_: flash_attention(
            q_, k_, v_, causal, scale, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def _sharded_dispatch_ok(q, k, mesh) -> bool:
    if mesh is None:
        return False
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    data, model = axes.get("data", 1), axes.get("model", 1)
    return (
        q.shape[0] % data == 0
        and q.shape[2] % model == 0
        and k.shape[2] % model == 0
    )


def _repeat_kv(k: jax.Array, num_heads: int) -> jax.Array:
    """(b, s, h_kv, d) -> (b, s, h, d) by repeating each kv head."""
    h_kv = k.shape[2]
    if h_kv == num_heads:
        return k
    return jnp.repeat(k, num_heads // h_kv, axis=2)


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_valid_len: Optional[jax.Array] = None,
    q_offset: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """XLA attention, fp32 softmax. q: (b, sq, h, d); k/v: (b, skv, h_kv, d).

    kv_valid_len: optional (b,) int32 — keys at positions >= len are
    masked out (right-padded KV).
    q_offset: optional (b,) int32 absolute position of each row's first
    query within the key sequence (used by chunked prefill into a KV
    cache). Default: right-aligned (skv - sq).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    out_dtype = q.dtype
    scale = scale if scale is not None else 1.0 / (d**0.5)
    k = _repeat_kv(k, h)
    v = _repeat_kv(v, h)
    if jax.default_backend() != "tpu" and q.dtype == jnp.bfloat16:
        # CPU's DotThunk can't execute bf16 x bf16 -> f32 batched dots;
        # upcast there (TPU keeps bf16 operands into the MXU).
        q, k, v = (a.astype(jnp.float32) for a in (q, k, v))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        # Query i of row b sits at absolute key position offset_b + i
        # and may attend to keys [0, offset_b + i].
        if q_offset is None:
            q_offset = jnp.full((b,), skv - sq, jnp.int32)
        qpos = jnp.arange(sq)[None, :, None] + q_offset[:, None, None]  # (b,sq,1)
        kpos = jnp.arange(skv)[None, None, :]
        logits = jnp.where(
            (qpos >= kpos)[:, None], logits, DEFAULT_MASK_VALUE
        )
    if kv_valid_len is not None:
        kmask = jnp.arange(skv)[None, :] < kv_valid_len[:, None]  # (b, skv)
        logits = jnp.where(kmask[:, None, None, :], logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, causal: bool, scale: float,
    block_k: int, kv_len: int, kv_len_real: int, q_offset: int,
):
    """One (batch*head-group, q-block) program: online softmax over k
    blocks, unrolled over the G heads of the group (grouping amortizes
    per-program overhead when there are many small-sequence heads, e.g.
    CLIP's 1600 (frame, head) pairs).

    q_ref: (G, block_q, d); k_ref/v_ref: (G, kv_len_pad, d).
    kv_len_real < the padded length masks the padded key tail.
    """
    G, block_q, d = q_ref.shape
    qi = pl.program_id(1)

    def per_head(g, _):
        _flash_fwd_one(
            q_ref, k_ref, v_ref, o_ref, lse_ref, g, qi,
            causal=causal, scale=scale, block_k=block_k, kv_len=kv_len,
            kv_len_real=kv_len_real, q_offset=q_offset,
        )
        return 0

    # fori_loop (not a Python loop) so the compiler keeps ONE head's
    # fp32 temporaries alive at a time.
    jax.lax.fori_loop(0, G, per_head, 0)


def _flash_fwd_one(
    q_ref, k_ref, v_ref, o_ref, lse_ref, g, qi, *, causal: bool,
    scale: float, block_k: int, kv_len: int, kv_len_real: int, q_offset: int,
):
    _, block_q, d = q_ref.shape

    q = q_ref[g].astype(jnp.float32) * scale

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    num_kb = pl.cdiv(kv_len, block_k)
    if causal:
        # Highest absolute q position in this block, +1.
        q_end = q_offset + (qi + 1) * block_q
        num_kb = jnp.minimum(num_kb, pl.cdiv(q_end, block_k))

    mask_tail = kv_len_real < num_kb * block_k if not causal else False

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[g, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[g, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        if causal or mask_tail:
            qpos = (
                q_offset
                + qi * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            )
            kpos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            valid = kpos < kv_len_real
            if causal:
                valid = valid & (qpos >= kpos)
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[g] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # logsumexp per row (saved for the backward pass); padded rows get a
    # huge sentinel so exp(s - lse) underflows to 0 there.
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[g] = jnp.where(jnp.isfinite(lse), lse, 1e30)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    scale: Optional[float],
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    b, sq, h, d = q.shape
    skv, h_kv = k.shape[1], k.shape[2]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    group = h // h_kv

    # Tighten blocks to the sequence (16-sublane multiples): short
    # sequences (e.g. CLIP's 257 tokens) run as a single block instead
    # of padding to the default 256-block grid — 2.5x faster there.
    def _fit(block, s):
        tight = pl.cdiv(s, 16) * 16
        if tight <= 512:  # single block fits comfortably in VMEM
            return tight
        return max(16, min(block, tight))

    block_q = _fit(block_q, sq)
    block_k = _fit(block_k, skv)
    sq_pad = pl.cdiv(sq, block_q) * block_q
    skv_pad = pl.cdiv(skv, block_k) * block_k

    # BSHD -> (b*h, s, d); padded q rows are sliced off afterwards and,
    # under the causal mask, padded k columns are never attended.
    qf = jnp.pad(
        q.transpose(0, 2, 1, 3).reshape(b * h, sq, d),
        ((0, 0), (0, sq_pad - sq), (0, 0)),
    )
    kf = jnp.pad(
        k.transpose(0, 2, 1, 3).reshape(b * h_kv, skv, d),
        ((0, 0), (0, skv_pad - skv), (0, 0)),
    )
    vf = jnp.pad(
        v.transpose(0, 2, 1, 3).reshape(b * h_kv, skv, d),
        ((0, 0), (0, skv_pad - skv), (0, 0)),
    )

    # Head grouping: many small-sequence heads (e.g. CLIP: 100 frames x
    # 16 heads x 257 tokens) are per-program-overhead bound; pack G heads
    # per program (G=1 under GQA, where kv rows don't tile with q rows).
    G = 1
    if group == 1 and sq <= 512:
        per_head_bytes = (2 * skv_pad + 2 * block_q) * d * 2
        G = max(1, min(h, (4 << 20) // max(per_head_bytes, 1)))
        while h % G:
            G -= 1

    grid = (b * h // G, sq_pad // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        scale=scale,
        block_k=block_k,
        kv_len=skv if causal else skv_pad,
        kv_len_real=skv,
        q_offset=skv - sq,  # right-aligned causal convention
    )

    def kv_index(bh, qi, _g=group, _h=h):
        return ((bh // _h) * (_h // _g) + (bh % _h) // _g, 0, 0)

    kv_index_g = kv_index if G == 1 else (lambda i, qi: (i, 0, 0))

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (G, block_q, d), lambda i, qi: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((G, skv_pad, d), kv_index_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, skv_pad, d), kv_index_g, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (G, block_q, d), lambda i, qi: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, block_q, 1), lambda i, qi: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 4,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, sq_pad, d)[:, :, :sq].transpose(0, 2, 1, 3)
    return out, lse


def flash_attention_bhsd(
    q: jax.Array,  # (b, h, s_pad, d) — heads leading, s_pad % 16 == 0
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: Optional[int] = None,  # true kv length (masks the pad tail)
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal flash attention over PRE-TRANSPOSED, PRE-PADDED
    operands -> (b, h, s_pad, d).

    The BSHD entry (flash_attention) transposes q/k/v to head-major and
    pads the sequence per call; inside an encoder layer scan those
    materialize as three operand copies + pads per layer — profiled at
    ~48 ms of the 181 ms CLIP 100-frame encode. Encoders that keep the
    sequence padded across the whole stack (models/clip.py pads once
    after the embeddings and produces q/k/v head-major straight out of
    the projection einsum) skip all of it. On non-TPU backends this
    falls back to the masked XLA reference (correctness path for the
    CPU test suite)."""
    b, h, s, d = q.shape
    kv_len = s if kv_len is None else kv_len
    scale = scale if scale is not None else 1.0 / (d**0.5)
    # multi-chip: the masked XLA path partitions cleanly under GSPMD;
    # an opaque pallas_call would force the sharded operands to gather
    if (
        jax.default_backend() != "tpu" or jax.device_count() > 1
    ) and not interpret:
        lens = jnp.full((b,), kv_len, jnp.int32)
        out = attention_reference(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_valid_len=lens, scale=scale,
        )
        return out.transpose(0, 2, 1, 3)
    assert s % 16 == 0, s

    def _fit(block, n):
        tight = pl.cdiv(n, 16) * 16
        if tight <= 512:
            return tight
        # must DIVIDE n: the q grid floors (n // block) and the kv loop
        # slices whole blocks — a remainder would silently drop the
        # last query rows / read past the kv block (caught by
        # adversarial review at s=592, the 336px CLIP pad). Callers
        # get big blocks back by padding s to a multiple of 128
        # (models/clip.py does).
        top = min(block, n)
        for cand in range(top - top % 16, 15, -16):
            if n % cand == 0:
                return cand
        return 16

    block_q = _fit(block_q, s)
    block_k = _fit(block_k, s)
    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    per_head_bytes = (2 * s + 2 * block_q) * d * 2
    G = max(1, min(h, (4 << 20) // max(per_head_bytes, 1)))
    while h % G:
        G -= 1
    grid = (b * h // G, s // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=False,
        scale=scale,
        block_k=block_k,
        kv_len=s,
        kv_len_real=kv_len,
        q_offset=0,
    )
    out, _ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, block_q, d), lambda i, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, s, d), lambda i, qi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, s, d), lambda i, qi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, block_q, d), lambda i, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_q, 1), lambda i, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 4,
            transcendentals=b * h * s * s,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dD_ref, dq_ref, *,
    causal: bool, scale: float, block_k: int, kv_len: int, kv_len_real: int,
    q_offset: int,
):
    """dq for one (batch*head, q-block): loop over k blocks, recompute
    p = exp(s - lse), ds = p*(dO.v^T - D), dq += ds.k * scale."""
    _, block_q, d = q_ref.shape
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (block_q, 1)
    dD = dD_ref[0]

    num_kb = pl.cdiv(kv_len, block_k)
    if causal:
        q_end = q_offset + (qi + 1) * block_q
        num_kb = jnp.minimum(num_kb, pl.cdiv(q_end, block_k))

    def body(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        qpos = (
            q_offset + qi * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        kpos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = kpos < kv_len_real
        if causal:
            valid = valid & (qpos >= kpos)
        p = jnp.where(valid, p, 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dD)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dD_ref, dk_ref, dv_ref, *,
    causal: bool, scale: float, block_q: int, q_len: int, kv_len_real: int,
    q_offset: int,
):
    """dk/dv for one (batch*head, k-block): loop over q blocks."""
    _, block_k, d = k_ref.shape
    ki = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    num_qb = pl.cdiv(q_len, block_q)
    start_qb = jnp.int32(0)
    if causal:
        # first q row that can see this k block:
        # qpos >= kpos  =>  q_offset + qi_row >= ki*block_k
        first_row = jnp.maximum(ki * block_k - q_offset, 0)
        start_qb = first_row // block_q

    def loop_body(qi, carry):
        dk, dv = carry
        qb = _load_q(qi)
        dob = _load_do(qi)
        lse = _load_lse(qi)  # (block_q, 1)
        dD = _load_dD(qi)
        s = jnp.dot(qb, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)  # (block_q, block_k)
        qpos = (
            q_offset + qi * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        kpos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = kpos < kv_len_real
        if causal:
            valid = valid & (qpos >= kpos)
        p = jnp.where(valid, p, 0.0)
        dv = dv + jnp.dot(p.T, dob, preferred_element_type=jnp.float32)
        dp = jnp.dot(dob, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dD)
        dk = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32) * scale
        return dk, dv

    def _load_q(qi):
        return q_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)

    def _load_do(qi):
        return do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)

    def _load_lse(qi):
        return lse_ref[0, pl.ds(qi * block_q, block_q), :]

    def _load_dD(qi):
        return dD_ref[0, pl.ds(qi * block_q, block_q), :]

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_qb, num_qb, loop_body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, out, lse, g, causal, scale, block_q, block_k, interpret
):
    b, sq, h, d = q.shape
    skv, h_kv = k.shape[1], k.shape[2]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    group = h // h_kv

    def _fit(block, s):
        tight = pl.cdiv(s, 16) * 16
        if tight <= 512:
            return tight
        return max(16, min(block, tight))

    block_q = _fit(block_q, sq)
    block_k = _fit(block_k, skv)
    sq_pad = pl.cdiv(sq, block_q) * block_q
    skv_pad = pl.cdiv(skv, block_k) * block_k

    def flat_q(x, hh):
        xx = x.transpose(0, 2, 1, 3).reshape(b * hh, x.shape[1], d)
        return jnp.pad(xx, ((0, 0), (0, sq_pad - x.shape[1]), (0, 0)))

    qf = flat_q(q, h)
    gf = flat_q(g, h)
    kf = jnp.pad(
        k.transpose(0, 2, 1, 3).reshape(b * h_kv, skv, d),
        ((0, 0), (0, skv_pad - skv), (0, 0)),
    )
    vf = jnp.pad(
        v.transpose(0, 2, 1, 3).reshape(b * h_kv, skv, d),
        ((0, 0), (0, skv_pad - skv), (0, 0)),
    )
    # D = rowsum(dO * O) (fp32), padded rows -> 0
    of = flat_q(out, h)
    dD = jnp.sum(
        gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True
    )  # (b*h, sq_pad, 1)

    q_offset = skv - sq
    common = dict(causal=causal, scale=scale, kv_len_real=skv,
                  q_offset=q_offset)

    def kv_index(bh, i, _g=group, _h=h):
        return ((bh // _h) * (_h // _g) + (bh % _h) // _g, 0, 0)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, block_k=block_k,
            kv_len=skv if causal else skv_pad, **common,
        ),
        grid=(b * h, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), jnp.float32),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, dD)

    dkv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=block_q, q_len=sq_pad, **common,
        ),
        grid=(b * h, skv_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, sq_pad, d), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, ki, _g=group, _h=h: (
                             (bh // _h) * (_h // _g) + (bh % _h) // _g, ki, 0
                         ),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, ki, _g=group, _h=h: (
                             (bh // _h) * (_h // _g) + (bh % _h) // _g, ki, 0
                         ),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skv_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, skv_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf, lse, dD)
    dk_per_head, dv_per_head = dkv

    dq = dq.reshape(b, h, sq_pad, d)[:, :, :sq].transpose(0, 2, 1, 3)
    # GQA: sum gradients over the query heads sharing each kv head.
    dk = dk_per_head.reshape(b, h_kv, group, skv_pad, d).sum(axis=2)
    dv = dv_per_head.reshape(b, h_kv, group, skv_pad, d).sum(axis=2)
    dk = dk[:, :, :skv].transpose(0, 2, 1, 3)
    dv = dv[:, :, :skv].transpose(0, 2, 1, 3)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention. q: (b, sq, h, d); k/v: (b, skv, h_kv, d).

    Forward and backward are both Pallas kernels (the backward
    recomputes p from the saved logsumexp — O(s) memory, no stored
    probability matrix), replacing the reference's flash-attn CUDA
    fwd+bwd (train/llama_flash_attn_monkey_patch.py).
    """
    out, _ = _flash_forward(q, k, v, causal, scale, block_q, block_k,
                            interpret)
    return out


def _flash_fwd_rule(q, k, v, causal, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, causal, scale, block_q, block_k,
                              interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    return _flash_backward(
        q, k, v, out, lse, g, causal, scale, block_q, block_k, interpret
    )


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_valid_len: Optional[jax.Array] = None,
    q_offset: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU, XLA reference elsewhere or
    when a KV validity mask / per-row offset is needed (prefill over
    padded batches uses causal + right padding, which needs no mask)."""
    d = q.shape[-1]
    plain = kv_valid_len is None and q_offset is None and d % 8 == 0
    if use_pallas is None:
        if _DEFAULT_IMPL == "pallas":
            use_pallas = True
        elif _DEFAULT_IMPL == "xla":
            use_pallas = False
        else:
            # auto: Pallas on a single TPU chip; shard_map-wrapped
            # Pallas on a registered multi-chip mesh; XLA otherwise.
            if (
                jax.default_backend() == "tpu"
                and jax.device_count() > 1
                and plain
                and _sharded_dispatch_ok(q, k, _GLOBAL_MESH)
            ):
                return sharded_flash_attention(
                    q, k, v, _GLOBAL_MESH, causal, scale, interpret
                )
            use_pallas = (
                jax.default_backend() == "tpu" and jax.device_count() == 1
            )
    if use_pallas and plain:
        return flash_attention(q, k, v, causal, scale, interpret=interpret)
    return attention_reference(
        q, k, v, causal=causal, kv_valid_len=kv_valid_len, q_offset=q_offset,
        scale=scale,
    )


# ---------------------------------------------------------------------------
# Decode attention over a KV cache
# ---------------------------------------------------------------------------


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single decode step. q: (b, 1, h, d); caches: (b, L, h_kv, d)
    (bf16, or int8 with per-position scales); cache_len: (b,) int32
    valid entries (incl. the token just written).

    Dispatch: on a TPU backend the MHA MXU kernel
    (decode_attention_mxu) is the default — profiling the int4 decode
    loop showed XLA's dequant+slice+einsum path costing ~150 us/layer
    (~40 GB/s effective on the cache stream), ~45% of the whole 7B
    step. GQA caches use the VPU kernel only when forced
    (set_default_impl('pallas')); elsewhere the XLA reference path
    fuses the int8 dequant into the attention einsums."""
    L = k_cache.shape[1]
    h, h_kv = q.shape[2], k_cache.shape[2]
    if _DEFAULT_IMPL != "xla":
        # single chip only: inside pjit over a multi-chip mesh the
        # opaque pallas_call would make GSPMD all-gather the sharded
        # cache every step; the XLA path partitions cleanly instead
        on_tpu = (
            jax.default_backend() == "tpu" and jax.device_count() == 1
        )
        if (
            (on_tpu or _DEFAULT_IMPL == "pallas")
            and h == h_kv
            and (h * q.shape[3]) % 128 == 0
            and L % 16 == 0
        ):
            return decode_attention_mxu(
                q, k_cache, v_cache, cache_len, k_scale=k_scale,
                v_scale=v_scale, scale=scale,
            )
        if _DEFAULT_IMPL == "pallas":
            block_l = next(
                (bl for bl in (256, 128, 64, 32, 16) if L % bl == 0), None
            )
            if block_l is not None:
                return decode_attention_pallas(
                    q, k_cache, v_cache, cache_len, k_scale=k_scale,
                    v_scale=v_scale, scale=scale, block_l=block_l,
                )
    k, v = k_cache, v_cache
    if k_scale is not None:
        k = (k.astype(jnp.float32) * k_scale).astype(q.dtype)
        v = (v.astype(jnp.float32) * v_scale).astype(q.dtype)
    return attention_reference(
        q, k, v, causal=False, kv_valid_len=cache_len, scale=scale
    )


# ---------------------------------------------------------------------------
# Pallas decode attention over a (possibly int8) KV cache
# ---------------------------------------------------------------------------


def _decode_attn_kernel(
    length_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
    scale: float, block_l: int, quantized: bool,
):
    """One (batch, kv-head-block) program: the HB kv heads of the block
    (each with `group` query heads) attend over the cache in one VMEM
    pass — dequantization, length masking and online softmax fused (the
    dequantized cache never hits HBM). All head math is vectorized
    elementwise + reductions (VPU): decode attention is bandwidth-bound,
    not MXU-bound.

    q_ref: (1, HB, group, d); k_ref/v_ref: (1, L, HB, d) [+ (1, L, HB,
    1) scales when quantized]; o_ref: (1, HB, group, d).
    """
    _, HB, group, d = q_ref.shape
    L = k_ref.shape[1]
    bi = pl.program_id(0)
    length = length_ref[bi]
    num_lb = pl.cdiv(L, block_l)
    nb = jnp.minimum(num_lb, pl.cdiv(jnp.maximum(length, 1), block_l))

    q = q_ref[0].astype(jnp.float32) * scale  # (HB, group, d)

    if group == 1:
        # Specialized MHA path (group == 1): flat (bl, HB) score tensors
        # — Mosaic-friendly shapes, no singleton middle dims.
        q2 = q[:, 0, :]  # (HB, d)
        m0 = jnp.full((1, HB), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((1, HB), jnp.float32)
        acc0 = jnp.zeros((HB, d), jnp.float32)

        def body(li, carry):
            m, l, acc = carry
            kb = k_ref[0, pl.ds(li * block_l, block_l), :, :].astype(
                jnp.float32
            )
            vb = v_ref[0, pl.ds(li * block_l, block_l), :, :].astype(
                jnp.float32
            )
            if quantized:
                kb = kb * ks_ref[0, pl.ds(li * block_l, block_l), :, :]
                vb = vb * vs_ref[0, pl.ds(li * block_l, block_l), :, :]
            s = jnp.sum(kb * q2[None], axis=-1)  # (bl, HB)
            pos = li * block_l + jax.lax.broadcasted_iota(
                jnp.int32, (block_l, HB), 0
            )
            s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp(s - m_new)  # (bl, HB)
            alpha = jnp.exp(m - m_new)  # (1, HB)
            l_new = alpha * l + jnp.sum(p, axis=0, keepdims=True)
            # acc[h, d] += sum_l p[l, h] * vb[l, h, d]
            acc_new = alpha.T * acc + jnp.sum(
                p[:, :, None] * vb, axis=0
            )
            return m_new, l_new, acc_new

        m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l.T, 1e-30))[:, None, :].astype(
            o_ref.dtype
        )
        return

    m0 = jnp.full((HB, group), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((HB, group), jnp.float32)
    acc0 = jnp.zeros((HB, group, d), jnp.float32)

    def body(li, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(li * block_l, block_l), :, :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(li * block_l, block_l), :, :].astype(jnp.float32)
        if quantized:
            kb = kb * ks_ref[0, pl.ds(li * block_l, block_l), :, :]
            vb = vb * vs_ref[0, pl.ds(li * block_l, block_l), :, :]
        # s[l, h, g] = sum_d kb[l, h, d] * q[h, g, d]
        s = jnp.sum(kb[:, :, None, :] * q[None], axis=-1)  # (bl, HB, group)
        pos = li * block_l + jax.lax.broadcasted_iota(
            jnp.int32, (block_l, HB, group), 0
        )
        s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=0))
        p = jnp.exp(s - m_new[None])  # (bl, HB, group)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=0)
        # acc[h, g, d] += sum_l p[l, h, g] * vb[l, h, d]
        acc_new = alpha[:, :, None] * acc + jnp.sum(
            p[:, :, :, None] * vb[:, :, None, :], axis=0
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l[:, :, None], 1e-30)).astype(o_ref.dtype)


def _decode_attn_mxu_kernel(
    len_ref, qd_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
    m_ref, l_ref, acc_ref, *,
    block_l: int, quantized: bool, h: int, d: int,
):
    """MHA decode attention as two block-diagonal MXU matmuls per cache
    block (flash-decoding over the L grid axis).

    The VPU formulation above reduces over the lane (head_dim) axis —
    cross-lane reductions run far below HBM rate, so the kernel was
    compute-bound and lost to XLA. Here both contractions ride the MXU:

      scores(bl, h)  = K_flat(bl, h*d) @ Qdiag^T(h*d, h)
      acc(h, h*d)   += P^T(h, bl) @ V_flat(bl, h*d)

    Qdiag is the block-diagonal spread of q (row i holds q_i * scale at
    columns [i*d, (i+1)*d)) — the same trick as quant4's W4A8 matvec:
    h-fold zero-padded MXU work is microseconds, and the int8 cache
    never leaves VMEM dequantized. Per-(position, head) cache scales
    fold into the score (k) and into P (v) AFTER the dots — they are
    constant over head_dim, so the int8 values feed the matmul raw.
    The final (h, h*d) accumulator holds each head's output in its own
    diagonal block; a masked row-sum extracts the flat (1, h*d) result.

    Grid: (b, L // block_l), 'arbitrary' over L with VMEM carry
    (m/l/acc scratch), output written at the last L step. MHA only
    (h_kv == h); GQA falls back to the VPU kernel.

    qd_ref: (1, h, h*d) bf16 (pre-scaled, block-diagonal);
    k_ref/v_ref: (1, bl, h*d) int8|any; ks/vs_ref: (1, bl, h) f32;
    o_ref: (1, 1, h*d); scratch: m/l (1, h) f32, acc (h, h*d) f32.

    The whole-cache variant used inside the layer scan is a separate
    kernel (_decode_attn_mxu_stacked_kernel) operating on native
    (bl, h, d) blocks.
    """
    bi = pl.program_id(0)
    li = pl.program_id(1)
    num_lb = pl.num_programs(1)
    length = len_ref[bi]

    @pl.when(li == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Blocks wholly past `length` contribute nothing: skip their math.
    @pl.when(li * block_l < length)
    def _step():
        kb = k_ref[0].astype(jnp.bfloat16)  # (bl, h*d)
        qd = qd_ref[0]  # (h, h*d) bf16
        s = jax.lax.dot_general(
            kb, qd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bl, h)
        if quantized:
            s = s * ks_ref[0]
        pos = li * block_l + jax.lax.broadcasted_iota(
            jnp.int32, (block_l, h), 0
        )
        s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)
        m_prev = m_ref[:]  # (1, h)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)  # (bl, h) f32
        alpha = jnp.exp(m_prev - m_new)  # (1, h)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=0, keepdims=True)
        m_ref[:] = m_new
        pv = p * vs_ref[0] if quantized else p  # (bl, h)
        vb = v_ref[0].astype(jnp.bfloat16)  # (bl, h*d)
        acc_ref[:] = alpha.T * acc_ref[:] + jax.lax.dot_general(
            pv.astype(jnp.bfloat16), vb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (h, h*d)

    @pl.when(li == num_lb - 1)
    def _finalize():
        o = acc_ref[:] / jnp.maximum(l_ref[:].T, 1e-30)  # (h, h*d)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, h * d), 0)
        col_head = jax.lax.broadcasted_iota(jnp.int32, (h, h * d), 1) // d
        o_ref[0] = jnp.sum(
            jnp.where(row == col_head, o, 0.0), axis=0, keepdims=True
        ).astype(o_ref.dtype)


def decode_attention_mxu(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (b, L, h, d) bf16 or int8 (MHA: h_kv == h)
    v_cache: jax.Array,
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (b, L, h, 1) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_l: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """MXU-matmul fused decode attention -> (b, 1, h, d). MHA only."""
    b, _, h, d = q.shape
    L, h_kv = k_cache.shape[1], k_cache.shape[2]
    assert h_kv == h, "MXU decode kernel is MHA-only"
    scale = scale if scale is not None else 1.0 / (d**0.5)
    quantized = k_scale is not None
    block_l = next(
        (bl for bl in (block_l, 256, 128, 64, 32, 16) if L % bl == 0), L
    )

    # block-diagonal queries, pre-scaled: (b, h, h*d) bf16
    eye = jnp.eye(h, dtype=q.dtype)
    qd = (
        (q[:, 0, :, None, :] * scale) * eye[None, :, :, None]
    ).reshape(b, h, h * d).astype(jnp.bfloat16)
    kf = k_cache.reshape(b, L, h * d)
    vf = v_cache.reshape(b, L, h * d)
    if quantized:
        ks = k_scale.reshape(b, L, h).astype(jnp.float32)
        vs = v_scale.reshape(b, L, h).astype(jnp.float32)
    else:  # dummy operands keep one kernel signature
        ks = jnp.ones((b, 1, h), jnp.float32)
        vs = ks

    sl = ks.shape[1]  # L when quantized, 1 (dummy) otherwise
    s_bl = block_l if quantized else 1

    # Blocks wholly past this row's length are compute-skipped in the
    # kernel; CLAMP their fetch index to the last needed block so the
    # pipeline sees consecutive identical indices and elides the DMA —
    # KV traffic then scales with the row's LENGTH, not the cache
    # capacity (a 512-token row in a 2048-cap cache reads 4x less).
    def lb_clamp(bi, li, len_ref):
        nb = (len_ref[bi] + (block_l - 1)) // block_l
        return jnp.minimum(li, jnp.maximum(nb - 1, 0))

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_mxu_kernel, block_l=block_l,
            quantized=quantized, h=h, d=d,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, L // block_l),
            in_specs=[
                pl.BlockSpec((1, h, h * d),
                             lambda bi, li, len_ref: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_l, h * d),
                             lambda bi, li, len_ref:
                             (bi, lb_clamp(bi, li, len_ref), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_bl, h),
                             lambda bi, li, len_ref:
                             (bi, lb_clamp(bi, li, len_ref)
                              if s_bl > 1 else 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_l, h * d),
                             lambda bi, li, len_ref:
                             (bi, lb_clamp(bi, li, len_ref), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_bl, h),
                             lambda bi, li, len_ref:
                             (bi, lb_clamp(bi, li, len_ref)
                              if s_bl > 1 else 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, h * d), lambda bi, li, len_ref: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((h, h * d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cache_len, qd, kf, ks, vf, vs)
    return out.reshape(b, 1, h, d)


def _decode_attn_mxu_stacked_kernel(
    len_ref, li_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
    m_ref, l_ref, acc_ref, *,
    block_l: int, quantized: bool, h: int, d: int,
):
    """Whole-cache MXU decode attention over NATIVE (bl, h, d) cache
    blocks (no flattening of the cache in HBM: merging (h, d) into one
    axis is a sublane->lane relayout, and doing it outside the kernel
    materialized the full 168 MB cache per layer — profiled at ~366 us
    per layer, 12 ms/step).

    Inside the kernel only LEADING dims merge ((bl, h, d) -> (bl*h, d),
    layout-preserving), and both contractions still ride the MXU by
    computing all head-pair products and masking the diagonal:

      sc(bl*h, h)  = K2(bl*h, d) @ Q^T(d, h)     # all (pos*head, head)
      s(bl, h)     = diag_j(sc.reshape(bl, h, h))  # j == head
      acc(h, d)   += P2t^T(h, bl*h) @ V2(bl*h, d)

    where P2t(bl*h, h) spreads p(bl, h) onto the head diagonal. The
    h-fold redundant MXU work is ~0.2 us/block; per-(position, head)
    int8 cache scales fold into s (k) and into p (v) after the dots.

    len_ref/li_ref: scalar prefetch ((b,) lengths, (1,) layer index);
    q_ref: (1, h, d) bf16 pre-scaled; k/v_ref: (1, 1, bl, h, d);
    ks/vs_ref: (1, 1, bl, h) f32 — 4D, h in lanes: a (bl, h, 1)
    trailing-unit block is a 1-lane DMA that stalls the pipeline;
    o_ref: (1, 1, h, d); scratch: m/l (1, h) f32, acc (h, d) f32.
    """
    del li_ref  # consumed by the index maps
    bi = pl.program_id(0)
    lb = pl.program_id(1)
    num_lb = pl.num_programs(1)
    length = len_ref[bi]

    @pl.when(lb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(lb * block_l < length)
    def _step():
        k2 = k_ref[0, 0].reshape(block_l * h, d).astype(jnp.bfloat16)
        sc = jax.lax.dot_general(
            k2, q_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(block_l, h, h)  # [l, i, j] = k_{l,i} . q_j
        eye = jax.lax.broadcasted_iota(
            jnp.int32, (block_l, h, h), 1
        ) == jax.lax.broadcasted_iota(jnp.int32, (block_l, h, h), 2)
        s = jnp.sum(jnp.where(eye, sc, 0.0), axis=2)  # (bl, h)
        if quantized:
            s = s * ks_ref[0, 0]
        pos = lb * block_l + jax.lax.broadcasted_iota(
            jnp.int32, (block_l, h), 0
        )
        s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)
        m_prev = m_ref[:]  # (1, h)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)  # (bl, h) f32
        alpha = jnp.exp(m_prev - m_new)  # (1, h)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=0, keepdims=True)
        m_ref[:] = m_new
        pv = p * vs_ref[0, 0] if quantized else p  # (bl, h)
        # spread pv onto the head diagonal: P2t[l*h+j, i] = pv[l,i]δij
        p2t = jnp.where(eye, pv[:, None, :], 0.0).reshape(
            block_l * h, h
        )
        v2 = v_ref[0, 0].reshape(block_l * h, d).astype(jnp.bfloat16)
        acc_ref[:] = alpha.T * acc_ref[:] + jax.lax.dot_general(
            p2t.astype(jnp.bfloat16), v2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (h, d)

    @pl.when(lb == num_lb - 1)
    def _finalize():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:].T, 1e-30)
        ).astype(o_ref.dtype)


def decode_attention_mxu_stacked(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (NL, b, L, h, d) bf16 or int8 (MHA)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (NL, b, L, h) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_l: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """MXU decode attention against ONE layer of the whole stacked KV
    cache: the layer block is selected by a scalar-prefetch index_map,
    so the scan passes the full (NL, ...) cache untouched — no
    per-layer slice, no cache-wide relayout. -> (b, 1, h, d). MHA
    only. block_l caps at 128: the all-head-pair temporaries are h x
    bigger than the flat kernel's, and 256 overflows the 16 MB scoped
    VMEM at h=32."""
    b, _, h, d = q.shape
    nl, _, L, h_kv = k_cache.shape[:4]
    assert h_kv == h, "MXU decode kernel is MHA-only"
    scale = scale if scale is not None else 1.0 / (d**0.5)
    quantized = k_scale is not None
    block_l = next(
        (bl for bl in (block_l, 128, 64, 32, 16) if L % bl == 0), L
    )

    qs = (q[:, 0] * scale).astype(jnp.bfloat16)  # (b, h, d)
    if quantized:
        ks = k_scale.astype(jnp.float32)
        vs = v_scale.astype(jnp.float32)
    else:  # dummy operands keep one kernel signature
        ks = jnp.ones((1, b, 1, h), jnp.float32)
        vs = ks

    s_bl = block_l if quantized else 1
    li = layer.reshape(1).astype(jnp.int32)

    def lb_clamp(bi, lb, len_ref):
        # see decode_attention_mxu: clamp fetches past the row's
        # length to the last needed block so the pipeline elides their
        # DMA — KV traffic scales with length, not capacity.
        nb = (len_ref[bi] + (block_l - 1)) // block_l
        return jnp.minimum(lb, jnp.maximum(nb - 1, 0))

    def kv_map(bi, lb, len_ref, li_ref):
        return (li_ref[0], bi, lb_clamp(bi, lb, len_ref), 0, 0)

    def s_map(bi, lb, len_ref, li_ref):
        if quantized:
            return (li_ref[0], bi, lb_clamp(bi, lb, len_ref), 0)
        return (0, bi, 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_mxu_stacked_kernel, block_l=block_l,
            quantized=quantized, h=h, d=d,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, L // block_l),
            in_specs=[
                pl.BlockSpec((1, h, d),
                             lambda bi, lb, len_ref, li_ref: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_l, h, d), kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_bl, h), s_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_l, h, d), kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_bl, h), s_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, h, d),
                lambda bi, lb, len_ref, li_ref: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cache_len, li, qs, k_cache, ks, v_cache, vs)
    return out


def decode_attention_stacked(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (NL, b, L, h_kv, d)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (NL, b, L, h_kv) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """decode_attention against layer `layer` of the scan-carried full
    KV cache. TPU MHA takes the zero-copy scalar-prefetch MXU kernel;
    everything else slices the layer and reuses decode_attention (the
    slice then fuses into XLA's einsums, so nothing is lost there).
    Scales arrive 4D (KVCache layout) and regain the trailing unit dim
    at the per-layer boundary."""
    h, h_kv = q.shape[2], k_cache.shape[3]
    L = k_cache.shape[2]
    if (
        _DEFAULT_IMPL != "xla"
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1  # see decode_attention dispatch
        and h == h_kv
        and (h * q.shape[3]) % 128 == 0
        and L % 16 == 0
    ):
        return decode_attention_mxu_stacked(
            q, k_cache, v_cache, layer, cache_len,
            k_scale=k_scale, v_scale=v_scale, scale=scale,
        )
    idx = lambda a: (
        None if a is None
        else jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    )
    idx_s = lambda a: None if a is None else idx(a)[..., None]
    return decode_attention(
        q, idx(k_cache), idx(v_cache), cache_len,
        k_scale=idx_s(k_scale), v_scale=idx_s(v_scale), scale=scale,
    )


def _decode_attn_mxu_paged_kernel(
    len_ref, li_ref, tbl_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
    m_ref, l_ref, acc_ref, *,
    block_l: int, quantized: bool, h: int, d: int,
):
    """Paged twin of _decode_attn_mxu_stacked_kernel: the block table is
    consumed entirely by the index maps (each grid step's KV block is
    pool block table[bi, lb]); the flash-decoding math over logical
    positions lb*BS + offset is unchanged."""
    del tbl_ref  # consumed by the index maps
    _decode_attn_mxu_stacked_kernel(
        len_ref, li_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
        m_ref, l_ref, acc_ref,
        block_l=block_l, quantized=quantized, h=h, d=d,
    )


def decode_attention_mxu_paged(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (NL, NB, BS, h, d) bf16 or int8 (MHA)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    table: jax.Array,  # (b, MAXB) int32 pool block ids
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (NL, NB, BS, h) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """MXU decode attention over the PAGED block pool: grid step
    (bi, lb) DMAs pool block table[bi, lb] of layer `layer` via a
    scalar-prefetch index_map — the shared-pool cache never gets
    gathered into a per-row dense copy in HBM. -> (b, 1, h, d).
    MHA only (matches decode_attention_mxu_stacked)."""
    b, _, h, d = q.shape
    nl, nb, bs, h_kv = k_cache.shape[:4]
    maxb = table.shape[1]
    assert h_kv == h, "MXU paged decode kernel is MHA-only"
    scale = scale if scale is not None else 1.0 / (d**0.5)
    quantized = k_scale is not None

    qs = (q[:, 0] * scale).astype(jnp.bfloat16)  # (b, h, d)
    if quantized:
        ks = k_scale.astype(jnp.float32)
        vs = v_scale.astype(jnp.float32)
    else:  # dummy operands keep one kernel signature
        ks = jnp.ones((1, 1, 1, h), jnp.float32)
        vs = ks

    s_bl = bs if quantized else 1
    li = layer.reshape(1).astype(jnp.int32)
    tbl = table.astype(jnp.int32)

    def kv_map(bi, lb, len_ref, li_ref, tbl_ref):
        return (li_ref[0], tbl_ref[bi, lb], 0, 0, 0)

    def s_map(bi, lb, len_ref, li_ref, tbl_ref):
        if quantized:
            return (li_ref[0], tbl_ref[bi, lb], 0, 0)
        return (0, 0, 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_mxu_paged_kernel, block_l=bs,
            quantized=quantized, h=h, d=d,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, maxb),
            in_specs=[
                pl.BlockSpec(
                    (1, h, d),
                    lambda bi, lb, len_ref, li_ref, tbl_ref: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, bs, h, d), kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_bl, h), s_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bs, h, d), kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_bl, h), s_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, h, d),
                lambda bi, lb, len_ref, li_ref, tbl_ref: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cache_len, li, tbl, qs, k_cache, ks, v_cache, vs)
    return out


def decode_attention_paged(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (NL, NB, BS, h_kv, d)
    v_cache: jax.Array,
    layer: jax.Array,  # () int32
    table: jax.Array,  # (b, MAXB) int32
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (NL, NB, BS, h_kv) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """decode_attention against layer `layer` of a PAGED KV block pool
    (models.llama.PagedKVCache layout). TPU MHA takes the scalar-
    prefetch paged MXU kernel (blocks stream straight from the pool);
    everything else gathers the rows' blocks into a logically-dense
    view and reuses decode_attention."""
    h, h_kv = q.shape[2], k_cache.shape[3]
    bs = k_cache.shape[2]
    if (
        _PAGED_KERNEL
        and _DEFAULT_IMPL != "xla"
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1  # see decode_attention dispatch
        and h == h_kv
        and (h * q.shape[3]) % 128 == 0
        and bs % 16 == 0
        # same VMEM bound as decode_attention_mxu_stacked: the
        # all-head-pair temporaries overflow 16 MB past block_l 128
        and bs <= 128
    ):
        return decode_attention_mxu_paged(
            q, k_cache, v_cache, layer, table, cache_len,
            k_scale=k_scale, v_scale=v_scale, scale=scale,
        )
    layer_of = lambda a: jax.lax.dynamic_index_in_dim(
        a, layer, 0, keepdims=False
    )
    dense = lambda a: layer_of(a)[table].reshape(
        (table.shape[0], -1) + a.shape[3:]
    )
    k_s = None if k_scale is None else dense(k_scale)[..., None]
    v_s = None if v_scale is None else dense(v_scale)[..., None]
    return decode_attention(
        q, dense(k_cache), dense(v_cache), cache_len,
        k_scale=k_s, v_scale=v_s, scale=scale,
    )


def decode_attention_pallas(
    q: jax.Array,  # (b, 1, h, d)
    k_cache: jax.Array,  # (b, L, h_kv, d) bf16 or int8
    v_cache: jax.Array,
    cache_len: jax.Array,  # (b,)
    k_scale: Optional[jax.Array] = None,  # (b, L, h_kv, 1) when int8
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_l: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused decode attention -> (b, 1, h, d)."""
    b, _, h, d = q.shape
    L, h_kv = k_cache.shape[1], k_cache.shape[2]
    group = h // h_kv
    scale = scale if scale is not None else 1.0 / (d**0.5)
    quantized = k_scale is not None
    block_l = max(16, min(block_l, pl.cdiv(L, 16) * 16))
    if L % block_l:
        raise ValueError(f"cache length {L} must divide block_l {block_l}")

    qg = q.reshape(b, h_kv, group, d)
    if not quantized:
        # dummy scale operands keep one kernel signature
        k_scale = jnp.ones((b, L, h_kv, 1), jnp.float32)
        v_scale = k_scale

    # kv-head block: the second-to-last block dim must be a multiple of
    # 8 or equal the full axis (Mosaic tiling rule).
    HB = 8 if h_kv % 8 == 0 else h_kv

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, scale=scale, block_l=block_l,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h_kv // HB),
            in_specs=[
                pl.BlockSpec((1, HB, group, d),
                             lambda bi, ki, len_ref: (bi, ki, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, HB, d),
                             lambda bi, ki, len_ref: (bi, 0, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, HB, 1),
                             lambda bi, ki, len_ref: (bi, 0, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, HB, d),
                             lambda bi, ki, len_ref: (bi, 0, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, HB, 1),
                             lambda bi, ki, len_ref: (bi, 0, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, HB, group, d), lambda bi, ki, len_ref: (bi, ki, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_kv, group, d), q.dtype),
        interpret=interpret,
    )(cache_len, qg, k_cache, k_scale, v_cache, v_scale)
    return out.reshape(b, 1, h, d)

"""Weights-only int4 quantization (nibble-packed) for the decode path.

Single-chip autoregressive decode is HBM-bandwidth bound; int8 weights
(ops/quant.py) already halve the streamed bytes vs bf16 — int4 halves
them again. The TPU backend has no native s4 dtype (XLA raises
UNIMPLEMENTED), so values are stored as two nibbles per int8 byte and
unpacked on the fly:

  * packing: for a kernel (D, F), byte [i, f] holds unpacked row i in
    its low nibble and row i + D/2 in its high nibble. Splitting by
    halves (not interleaving) means the consumer splits `x` instead of
    interleaving weight rows — unpack is two shifts, no shuffles;
  * scales: symmetric round-to-nearest over groups of `group_size`
    contraction rows per output channel (g=128 default, the standard
    int4 granularity), absmax/7, stored (G, F) bf16;
  * decode matmul: a Pallas kernel streams the packed bytes ONCE,
    sign-extends both nibbles (VPU), dequantizes in VMEM and issues two
    MXU dots (x_lo @ w_lo + x_hi @ w_hi). VPU unpack overlaps the HBM
    stream, so the step stays bandwidth-bound at int4 bytes;
  * prefill / speculative-verify (batch > 8) uses the W4A8 BLOCK
    kernel: per-ROW int8 activation scales, int8 MXU K-split dots,
    whole-batch-first batch blocks so the packed weights stream exactly
    once per call, and a scalar-prefetch STACKED twin so scan-stacked
    weights never pay a per-layer slice copy (the bf16-dequant block
    kernel remains via VLT_INT4_A8_BLOCK=0); pure-XLA twins of both
    serve as the CPU fallback and the escape hatch for shapes the
    Pallas grid doesn't admit (F not 128-aligned).

Replaces the fp16 weight streaming of the reference's decode hot loop
(video_chatgpt/inference.py:105-112); packing/unpacking has no
reference equivalent (CUDA fp16 end to end).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Packing / quantization
# ---------------------------------------------------------------------------


def pack_int4(q: jax.Array) -> jax.Array:
    """q: (..., D, F) int values in [-8, 7] -> (..., D/2, F) int8.

    Byte [..., i, f] = (q[..., i + D/2, f] << 4) | ((q[..., i, f] + 8) & 0xF)

    The LOW nibble is stored OFFSET-BINARY (lo + 8, in [0, 15]) while
    the high nibble stays two's-complement. With a = byte & 15 the byte
    VALUE then satisfies byte == 16 * hi + a exactly, which lets the
    W4A8 matvec recover both nibble contributions from dots on just
    {byte (the raw ref), a (ONE derived operand)}:

        x_lo . lo = dot(x_lo, a) - 8 * rowsum(x_lo)
        x_hi . hi = (dot(x_hi, byte) - dot(x_hi, a)) / 16

    Measured motivation (round-5 on-chip probe): a Mosaic dot streaming
    an INPUT REF is free under the block's DMA, but every dot on a
    DERIVED (computed) operand pays ~3 us/call of VMEM round-trip — the
    two's-complement format needed two derived operands (or an i32
    convert+shift unpack chain of the same cost), the offset format
    needs one. Unpack is also cheaper everywhere: (p & 15) - 8 beats
    the shl-28/shr-28 sign-extension pair.
    """
    d = q.shape[-2]
    assert d % 2 == 0, f"contraction dim must be even, got {d}"
    q = q.astype(jnp.int32)
    lo = q[..., : d // 2, :]
    hi = q[..., d // 2 :, :]
    return ((hi << 4) | ((lo + 8) & 0xF)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(..., D/2, F) int8 -> (..., D, F) int32 (signed nibble values)."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = jax.lax.shift_right_arithmetic(p, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_tensor_int4(w: jax.Array, group_size: Optional[int] = 128):
    """Symmetric RTN int4 over contraction-row groups.

    w: (..., D, F) -> (packed (..., D/2, F) int8, scales (..., G, F) f32)
    with G = D // group_size (G=1 for per-channel, group_size=None).
    Groups must not straddle the lo/hi packing split: group_size | D/2
    (or G == 1).
    """
    d = w.shape[-2]
    g = group_size or d
    assert d % g == 0, (d, g)
    n_groups = d // g
    assert n_groups == 1 or (d // 2) % g == 0, (
        f"group_size {g} straddles the lo/hi split of D={d}"
    )
    w32 = w.astype(jnp.float32)
    grouped = w32.reshape(w.shape[:-2] + (n_groups, g, w.shape[-1]))
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    # Scales are stored bf16. The decode Pallas kernel dequantizes
    # weights in VMEM (int4 value x bf16 scale is exact in f32); the
    # MXU-block prefill kernel instead applies group scales to per-group
    # dot OUTPUTS, so it matches the XLA twin only to bf16-rounding
    # tolerance, not bit-exactly.
    scales = (jnp.maximum(absmax, 1e-8) / 7.0).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(grouped / scales.astype(jnp.float32)), -7, 7
    ).astype(jnp.int32)
    q = q.reshape(w.shape)
    return pack_int4(q), scales[..., 0, :].reshape(
        w.shape[:-2] + (n_groups, w.shape[-1])
    )


def dequantize_int4(packed, scales, dtype=jnp.bfloat16):
    """Dense dequantization (reference path for tests / CPU)."""
    q = unpack_int4(packed).astype(jnp.float32)
    d = q.shape[-2]
    n_groups = scales.shape[-2]
    g = d // n_groups
    grouped = q.reshape(q.shape[:-2] + (n_groups, g, q.shape[-1]))
    return (grouped * scales[..., :, None, :]).reshape(q.shape).astype(dtype)


def is_quantized_int4(p: Any) -> bool:
    return isinstance(p, dict) and "qvalues_packed" in p


# ---------------------------------------------------------------------------
# Matmul: XLA twin (prefill / CPU)
# ---------------------------------------------------------------------------


def int4_matmul_xla(x: jax.Array, packed: jax.Array, scales: jax.Array):
    """x: (..., D) -> (..., F) f32. Two matmuls, one per nibble half —
    XLA fuses shift+convert+scale into each matmul read."""
    dh, f = packed.shape
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = jax.lax.shift_right_arithmetic(p, 4)
    n_groups = scales.shape[-2]
    s32 = scales.astype(jnp.float32)
    if n_groups == 1:
        s_lo = s_hi = jnp.broadcast_to(s32, (dh, f))
    else:
        g = 2 * dh // n_groups
        s_lo = jnp.repeat(s32[: n_groups // 2], g, axis=-2)
        s_hi = jnp.repeat(s32[n_groups // 2 :], g, axis=-2)
    w_lo = (lo.astype(jnp.float32) * s_lo).astype(jnp.bfloat16)
    w_hi = (hi.astype(jnp.float32) * s_hi).astype(jnp.bfloat16)
    x_lo = x[..., :dh].astype(jnp.bfloat16)
    x_hi = x[..., dh:].astype(jnp.bfloat16)
    y = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
    return y + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Matmul: Pallas kernel (decode — packed bytes stream once)
# ---------------------------------------------------------------------------


def _w4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, *, groups_half: int):
    """Group scales are applied to per-group dot OUTPUTS — (1, bf) row
    broadcasts over the (B, bf) partials — instead of expanding scales
    over weight rows (Mosaic rejects the (G, bf) -> (G, 1, bf) shape
    cast that row expansion needs). y = sum_g s[g] * (x_g @ q_g)."""
    p = w_ref[:].astype(jnp.int32)  # (Dh, bf)
    dh, bf = p.shape
    lo = ((p & 15) - 8).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.bfloat16)
    x = x_ref[:].astype(jnp.bfloat16)  # (B, 2*Dh)
    s = s_ref[:].astype(jnp.float32)  # (G, bf)
    if groups_half == 0:  # one group total: same scale row for both halves
        acc = jnp.dot(x[:, :dh], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, dh:], hi, preferred_element_type=jnp.float32)
        o_ref[:] = acc * s[0:1]
        return

    g = dh // groups_half
    b = x.shape[0]
    # Static unroll (groups_half is a compile-time constant): every
    # slice is static and aligned, which Mosaic handles unconditionally.
    acc = jnp.zeros((b, bf), jnp.float32)
    for gi in range(groups_half):
        r0 = gi * g
        acc += s[gi : gi + 1] * jnp.dot(
            x[:, r0 : r0 + g], lo[r0 : r0 + g],
            preferred_element_type=jnp.float32,
        )
        acc += s[groups_half + gi : groups_half + gi + 1] * jnp.dot(
            x[:, dh + r0 : dh + r0 + g], hi[r0 : r0 + g],
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc


def _w4a8_block_kernel(x_ref, w_ref, s_ref, o_ref, xq_ref, sx_ref, *,
                       groups_half: int):
    """W4A8 MXU BLOCK kernel (prefill / speculative-verify, b > 8).

    The bf16 block kernel above unpacks nibbles to bf16 and runs 2G
    bf16 dots; this variant quantizes activations to int8 with ONE
    per-row scale and runs the same K-split as int8 x int8 MXU dots
    (2x the bf16 MXU rate, and the unpack stays int8):

        y[b, f] = sx[b] * sum_g sw[g, f] * (xq[b, g-rows] . q[g-rows, f])

    Per-ROW activation scales (not per-group as in the decode matvec):
    the row-broadcast multiply is one VPU op applied once after the
    group loop, so the scale application adds O(B*F) work instead of
    O(G*B*F). Accuracy cost is one int8 rounding of a whole
    RMSNorm-normalized row — validated by the preflight harness
    alongside the decode path (engine/quant_select.py).

    Activation quantization runs once per batch block (at the first F
    grid step, stashed in VMEM scratch) rather than per F block: the
    F sweep reuses xq_ref/sx_ref, so quant costs O(B*D) per call, not
    O(B*D*F/bf).

    Replaces the fp16 prefill matmuls of the reference hot path
    (video_chatgpt/inference.py:86-112) for the quantized LLM.
    """
    _w4a8_block_body(
        x_ref, w_ref[:], s_ref[:], o_ref, xq_ref, sx_ref,
        groups_half=groups_half, quant_now=pl.program_id(1) == 0,
    )


def _w4a8_block_stacked_kernel(li_ref, x_ref, w_ref, s_ref, o_ref,
                               xq_ref, sx_ref, *, groups_half: int):
    """Stacked-layer wrapper of _w4a8_block_kernel: w_ref/s_ref carry a
    leading singleton layer dim selected by the scalar-prefetch layer
    index (see int4_matmul_stacked); grid (batch blocks, F blocks) —
    activation quant runs at each batch block's first F step."""
    del li_ref
    _w4a8_block_body(
        x_ref, w_ref[0], s_ref[0], o_ref, xq_ref, sx_ref,
        groups_half=groups_half, quant_now=pl.program_id(1) == 0,
    )


def _w4a8_block_body(x_ref, w, s_raw, o_ref, xq_ref, sx_ref, *,
                     groups_half: int, quant_now):
    dh, bf = w.shape

    @pl.when(quant_now)
    def _quantize():
        x = x_ref[:].astype(jnp.float32)  # (bb, d)
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8
        ) / 127.0  # (bb, 1)
        xq_ref[:] = (
            jnp.clip(jnp.round(x / sx), -127, 127)
            .astype(jnp.int32)
            .astype(jnp.int8)
        )
        sx_ref[:] = sx

    p = w.astype(jnp.int32)  # (Dh, bf)
    lo = ((p & 15) - 8).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.int8)
    xq = xq_ref[:]
    s = s_raw.astype(jnp.float32)  # (G, bf)

    if groups_half == 0:  # one group total: same scale row for both halves
        acc = jnp.dot(
            xq[:, :dh], lo, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        acc += jnp.dot(
            xq[:, dh:], hi, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        o_ref[:] = acc * s[0:1] * sx_ref[:]
        return

    g = dh // groups_half
    b = xq.shape[0]
    acc = jnp.zeros((b, bf), jnp.float32)
    for gi in range(groups_half):
        r0 = gi * g
        acc += s[gi : gi + 1] * jnp.dot(
            xq[:, r0 : r0 + g], lo[r0 : r0 + g],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc += s[groups_half + gi : groups_half + gi + 1] * jnp.dot(
            xq[:, dh + r0 : dh + r0 + g], hi[r0 : r0 + g],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    o_ref[:] = acc * sx_ref[:]


def _w4_matvec_kernel(xc_ref, w_ref, s_ref, o_ref, *, groups_half: int):
    """Decode (batch=1) variant. MXU dots with a (1, k) lhs run at
    ~1/128 utilization and make the kernel compute-bound (measured 73
    vs 91 tok/s against the XLA int8 path), so the matvec is computed
    on the VPU instead: per contraction group, broadcast-multiply the
    unpacked nibbles by the x column and segment-sum over sublanes —
    y = sum_g s[g] * sum_{k in g} x[k] * q[k, :]. Compute stays under
    the HBM stream time, so the step is bandwidth-bound at int4 bytes.

    xc_ref: (2*Dh, 1) x column; w_ref: (Dh, bf) packed; s_ref: (G, bf);
    o_ref: (1, bf) f32.
    """
    dh, bf = w_ref.shape
    s = s_ref[:].astype(jnp.float32)  # (G, bf)
    n = max(groups_half, 1)
    g = dh // n
    acc = jnp.zeros((1, bf), jnp.float32)
    for gi in range(n):
        r0 = gi * g
        p = w_ref[r0 : r0 + g, :].astype(jnp.int32)
        lo = ((p & 15) - 8).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.float32)
        xl = xc_ref[r0 : r0 + g, :].astype(jnp.float32)  # (g, 1)
        xh = xc_ref[dh + r0 : dh + r0 + g, :].astype(jnp.float32)
        pl = jnp.sum(lo * xl, axis=0, keepdims=True)  # (1, bf)
        ph = jnp.sum(hi * xh, axis=0, keepdims=True)
        if groups_half == 0:
            acc += pl + ph
        else:
            acc += s[gi : gi + 1] * pl
            acc += s[groups_half + gi : groups_half + gi + 1] * ph
    if groups_half == 0:
        acc *= s[0:1]
    o_ref[:] = acc


def _w4a8_matvec_kernel(x_ref, w_ref, s_ref, o_ref, *scratch,
                        groups_half: int, ga: int, nb: int):
    """Small-batch decode W4A8 variant: activations are pre-quantized to
    int8 (per contraction group), so the per-group partials run as int8
    MXU dots (2x the bf16 MXU rate) and the nibble unpack stays in int8
    (two 1-byte-lane shifts per byte, ~4x the f32 VPU width). The f32
    VPU matvec above is compute-bound well past the int4 HBM stream
    time; this formulation brings compute under the stream for the 13B
    single-chip target (BASELINE north star).

    y = sum_g (sx[g] * sw[g, :]) * (xq_g . q_g)  [int32 dot, f32 scale]

    The per-group int32 dots run as ONE MXU pass: the quantized
    activation row is expanded to a block-diagonal (G, D) int8 matrix
    (row g holds xq over group g's columns, zeros elsewhere) so a single
    (G, D) @ (D, bf) int8 dot yields every group partial at once. The
    G-fold zero padding costs ~G x the useful int8 MXU work —
    microseconds against the int4 HBM stream — whereas G *sequential*
    (1, g) dots (the first formulation) ran the MXU one row at a time
    and left decode compute-bound (~45 tok/s on 13B, ~int8 parity).

    Activation quantization happens IN the kernel (x is one 16 KB row;
    the per-F-block recompute is free VPU work) — hoisting it to XLA
    cost ~100 us/layer of small-op dispatch between the pallas calls.

    Batch rows (nb <= A8_MAX_BATCH): the block-diagonal spread +
    activation quant run as a STATIC per-row loop (f32 temporaries stay
    at their batch-1 size — a fused (nb*G, D) f32 spread would hit
    15 MB for `down` at nb=4, and caching the spread in scratch
    measured SLOWER: the (G, 1) scale scratch reads are 1-lane stalls),
    but the already-int8 spreads CONCATENATE into one (nb*G, D) operand
    for a single MXU dot per weight block: the per-row dot loop fed the
    weight operand nb times at <=G-row (quarter-tile) M utilization,
    so decode batch 4 paid ~4x the MXU passes of batch 1 for the same
    math.

    x_ref: (nb, 2*Dh) f32 activations; w_ref: (Dh, bf) packed int8;
    s_ref: (G, bf) weight scales; o_ref: (nb, bf) f32.
    ga: number of activation groups (== weight groups, or 2 when the
    weight scale is per-tensor).
    """
    _MATVEC_BODIES[UNPACK_MODE](
        x_ref, w_ref[:], s_ref[:], o_ref, *scratch,
        groups_half=groups_half, ga=ga, nb=nb,
        quant_now=pl.program_id(0) == 0,
    )


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _w4a8_matvec_body_axor(x_ref, w, s_raw, o_ref, xq_ref,
                           sxl_ref, sxh_ref, rsl_ref, *,
                           groups_half: int, ga: int, nb: int, quant_now):
    """W4A8 matvec for the OFFSET-BINARY low nibble (round-5 rewrite).

    Measured on chip (RTT-free interleaved probe, round 5): a Mosaic
    dot STREAMING AN INPUT REF hides entirely under the block's DMA,
    while each dot on a DERIVED (computed) operand pays ~3 us/call of
    VMEM round-trip, and the i8->i32 convert+shift unpack chain costs
    about the same again — the shipping kernels ran 15-30% over their
    DMA floor. This body exploits pack_int4's offset-binary low nibble
    (byte == 16 * hi + a with a = byte & 15 in [0, 15], see pack_int4)
    to touch ONE derived operand, produced by ONE native-i8 AND
    (Mosaic legalizes i8 and/xor but not i8 shifts/compares/add —
    probed on chip):

        x_lo . lo = dot(x_lo, a) - 8 * rowsum(x_lo)
        x_hi . hi = (dot(x_hi, byte) - dot(x_hi, a)) / 16

    dot(x_hi, byte) rides the ref; the two a-dots merge into one
    row-concatenated dot so `a` streams through the MXU once. The
    activation spread/quant/rowsums are built ONCE per call into VMEM
    scratch at the first F grid step (the F sweep reuses them).
    Integer-exact: identical int32 partials to the convert form.
    """
    dh, bf = w.shape
    d = 2 * dh
    gh = max(groups_half, 1)  # spread rows per half (ga==2 -> 1+1)
    ghp = _pad8(gh)  # Mosaic: row broadcasts/selects want 8-multiples
    g_rows = dh // gh
    sw = s_raw.astype(jnp.float32)  # (G, bf)

    @pl.when(quant_now)
    def _build_spreads():
        """Quantize + spread x ONCE per call (the F sweep reuses the
        scratch): per-F-block recompute measured as the largest
        non-hidden VPU term at the gate_up shape (round-5 probe).

        Built FULL-WIDTH (ghp, d): a sublane broadcast of a lane-SLICED
        (1, dh) row hits a Mosaic "Invalid input layout" whenever
        dh % 1024 != 0 (down/13B shapes, probed on chip), while the
        full-row broadcast always legalizes. Spread row g selects group
        g's columns in BOTH halves ((col % dh) // g_rows == g), so one
        (ghp, d) int8 scratch holds the lo spread in columns [0, dh)
        and the hi spread in [dh, d) — the dots read ref slices."""
        col = jax.lax.broadcasted_iota(jnp.int32, (ghp, d), 1)
        row_id = jax.lax.broadcasted_iota(jnp.int32, (ghp, d), 0)
        m = (col % dh) // g_rows == row_id  # rows >= gh: zero rows
        is_lo = col < dh

        xs, sxls, sxhs, rsls = [], [], [], []
        for r in range(nb):  # static: nb is a compile-time constant
            xr = x_ref[r : r + 1, :].astype(jnp.float32)
            xm = jnp.where(m, jnp.broadcast_to(xr, (ghp, d)), 0.0)
            ax = jnp.abs(xm)
            sxl = jnp.maximum(
                jnp.max(jnp.where(is_lo, ax, 0.0), axis=1, keepdims=True),
                1e-8,
            ) / 127.0
            sxh = jnp.maximum(
                jnp.max(jnp.where(is_lo, 0.0, ax), axis=1, keepdims=True),
                1e-8,
            ) / 127.0
            sdiv = jnp.where(is_lo, sxl, sxh)  # column-broadcast scales
            xq = jnp.clip(jnp.round(xm / sdiv), -127, 127)
            rs = jnp.sum(
                jnp.where(is_lo, xq, 0.0), axis=1, keepdims=True
            )
            xs.append(xq.astype(jnp.int32).astype(jnp.int8))
            sxls.append(sxl); sxhs.append(sxh); rsls.append(rs)
        cat = lambda v: v[0] if nb == 1 else jnp.concatenate(v, axis=0)
        xq_ref[:] = cat(xs)
        sxl_ref[:] = cat(sxls)
        sxh_ref[:] = cat(sxhs)
        rsl_ref[:] = cat(rsls)

    xlo = xq_ref[:, :dh]  # ref-slice reads (128-aligned offsets)
    xhi = xq_ref[:, dh:]
    a = w & jnp.int8(15)  # offset low nibble: ONE native-i8 VPU op
    nr = nb * ghp
    xcat = jnp.concatenate([xlo, xhi], axis=0)
    aa = jnp.dot(xcat, a, preferred_element_type=jnp.int32)
    a1, a4 = aa[:nr], aa[nr:]
    a3 = jnp.dot(xhi, w, preferred_element_type=jnp.int32)
    if groups_half and ghp > gh:  # zero-pad the scale halves to ghp rows
        pad = jnp.zeros((ghp - gh, bf), jnp.float32)
        sw_lo = jnp.concatenate([sw[:gh], pad], axis=0)
        sw_hi = jnp.concatenate([sw[gh:], pad], axis=0)
    else:
        sw_lo, sw_hi = sw[:gh], sw[gh:]
    for r in range(nb):
        rows = slice(r * ghp, (r + 1) * ghp)
        # exact in f32: |dot| <= 127*127*128 ~ 2.1e6 << 2^24
        p_lo = a1[rows].astype(jnp.float32) - 8.0 * rsl_ref[rows]
        p_hi = (
            a3[rows].astype(jnp.float32) - a4[rows].astype(jnp.float32)
        ) * 0.0625
        if groups_half == 0:
            acc = (
                jnp.sum(p_lo * sxl_ref[rows], axis=0, keepdims=True)
                + jnp.sum(p_hi * sxh_ref[rows], axis=0, keepdims=True)
            ) * sw[0:1]
        else:
            acc = jnp.sum(
                p_lo * sxl_ref[rows] * sw_lo, axis=0, keepdims=True
            )
            acc += jnp.sum(
                p_hi * sxh_ref[rows] * sw_hi, axis=0, keepdims=True
            )
        o_ref[r : r + 1] = acc


def _w4a8_matvec_body(x_ref, w, s_raw, o_ref, *scratch,
                      groups_half: int, ga: int, nb: int, quant_now=None):
    del scratch, quant_now  # convert form recomputes per block
    dh, bf = w.shape
    d = 2 * dh
    # Mosaic only legalizes VECTOR shifts at i32 (an i16 variant of
    # this unpack fails Mosaic lowering on chip: "failed to legalize
    # arith.shli" — interpret mode passes, round-4 attempt): unpack via
    # int32 shifts, then narrow to int8 for the MXU int8 dot. Measured
    # headroom note: the four decode matvecs run at ~1.2-1.3x their
    # effective HBM floor (78 us vs ~61-65 us for the 45 MB gate_up at
    # ~85-90% DMA efficiency), so the unpack largely overlaps the
    # weight stream and further unpack micro-optimization has little
    # to win. Row order of q is the ORIGINAL kernel row order (lo
    # nibbles = rows [0, Dh), hi nibbles = rows [Dh, 2Dh)), matching
    # both x's and the scale groups' layout.
    p = w.astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=0)  # (d, bf) int8
    g_rows = d // ga
    col_group = jax.lax.broadcasted_iota(jnp.int32, (ga, d), 1) // g_rows
    row_id = jax.lax.broadcasted_iota(jnp.int32, (ga, d), 0)
    diag = col_group == row_id
    sw = s_raw.astype(jnp.float32)  # (G, bf)
    # Build every row's block-diagonal int8 spread, then run ONE MXU
    # dot for the whole batch: a per-row dot loop fed the (d, bf)
    # weight operand nb times at <=ga-row (quarter-tile) M utilization
    # — at decode batch 4 the concatenated (nb*ga, d) form fills a full
    # 128-row M tile for the same pass count as batch 1.
    xdiags, sxs = [], []
    for r in range(nb):  # static: nb is a compile-time constant
        x_rows = jnp.broadcast_to(
            x_ref[r : r + 1, :].astype(jnp.float32), (ga, d)
        )
        # block-diagonal spread of row r (spread row g = group g's
        # columns, else 0), then per-group absmax scales as row
        # reductions — the f32 select is layout-safe (i1 and f32 share
        # (8,128) tiling; selecting in i8 hit "Invalid relayout"
        # against i8's (32,128) tiling).
        xm = jnp.where(diag, x_rows, 0.0)  # (ga, d) f32
        sx = jnp.maximum(
            jnp.max(jnp.abs(xm), axis=1, keepdims=True), 1e-8
        ) / 127.0  # (ga, 1)
        xdiags.append(
            jnp.clip(jnp.round(xm / sx), -127, 127)
            .astype(jnp.int32)
            .astype(jnp.int8)
        )
        sxs.append(sx)
    xall = xdiags[0] if nb == 1 else jnp.concatenate(xdiags, axis=0)
    part_all = jnp.dot(
        xall, q, preferred_element_type=jnp.int32
    ).astype(jnp.float32)  # (nb*ga, bf) per-(row, group) partials
    for r in range(nb):
        part = part_all[r * ga : (r + 1) * ga]
        if groups_half == 0:
            # per-tensor weight scale (s has one row), 2 groups
            acc = jnp.sum(part * sxs[r], axis=0, keepdims=True) * sw[0:1]
        else:
            acc = jnp.sum(part * sxs[r] * sw, axis=0, keepdims=True)
        o_ref[r : r + 1] = acc


def _w4a8_matvec_stacked_kernel(li_ref, x_ref, w_ref, s_ref, o_ref,
                                *scratch,
                                groups_half: int, ga: int, nb: int):
    """Stacked-layer wrapper of _w4a8_matvec_kernel: w_ref/s_ref blocks
    carry a leading singleton layer dim selected by the scalar-prefetch
    layer index (see int4_matmul_stacked)."""
    del li_ref
    _MATVEC_BODIES[UNPACK_MODE](
        x_ref, w_ref[0], s_ref[0], o_ref, *scratch,
        groups_half=groups_half, ga=ga, nb=nb,
        quant_now=pl.program_id(0) == 0,
    )


def _matvec_scratch_shapes(nb: int, dh: int, groups_half: int):
    """VMEM scratch for the axor matvec body (spread/scale/rowsum
    stash, built once per call at the first F grid step). The convert
    body takes and ignores the same refs — allocation is a few hundred
    KB against a 128 MB VMEM."""
    ghp = _pad8(max(groups_half, 1))
    return [
        pltpu.VMEM((nb * ghp, 2 * dh), jnp.int8),  # lo|hi spread
        pltpu.VMEM((nb * ghp, 1), jnp.float32),    # sx lo
        pltpu.VMEM((nb * ghp, 1), jnp.float32),    # sx hi
        pltpu.VMEM((nb * ghp, 1), jnp.float32),    # rowsum lo
    ]


def quantize_activation_int8(x: jax.Array, n_groups: int):
    """x: (1, D) -> (int8 (1, D), (G, 1) f32 scales): symmetric absmax
    per contraction group (matching the weight group layout, so the
    kernel applies one fused scale per (group, channel))."""
    b, d = x.shape
    g = d // max(n_groups, 1)
    xg = x.astype(jnp.float32).reshape(b, max(n_groups, 1), g)
    absmax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)
    return q.reshape(b, d), sx.reshape(max(n_groups, 1), 1)[: n_groups or 2]


def int4_matmul_w4a8_xla(x: jax.Array, packed: jax.Array, scales: jax.Array):
    """XLA twin of the W4A8 decode math (activation-quantization error
    included) — the parity reference for the Pallas kernel and the CPU
    fallback when a8 semantics are requested. x: (1, D) -> (1, F) f32."""
    dh, f = packed.shape
    n_groups = scales.shape[-2]
    xq, sx = quantize_activation_int8(
        x.reshape(1, -1), n_groups if n_groups > 1 else 2
    )
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = jax.lax.shift_right_arithmetic(p, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # (D, F)
    if n_groups > 1:
        g = 2 * dh // n_groups
        sw = jnp.repeat(scales.astype(jnp.float32), g, axis=-2)  # (D, F)
    else:
        sw = jnp.broadcast_to(scales.astype(jnp.float32), (2 * dh, f))
    # per-row combined scale: activation group scale broadcast over rows
    sx_rows = jnp.repeat(sx[:, 0], 2 * dh // sx.shape[0])  # (D,)
    return jnp.dot(
        xq.astype(jnp.float32) * sx_rows[None, :], q * sw,
        preferred_element_type=jnp.float32,
    )


def int4_matmul_w4a8_block_xla(
    x: jax.Array, packed: jax.Array, scales: jax.Array
):
    """XLA twin of the W4A8 BLOCK math (per-ROW int8 activation scales,
    activation-quantization error included) — parity reference for
    _w4a8_block_kernel and the CPU fallback. x: (B, D) -> (B, F) f32."""
    dh, f = packed.shape
    d = 2 * dh
    xb = x.reshape(-1, d).astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xb), axis=1, keepdims=True), 1e-8
    ) / 127.0
    xq = jnp.clip(jnp.round(xb / sx), -127, 127)
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = jax.lax.shift_right_arithmetic(p, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # (D, F)
    n_groups = scales.shape[-2]
    if n_groups > 1:
        g = d // n_groups
        sw = jnp.repeat(scales.astype(jnp.float32), g, axis=-2)
    else:
        sw = jnp.broadcast_to(scales.astype(jnp.float32), (d, f))
    return jnp.dot(xq, q * sw, preferred_element_type=jnp.float32) * sx


def _pick_block(
    n: int, candidates: Sequence[int], max_elems: Optional[int] = None,
    other_dim: int = 1,
) -> int:
    for c in candidates:
        if n % c == 0 and (max_elems is None or c * other_dim <= max_elems):
            return c
    return n


def _pick_batch_block(b: int, max_elems: int, d: int) -> int:
    """Batch (M) block for the int4 block kernels: the WHOLE batch when
    it fits the VMEM budget — weights then stream exactly once — else
    the largest power-of-2 divisor block.

    Whole-batch-first matters beyond VMEM comfort: a batch like 72
    (8-slot spec verify, 8 x (k+1)=9 rows) has no large divisor in the
    candidate list, and the old bb=8 choice swept the F grid NINE times
    — the packed weights re-streamed from HBM once per batch block,
    9 x 45 MB per gate_up call. That restreaming (not the matmul math)
    was the measured 8-slot 285 -> 96 tok/s serving collapse in round
    4 (bench_serving slot-scaling trace)."""
    if b * d <= max_elems:
        return b
    return _pick_block(b, (256, 128, 64, 32, 16, 8), max_elems=max_elems,
                       other_dim=d)


@functools.partial(jax.jit, static_argnames=("interpret", "a8", "a8_block"))
def int4_matmul_pallas(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    interpret: bool = False,
    a8: bool = False,
    a8_block: bool = False,
):
    """x: (B, D) -> (B, F) f32. Grid over (B blocks, F blocks); packed
    weights and scales stream HBM->VMEM once per F block per B block.

    a8 (batch=1 only): quantize activations to int8 per contraction
    group and run int8 MXU dots (_w4a8_matvec_kernel) — compute drops
    under the int4 HBM stream time.

    a8_block (b > A8_MAX_BATCH): per-ROW int8 activation scales + int8
    MXU K-split dots (_w4a8_block_kernel) — the prefill/spec-verify
    variant; ~2x the bf16 block kernel's MXU rate."""
    dh, f = packed.shape
    n_groups = scales.shape[0]
    b, d = x.shape
    assert d == 2 * dh, (d, dh)

    # VMEM budget: x block (bb, d) bf16 <= ~4 MB; per F block the kernel
    # holds packed (Dh, bf) int8 (double-buffered) plus two dequantized
    # bf16 halves (Dh, bf) each -> cap Dh * bf at 1.5M elements.
    groups_half = n_groups // 2 if n_groups > 1 else 0

    if b <= A8_MAX_BATCH and a8:  # (batched) decode: int8-MXU W4A8
        ga = n_groups if n_groups > 1 else 2
        bf = _pick_block(f, (512, 256, 128), max_elems=1 << 21, other_dim=dh)
        return pl.pallas_call(
            functools.partial(
                _w4a8_matvec_kernel, groups_half=groups_half, ga=ga, nb=b
            ),
            grid=(f // bf,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0)),
                pl.BlockSpec((dh, bf), lambda j: (0, j)),
                pl.BlockSpec((n_groups, bf), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((b, bf), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
            scratch_shapes=_matvec_scratch_shapes(b, dh, groups_half),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the batched (nb > 1) spread build holds nb (ghp, d)
                # f32 temporaries; the default 16 MB scoped-vmem budget
                # OOMs at 13B/batch-4 (25.6 MB demanded) — the chip has
                # 128 MB, leave room for double-buffered weight blocks
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x.astype(jnp.float32), packed, scales)

    if b == 1:  # decode: VPU matvec kernel (see _w4_matvec_kernel)
        bf = _pick_block(f, (512, 256, 128), max_elems=1 << 21, other_dim=dh)
        return pl.pallas_call(
            functools.partial(_w4_matvec_kernel, groups_half=groups_half),
            grid=(f // bf,),
            in_specs=[
                pl.BlockSpec((d, 1), lambda j: (0, 0)),
                pl.BlockSpec((dh, bf), lambda j: (0, j)),
                pl.BlockSpec((n_groups, bf), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, bf), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((1, f), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(x.reshape(d, 1), packed, scales)

    # Batch blocks must be a multiple of 8 OR the whole batch dim
    # (Mosaic tiling rule — bb in (4, 2, 1) lowers only when b == bb,
    # e.g. a 9-row speculative-verify forward must take bb = 9).
    if a8_block:
        # Whole-batch budget 10M elems: the old 1M cap split a 512-row
        # prefill into bb=256 blocks, sweeping the F grid TWICE and
        # re-streaming the packed weights 2x — measured 0.379 vs
        # 0.295 ms on the b=512 gate_up call (round-5 probe). The f32
        # x block (40 MB at 13B-down/512) + scratch + unpack temps fit
        # the raised 100 MB scoped-vmem budget.
        bb = _pick_batch_block(b, 10 << 20, d)
        if bb == b and b * d > 10 << 20:
            return int4_matmul_w4a8_block_xla(x, packed, scales)
        bf = _pick_block(f, (512, 256, 128), max_elems=3 << 20, other_dim=dh)
        return pl.pallas_call(
            functools.partial(_w4a8_block_kernel, groups_half=groups_half),
            grid=(b // bb, f // bf),
            in_specs=[
                pl.BlockSpec((bb, d), lambda i, j: (i, 0)),
                pl.BlockSpec((dh, bf), lambda i, j: (0, j)),
                pl.BlockSpec((n_groups, bf), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bb, bf), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bb, d), jnp.int8),
                pltpu.VMEM((bb, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x.astype(jnp.float32), packed, scales)

    bb = _pick_batch_block(b, 2 << 20, d)
    if bb == b and b * d > 2 << 20:
        # un-blockable odd batch too big for one VMEM block
        return int4_matmul_xla(x, packed, scales)
    bf = _pick_block(f, (512, 256, 128), max_elems=3 << 19, other_dim=dh)

    out = pl.pallas_call(
        functools.partial(_w4_matmul_kernel, groups_half=groups_half),
        grid=(b // bb, f // bf),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i, j: (i, 0)),
            pl.BlockSpec((dh, bf), lambda i, j: (0, j)),
            pl.BlockSpec((n_groups, bf), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bb, bf), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed, scales)
    return out


# Decode-path activation quantization (W4A8): ON by default — the int8
# MXU formulation is the one that reaches the int4 bandwidth roofline;
# the extra activation error is one int8 round on top of int4 weights.
# Opt out with VLT_INT4_A8=0 (falls back to the f32 VPU matvec).
import os as _os

_A8_DECODE = _os.environ.get("VLT_INT4_A8", "1") == "1"
A8_MAX_BATCH = int(_os.environ.get("VLT_INT4_A8_MAX_B", "8"))
# Max batch rows the W4A8 decode kernels take (static per-row spread +
# one batched MXU dot; weights stream once per step for the whole
# batch). Past this, or with
# VLT_INT4_A8_MAX_B=1, the W4A8 BLOCK kernel (per-row activation
# scales, int8 MXU) takes over; VLT_INT4_A8_BLOCK=0 falls back to the
# bf16-dequant block kernel. NOTE: measured
# on chip, batched decode (b>=4) runs FASTER on int8 weights than int4
# (11.7 vs 12.9 ms/step at b=4, 7B) — batching amortizes the weight
# stream, so int4's unpack compute stops paying; prefer int8 weights
# for throughput-oriented batched serving, int4 for latency.
_A8_BLOCK = _os.environ.get("VLT_INT4_A8_BLOCK", "1") == "1"
# Nibble-unpack formulation for the W4A8 decode matvec kernels:
#   axor    — 2-op native-i8 unpack ((p & 15) ^ 8) + dot-folded affine
#             corrections (round-5 default; see _w4a8_matvec_body_axor)
#   convert — i8->i32 widen + shifts + narrow (the round-2..4 form)
# Both are integer-exact and produce identical results; the knob exists
# for A/B measurement (scripts/profile_int4_block --decode).
UNPACK_MODE = _os.environ.get("VLT_INT4_UNPACK", "axor")
_MATVEC_BODIES = {
    "axor": _w4a8_matvec_body_axor,
    "convert": _w4a8_matvec_body,
}
# Max batch rows the STACKED W4A8 block kernel takes (2D grid: batch
# blocks x F blocks): covers speculative-verify forwards of every
# serving slot count (8 slots x (k+1)=4 drafts = 32 rows) AND full
# prefill chunks (512 rows) — neither pays the per-layer slice copy.
A8_BLOCK_STACKED_MAX_B = int(
    _os.environ.get("VLT_INT4_A8_BLOCK_MAX_B", "1024")
)


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array):
    """Dispatch: Pallas on TPU, XLA twin elsewhere. x (..., D) -> f32."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    if jax.default_backend() != "tpu" or packed.shape[-1] % 128:
        return int4_matmul_xla(x, packed, scales)
    xb = x.reshape(-1, d)
    y = int4_matmul_pallas(
        xb, packed, scales,
        a8=_A8_DECODE and xb.shape[0] <= A8_MAX_BATCH,
        a8_block=_A8_BLOCK and xb.shape[0] > A8_MAX_BATCH,
    )
    return y.reshape(lead + (packed.shape[-1],))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matvec_stacked_pallas(
    x: jax.Array,  # (nb, D) f32, nb <= A8_MAX_BATCH
    packed: jax.Array,  # (L, Dh, F) int8
    scales: jax.Array,  # (L, G, F)
    layer: jax.Array,  # () int32
    interpret: bool = False,
):
    """W4A8 decode matvec against ONE layer of a scan-stacked weight:
    the layer block is selected inside the pallas grid via a
    scalar-prefetch index_map, so the stacked array is passed WHOLE and
    only the selected layer's bytes ever move.

    Motivation (profiled on chip): inside `lax.scan` over layers, a
    dynamic-slice feeding a pallas_call cannot fuse — XLA materializes
    each layer's 25-45 MB weight slice as a copy before the kernel
    reads it, tripling decode weight traffic (12.4 -> ~7 ms/step at 7B
    int4). XLA's own dequant-einsum (int8 path) fuses the slice and
    never pays this.
    """
    nl, dh, f = packed.shape
    n_groups = scales.shape[1]
    nb, d = x.shape
    assert d == 2 * dh, (d, dh)
    groups_half = n_groups // 2 if n_groups > 1 else 0
    ga = n_groups if n_groups > 1 else 2
    bf = _pick_block(f, (512, 256, 128), max_elems=1 << 21, other_dim=dh)
    li = layer.reshape(1).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _w4a8_matvec_stacked_kernel, groups_half=groups_half, ga=ga,
            nb=nb,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f // bf,),
            in_specs=[
                pl.BlockSpec((nb, d), lambda j, li_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh, bf),
                             lambda j, li_ref: (li_ref[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_groups, bf),
                             lambda j, li_ref: (li_ref[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nb, bf), lambda j, li_ref: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_matvec_scratch_shapes(nb, dh, groups_half),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # see int4_matmul_pallas: batched spread build vs the 16 MB
            # default scoped-vmem budget
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(li, x.astype(jnp.float32), packed, scales)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_block_stacked_pallas(
    x: jax.Array,  # (nb, D) f32, A8_MAX_BATCH < nb <= A8_BLOCK_STACKED_MAX_B
    packed: jax.Array,  # (L, Dh, F) int8
    scales: jax.Array,  # (L, G, F)
    layer: jax.Array,  # () int32
    interpret: bool = False,
):
    """W4A8 BLOCK matmul against ONE layer of a scan-stacked weight
    (scalar-prefetch layer select, zero-copy — see the matvec variant's
    docstring for why the dynamic-slice form triples weight traffic).

    Covers two hot paths that used to fall off the stacked path onto a
    materialized per-layer slice + the bf16 block kernel:
      * speculative verify — an 8-slot serving step with k=3 drafts
        verifies 32 rows per weight stream (the measured 8-slot
        285 -> 96 tok/s collapse, round-4 bench_serving);
      * prefill through scan-stacked weights — 512 rows paid a 25-45 MB
        layer-slice copy per layer per chunk.
    Grid is (batch blocks, F blocks); the whole batch streams the
    selected layer's bytes exactly once."""
    nl, dh, f = packed.shape
    n_groups = scales.shape[1]
    nb, d = x.shape
    assert d == 2 * dh, (d, dh)
    groups_half = n_groups // 2 if n_groups > 1 else 0
    # whole-batch-first budgets: see int4_matmul_pallas's a8_block
    # branch (the 1M cap made 512-row prefills re-stream weights 2x)
    bb = _pick_batch_block(nb, 10 << 20, d)
    bf = _pick_block(f, (512, 256, 128), max_elems=3 << 20, other_dim=dh)
    li = layer.reshape(1).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_w4a8_block_stacked_kernel,
                          groups_half=groups_half),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb // bb, f // bf),
            in_specs=[
                pl.BlockSpec((bb, d), lambda i, j, li_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh, bf),
                             lambda i, j, li_ref: (li_ref[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_groups, bf),
                             lambda i, j, li_ref: (li_ref[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, bf), lambda i, j, li_ref: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bb, d), jnp.int8),
                pltpu.VMEM((bb, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(li, x.astype(jnp.float32), packed, scales)


def int4_matmul_stacked(
    x: jax.Array, packed: jax.Array, scales: jax.Array, layer: jax.Array
):
    """int4 matmul against layer `layer` of scan-stacked weights
    packed (L, Dh, F) / scales (L, G, F). x (..., D) -> (..., F) f32.

    Decode (up to A8_MAX_BATCH rows, TPU): zero-copy stacked W4A8
    matvec kernel — weights stream once per step for the whole batch.
    Speculative-verify (up to A8_BLOCK_STACKED_MAX_B rows): zero-copy
    stacked W4A8 BLOCK kernel. Otherwise (prefill, CPU): explicit
    layer slice + the regular dispatch — the slice copy is once per
    prefill, not once per generated token."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xb = x.reshape(-1, d)
    f = packed.shape[-1]
    if jax.default_backend() == "tpu" and not f % 128 and _A8_DECODE:
        nb = xb.shape[0]
        if nb <= A8_MAX_BATCH:
            y = _int4_matvec_stacked_pallas(xb, packed, scales, layer)
            return y.reshape(lead + (f,))
        if (
            _A8_BLOCK
            and nb <= A8_BLOCK_STACKED_MAX_B
            # odd batches (not a multiple of 8) must fit one VMEM block
            # (Mosaic batch-tiling rule — see int4_matmul_pallas)
            and not (nb % 8 and nb * d > 10 << 20)
        ):
            y = _int4_block_stacked_pallas(xb, packed, scales, layer)
            return y.reshape(lead + (f,))
    packed_l = jax.lax.dynamic_index_in_dim(packed, layer, 0, keepdims=False)
    scales_l = jax.lax.dynamic_index_in_dim(scales, layer, 0, keepdims=False)
    return int4_matmul(x, packed_l, scales_l)


# ---------------------------------------------------------------------------
# Params transform
# ---------------------------------------------------------------------------


def quantize_params_int4(
    params,
    group_size: Optional[int] = 128,
    min_size: int = 1 << 16,
    skip_keys: Sequence[str] = ("class_embedding", "position_embedding"),
):
    """int4-quantize every 2D+ kernel leaf >= min_size elements whose
    dims admit the packing/grouping; embedding tables stay int8 (they
    are row gathers, not matmuls). Stacked (L, D, F) kernels vmap."""
    from video_llava_tpu.ops.quant import quantize_tensor

    def visit(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        name = keys[-1] if keys else ""
        if leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        if any(k in "/".join(keys) for k in skip_keys):
            return leaf
        if name == "kernel":
            d = leaf.shape[-2]
            f = leaf.shape[-1]
            g = group_size or d
            if (
                d % 2
                or d % g
                or (d // g > 1 and (d // 2) % g)
                or f % 128  # Pallas F blocks are 128-aligned (lm_head
                #            vocab 32006 stays int8 — it is read once
                #            per step, the win would be ~1%)
            ):
                q, s = quantize_tensor(leaf, axis=-2)  # int8 fallback
                return {"qvalues": q, "scales": s}
            packed, scales = quantize_tensor_int4(leaf, group_size)
            return {"qvalues_packed": packed, "scales": scales}
        if name == "weight" and leaf.ndim == 2:  # embedding table
            q, s = quantize_tensor(leaf, axis=1)
            return {"qvalues": q, "scales": s}
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)

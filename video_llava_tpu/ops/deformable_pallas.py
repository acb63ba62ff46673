"""Pallas TPU kernel for multi-scale deformable attention.

The XLA formulation (ops/deformable.py) is gather-bound on TPU: each
(query, head, level, point) needs four 32-float rows of the value map,
and XLA lowers `take_along_axis` to an irregular dynamic-gather that
issues far below the VPU/MXU rates (profiled: it dominates the 406 ms
GroundingDINO forward; the reference instead ships a CUDA gather kernel,
groundingdino MSDeformAttn, used at grounding_new_api.py:25,288).

TPU-first reformulation — no gathers, only MXU matmuls and VPU masks:

  * each level's value map is laid out (h, w*d) and kept VMEM-resident
    per (batch*head) grid row;
  * bilinear sampling is separable: the y-interpolation of BOTH corner
    rows is ONE matmul  W_y @ V  where W_y (qp, h) is a 2-hot matrix
    built as the bilinear TENT  relu(1 - |row - yf|)  (times the
    attention weight) — no floor/compare/select, no scatter;
  * the x-selection multiplies the interpolated rows (qp, w*d) by the
    same tent over the lane-group index  relu(1 - |iota//d - xf|)  and
    folds w*d -> d with a constant binary matrix G[x*d+j, j] = 1 — a
    second matmul, so the whole op runs at MXU rates;
  * out-of-map corners land >= 1 away from every in-map integer (and
    padded rows hold zeros), so the tent reproduces grid_sample's zero
    padding with no clip/select logic;
  * meta rows are ordered P-MAJOR within each query block
    ([p0q0..p0qb, p1q0..] instead of [q0p0..q0p3, q1p0..]), so the sum
    over points is p-1 contiguous sublane-block adds on s — which lets
    it run BEFORE the fold (both are linear): the fold matmul then has
    qb rows instead of qb*p. Its N = hd(=32) pads to a full 128-lane
    MXU tile, so every row it does not process is a direct saving —
    measured 16.3 -> 10.1 ms per 800 px layer (chained-iteration
    timing, v5e) with query_block=64.

Tile accounting at 800 px (q = 13294, 8 heads, 4 levels, 4 points,
hd = 32): the y-matmuls must read every value tile per query block —
ceil(h/128) * ceil(w*hd/128) summed over levels = 49 tile-ops per
block — which puts their floor at ~7 ms on one v5e MXU; the p-collapse
removes 3/4 of the fold's row-tiles on top of that. Measured 10.1 ms
sits ~40% above the read floor (mask builds + the f32 fold's residue).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(win_ref, meta_ref, g_ref, *refs, shapes, qb, p, hd, th,
            win_tiles):
    """Grid (bh, nqb). refs = [v_0..v_{L-1}, out, r_scratch].

    win_ref: flat (bh*nqb*2L,) int32 scalar-prefetch: per level,
        [start_tile, fits] — when `fits`, every sampled row of this
        query block lies in [start_row, start_row + win_tiles*th), so
        the dominant y-matmul runs over that WINDOW (K = win_tiles*th
        instead of h: queries are raster-ordered and deformable offsets
        are local pixel-unit displacements off per-query reference
        points, so a block's samples cluster in a few rows). When the
        span doesn't fit (or the level is small), the full-height dot
        runs — the worst case is exactly the untiled kernel. Exact
        either way: the window provably covers all matching rows.
    meta_ref: (1, 3*L, p*qb) f32 rows [yf, xf, aw] per level — the
        CONTINUOUS sample coordinates (grid-sample pixel space) —
        P-MAJOR within the block (row k*qb + i is point k of query i).
        Interpolation weights are the bilinear TENT function
        relu(1 - |iota - coord|): it reproduces both corner weights
        ((1-d) at floor(coord), d at floor(coord)+1), is exactly 0 at
        every other integer, and needs no floor/compare/select — 4 VPU
        ops per element instead of the 7 of the 2-hot compare form on
        the x path, which is where the kernel's non-MXU time lives
        ((qp, w*hd) elements vs the y path's (qp, h)).
    g_ref: (max_wd, hd) fold matrix, G[x*hd + j, j] = 1.
    v_l: (1, h_pad_l, w_l*hd) value map for this bh (h zero-padded to
        the row-tile size; padded rows are zero and OOB y's match
        nothing, reproducing grid_sample zero padding).
    out: (1, qb, hd) f32.
    r_scratch: (qp, max_wd) f32 — the y-interpolated rows, written by
        whichever branch ran, consumed by the unconditional
        mask/point-sum/fold tail.
    """
    out_ref, r_ref = refs[-2], refs[-1]
    i, j = pl.program_id(0), pl.program_id(1)
    qp = qb * p
    # win_tiles == 0 disables the window: every level takes the static
    # full-height dot (the measured default — see wrapper docstring).
    ww = win_tiles * th if win_tiles > 0 else (1 << 30)
    acc = jnp.zeros((qb, hd), jnp.float32)
    for lvl, (h, w) in enumerate(shapes):
        wd = w * hd

        def col(k):
            # (1, qp) meta row -> (qp, 1) column vector.
            return jnp.transpose(
                meta_ref[0, 3 * lvl + k : 3 * lvl + k + 1, :], (1, 0)
            )

        yf, xf, aw = (col(k) for k in range(3))

        def wy_rows(base, rows):
            # bilinear tent rows for riota = base + [0, rows) (int32
            # iota + convert: Mosaic's iota is integer-typed), carrying
            # the attention weight (linear in v, so it can ride the
            # 32x-smaller y operand; in bf16 values the extra rounding
            # is below the value dtype's own epsilon).
            riota = (
                jax.lax.broadcasted_iota(jnp.int32, (qp, rows), 1)
                + base
            ).astype(jnp.float32)
            return (
                jnp.maximum(0.0, 1.0 - jnp.abs(riota - yf)) * aw
            )

        v_dtype = refs[lvl].dtype
        if h > ww:
            # win_ref carries the TILE index (start = tile * th): the
            # th-multiple form lets Mosaic statically prove the dynamic
            # sublane slice is tile-aligned.
            nl2 = 2 * len(shapes)
            base_i = (i * pl.num_programs(1) + j) * nl2 + 2 * lvl
            start = win_ref[base_i] * th
            fits = win_ref[base_i + 1]

            @pl.when(fits > 0)
            def _(start=start, lvl=lvl, wd=wd):
                v = refs[lvl][0, pl.ds(start, ww), :]  # (ww, wd)
                r_ref[:, :wd] = jnp.dot(
                    wy_rows(start, ww).astype(v_dtype), v,
                    preferred_element_type=jnp.float32,
                )

            @pl.when(fits == 0)
            def _(lvl=lvl, wd=wd, h=h):
                v = refs[lvl][0, :, :]  # (h_pad, wd)
                r_ref[:, :wd] = jnp.dot(
                    wy_rows(0, h).astype(v_dtype), v,
                    preferred_element_type=jnp.float32,
                )
        else:
            v = refs[lvl][0, :, :]
            r_ref[:, :wd] = jnp.dot(
                wy_rows(0, h).astype(v_dtype), v,
                preferred_element_type=jnp.float32,
            )

        # -- x selection: bilinear tent over the lane-group index (the
        # attention weight already rode the y operand). Built per level:
        # a hoisted (qp, max_wd) iota sliced to wd crashes Mosaic's
        # vector layout pass when wd isn't a 128-lane multiple.
        xg = (
            jax.lax.broadcasted_iota(jnp.int32, (qp, wd), 1) // hd
        ).astype(jnp.float32)
        mxa = jnp.maximum(0.0, 1.0 - jnp.abs(xg - xf))
        s = r_ref[:, :wd] * mxa
        # -- sum over points BEFORE the fold (both linear): p-major row
        # order makes this p-1 contiguous sublane-block adds, and the
        # fold matmul — whose N=hd pads to a full 128-lane MXU tile —
        # then runs on qb rows instead of qb*p.
        sq = s[0:qb]
        for k in range(1, p):
            sq = sq + s[k * qb : (k + 1) * qb]
        # fold runs in the VALUE dtype (g_ref is built in it): an f32
        # MXU matmul costs several bf16 passes, and with bf16 values
        # the products are bf16-precision-limited anyway.
        acc = acc + jnp.dot(
            sq.astype(g_ref.dtype), g_ref[:wd, :],
            preferred_element_type=jnp.float32,
        )  # (qb, hd)
    out_ref[0] = acc


def multi_scale_deformable_attention_pallas(
    value: jax.Array,  # (b, sum_hw, nh, hd)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,  # (b, q, nh, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (b, q, nh, L, P)
    *,
    query_block: int = 64,
    row_tile: int = 16,
    win_tiles: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in twin of ops.deformable.multi_scale_deformable_attention
    -> (b, q, nh*hd).

    query_block: queries per grid step. 64 (default) measures fastest
    within comfortable VMEM at 800 px; 128 is marginally faster but
    sits at the ~16 MB scoped-VMEM edge for large level-0 maps.
    row_tile/win_tiles: the y-matmul window is win_tiles*row_tile rows.
    Queries are raster-ordered and deformable offsets are local
    (pixel-unit offsets off a per-query reference point,
    grounding_dino._deformable_attention), so a query block's samples
    cluster in a few rows of each level — when the block's exact y-span
    fits the window, the y-matmul (the kernel's dominant cost) runs
    over K = window rows instead of K = h. Blocks that don't fit take
    the full-height path, so the worst case is the unwindowed kernel.

    win_tiles=0 (DEFAULT) disables the window entirely. Measured on
    chip at the 800 px encoder shape (local raster offsets, the regime
    the window targets): static full-height 9.1 ms; windowed ww=32
    14.7 ms; ww=64 11.2 ms — Mosaic's dynamic sublane slice + branch
    costs more than the reduced K saves, so the window stays opt-in
    (the h-tile-padding + scratch restructure alone took the kernel
    10.2 -> 9.1 ms). Revisit if Mosaic's dynamic-slice lowering
    improves."""
    b, sum_hw, nh, hd = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]
    th = row_tile
    shapes = tuple((int(h), int(w)) for (h, w) in spatial_shapes)
    shapes_pad = tuple((-(-h // th) * th, w) for (h, w) in shapes)
    bh = b * nh

    qb = min(query_block, max(8, q))
    q_pad = -(-q // qb) * qb
    qp_pad = q_pad * n_points

    # -- per-level value maps, (bh, h_pad, w*hd), head-major; h zero-
    # pads to the row-tile size (padded rows hold zero values, so any
    # tent weight landing on them contributes 0)
    v_levels = []
    offset = 0
    for (h, w), (hp, _) in zip(shapes, shapes_pad):
        v = value[:, offset : offset + h * w]  # (b, hw, nh, hd)
        v = v.reshape(b, h, w, nh, hd).transpose(0, 3, 1, 2, 4)
        v = v.reshape(bh, h, w * hd)
        if hp != h:
            v = jnp.pad(v, ((0, 0), (0, hp - h), (0, 0)))
        v_levels.append(v)
        offset += h * w

    # -- per-level sampling scalars, row-major (q, p) flattened.
    # locs -> (bh, L, q, p) components.
    locs = sampling_locations.astype(jnp.float32).transpose(
        0, 2, 3, 1, 4, 5
    )  # (b, nh, L, q, p, 2)
    locs = locs.reshape(bh, n_levels, q, n_points, 2)
    aw = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 3, 1, 4)
        .reshape(bh, n_levels, q, n_points)
    )
    wh = jnp.asarray([[w, h] for (h, w) in shapes], jnp.float32)
    xy = locs * wh[None, :, None, None, :] - 0.5
    # Non-finite sampling coords (degenerate inputs) map to the padding
    # sentinel: the tent max(0, 1-|iota-coord|) would propagate NaN into
    # the output, whereas -10 is > 1 away from every row/lane -> exact
    # zero contribution (the old 2-hot equality masks' behavior).
    xy = jnp.where(jnp.isfinite(xy), xy, -10.0)
    # continuous grid-sample coords: the kernel's tent weights
    # relu(1 - |iota - coord|) reproduce both bilinear corners exactly.
    meta = jnp.stack([xy[..., 1], xy[..., 0], aw], axis=2)  # (bh,L,3,q,p)
    if q_pad != q:
        # pad queries: yf = -10 is > 1 away from every row -> tent 0.
        pad = jnp.zeros(
            (bh, n_levels, 3, q_pad - q, n_points), jnp.float32
        ).at[:, :, 0].set(-10.0)
        meta = jnp.concatenate([meta, pad], axis=3)

    # -- per-(block, level) row WINDOW (scalar prefetch): [start, fits].
    # Needed rows are [max(min y0, 0), min(max y0 + 1, h-1)] (a sample
    # touches rows y0 and y0+1; OOB rows match nothing). When that span
    # fits in win_tiles*th rows from the th-aligned start, the kernel's
    # y-matmul runs over just the window.
    ww = win_tiles * th
    nqb = q_pad // qb
    if win_tiles <= 0:
        # window disabled: static full-height kernel, dummy prefetch.
        win = jnp.zeros((1,), jnp.int32)
    else:
        y0_blocks = jnp.floor(meta[:, :, 0]).reshape(
            bh, n_levels, nqb, qb * n_points
        )
        win_cols = []
        for lvl, ((h, _), (hp, _)) in enumerate(zip(shapes, shapes_pad)):
            if h <= ww:  # kernel uses the full map; slots unused
                zeros = jnp.zeros((bh, nqb), jnp.int32)
                win_cols += [zeros, zeros]
                continue
            yb = y0_blocks[:, lvl]  # (bh, nqb, qb*p); padded = -10
            validq = yb > -9.0
            big = jnp.float32(1e9)
            ymin = jnp.min(jnp.where(validq, yb, big), axis=2)
            ymax = jnp.max(jnp.where(validq, yb, -big), axis=2)
            low = jnp.maximum(ymin, 0.0)
            high = jnp.minimum(ymax + 1.0, h - 1.0)
            # stored as a TILE index (kernel multiplies by th: Mosaic
            # can then prove the dynamic row slice is tile-aligned)
            start_tile = jnp.clip(
                jnp.floor(low / th).astype(jnp.int32), 0, (hp - ww) // th
            )
            start = (start_tile * th).astype(jnp.float32)
            fits = (high < start + ww).astype(jnp.int32)
            win_cols += [start_tile, fits]
        # FLAT 1-D scalar prefetch: SMEM pads the last dim of shaped
        # arrays to 128 lanes (a (bh, nqb, 2L) layout blew the 1 MB
        # SMEM budget at batch-4 encoder shapes).
        win = jnp.stack(win_cols, axis=-1).reshape(-1)  # (bh*nqb*2L,)
    # p-major within each query block (see _kernel): row k*qb + i is
    # point k of query i, so the kernel's point-sum is contiguous
    # sublane-block adds.
    meta = meta.reshape(bh, n_levels, 3, q_pad // qb, qb, n_points)
    meta = meta.transpose(0, 1, 2, 3, 5, 4)
    meta = meta.reshape(bh, n_levels * 3, qp_pad)

    max_wd = max(w for (_, w) in shapes) * hd
    # the fold matrix is exact (0/1) in any dtype; building it in the
    # value dtype lets the fold matmul run at bf16 MXU rates on chip.
    g = jnp.equal(
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 0) % hd,
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 1),
    ).astype(value.dtype)

    grid = (bh, nqb)
    in_specs = [
        pl.BlockSpec(
            (1, 3 * n_levels, qb * n_points),
            lambda i, j, mask: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (max_wd, hd), lambda i, j, mask: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for hp, w in shapes_pad:
        in_specs.append(
            pl.BlockSpec(
                (1, hp, w * hd),
                lambda i, j, mask: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, shapes=shapes_pad, qb=qb, p=n_points, hd=hd,
            th=th, win_tiles=win_tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, qb, hd), lambda i, j, win: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((qb * n_points, max_wd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, hd), jnp.float32),
        interpret=interpret,
    )(win, meta, g, *v_levels)

    out = out[:, :q].reshape(b, nh, q, hd).transpose(0, 2, 1, 3)
    return out.reshape(b, q, nh * hd).astype(value.dtype)

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
    rows is ONE matmul  W_y^T @ V  where W_y is built TRANSPOSED,
    (h, qp), as the bilinear TENT  relu(1 - |row - yf|)  (times the
    attention weight) — no floor/compare/select, no scatter, no meta
    transposes, and the dot contracts dim 0 of both operands (the
    MXU-natural K-on-sublanes form);
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
            win_tiles, ablate=""):
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

        # yf/aw are consumed as (1, qp) ROWS: the y-tent is built
        # TRANSPOSED, (rows, qp), so no meta transposes are needed for
        # them, and the y-matmul runs as lhs^T @ rhs (dim-0 contraction
        # on both operands — the MXU-natural K-on-sublanes form).
        # Measured (chained-iteration, v5e, 800 px encoder shape):
        # 8.2 -> 7.4 ms/call vs the (qp, rows)-tent + (qp, 1)-column
        # formulation this replaces (12 meta transposes per block).
        yf_r = meta_ref[0, 3 * lvl : 3 * lvl + 1, :]
        aw_r = meta_ref[0, 3 * lvl + 2 : 3 * lvl + 3, :]
        xf = jnp.transpose(
            meta_ref[0, 3 * lvl + 1 : 3 * lvl + 2, :], (1, 0)
        )  # (qp, 1): the x tent varies per ROW, transpose unavoidable

        v_dtype = refs[lvl].dtype

        def wy_t(base, rows):
            # bilinear tent, transposed: riota = base + [0, rows) on
            # SUBLANES (int32 iota + convert: Mosaic's iota is
            # integer-typed), carrying the attention weight (linear in
            # v, so it can ride the 32x-smaller y operand; in bf16
            # values the extra rounding is below the value dtype's own
            # epsilon).
            riota = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 0)
                + base
            ).astype(jnp.float32)
            return (
                jnp.maximum(0.0, 1.0 - jnp.abs(riota - yf_r)) * aw_r
            ).astype(v_dtype)

        def y_dot(wy_t_mat, v):
            # (rows, qp)^T @ (rows, wd) -> (qp, wd)
            return jax.lax.dot_general(
                wy_t_mat, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if ablate != "x_only":
            if h > ww:
                # win_ref carries the TILE index (start = tile * th):
                # the th-multiple form lets Mosaic statically prove the
                # dynamic sublane slice is tile-aligned.
                nl2 = 2 * len(shapes)
                base_i = (i * pl.num_programs(1) + j) * nl2 + 2 * lvl
                start = win_ref[base_i] * th
                fits = win_ref[base_i + 1]

                @pl.when(fits > 0)
                def _(start=start, lvl=lvl, wd=wd):
                    v = refs[lvl][0, pl.ds(start, ww), :]  # (ww, wd)
                    r_ref[:, :wd] = y_dot(wy_t(start, ww), v)

                @pl.when(fits == 0)
                def _(lvl=lvl, wd=wd, h=h):
                    v = refs[lvl][0, :, :]  # (h_pad, wd)
                    r_ref[:, :wd] = y_dot(wy_t(0, h), v)
            else:
                v = refs[lvl][0, :, :]
                r_ref[:, :wd] = y_dot(wy_t(0, h), v)

        if ablate == "y_only":
            # TIMING DIAGNOSTIC (wrong math): consume r so the y-dot is
            # not dead-code-eliminated, skip x-select/point-sum/fold.
            acc = acc + r_ref[0:qb, :hd]
            continue

        # -- x selection: bilinear tent over the lane-group index (the
        # attention weight already rode the y operand). Built per level:
        # a hoisted (qp, max_wd) iota sliced to wd crashes Mosaic's
        # vector layout pass when wd isn't a 128-lane multiple.
        if ablate == "no_mask":
            s = r_ref[:, :wd]  # TIMING DIAGNOSTIC: skip the x tent
        else:
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
        if ablate == "no_fold":
            acc = acc + sq[:, :hd]  # TIMING DIAGNOSTIC: skip the fold
            continue
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
    _ablate: str = "",
) -> jax.Array:
    """Drop-in twin of ops.deformable.multi_scale_deformable_attention
    -> (b, q, nh*hd).

    _ablate ('y_only' | 'no_mask' | 'no_fold'): TIMING DIAGNOSTIC ONLY
    — runs the kernel with a stage skipped (wrong math) so the per-
    stage cost decomposition can be measured by difference on chip
    (scripts/profile_deformable).

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
            th=th, win_tiles=win_tiles, ablate=_ablate,
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




# ---------------------------------------------------------------------------
# 2D-tiled windowed variant (encoder self-attention shapes, q == sum_hw)
# ---------------------------------------------------------------------------
#
# The full-width kernel above is PASS-bound, not FLOP-bound: each
# (64-query x 4-point) block's y-matmul pays 2 x ceil(w*hd/128) MXU
# column-tiles per level regardless of K, and the x-select then
# discards ~98% of those columns (profiled round 4: the GDINO encoder
# is 206.5 of the 252.7 ms batch-4 forward, and the encoder is entirely
# this kernel).  When q == sum_hw the queries are the raster grid
# itself and each query's reference point is its own location
# (grounding_dino._deformable_attention), so an 8x8 SPATIAL tile of
# queries samples a small (rows x cols) window of every level.
#
# This variant:
#   * permutes queries into 8x8 spatial tiles per level — as pure
#     reshape/pad/transpose (a gather formulation of the same
#     permutation cost 4.6 ms/call on chip, ~as much as the kernel);
#   * builds, per windowed level, an OVERLAPPED window tensor holding
#     every 2HB x 2WB-px window at HB/WB-aligned starts (pure
#     slice+concat, ~2-4x the map's HBM, a few MB), so ONE BlockSpec
#     whose index map reads [ty, tx] from scalar prefetch DMAs the
#     whole window per (block, level) — the paged-decode pattern, no
#     in-kernel dynamic slicing (which made the round-3 row-window
#     variant slower) and no 2x2 multi-stream DMA + copy (a 4-spec
#     variant of this kernel measured ~3x slower than the full-width
#     kernel even when every block fell back: per-step stream overhead
#     swamped the saved passes);
#   * windows y and x independently per level (y iff a 2HB window is a
#     real subset of hp, x iff a 2WB window is a real subset of w) —
#     at 800 px that is y+x for L0 and x-only for L1;
#   * blocks whose exact span does not fit (uniform/adversarial
#     locations, strongly magnified cross-level tiles: L2/L3-query
#     blocks on L0) take the resident full-map path via a predicated
#     branch, so the worst case is the full-width kernel and the
#     result is exact for ANY input.
#
# Geometry: HB=32, WB=16 -> spans <= HB+1 = 33 rows / 33 px are
# guaranteed to fit from an aligned start.  That covers same-level
# tiles with offsets up to +-12 px, the HF ring-bias init (+-4 px,
# what random-weight benches produce), and L1-queries-on-L0 (25 px
# spans).


def _tile2d_segments(shapes, ty: int, tx: int):
    """Per level (h, w) -> (hq, wq) tile-padded grid dims. The tiled
    query order is: levels in order, then (tile_row, tile_col, intra
    row, intra col) — realizable as reshape/transpose, no gather."""
    return [
        (-(-h // ty) * ty, -(-w // tx) * tx) for (h, w) in shapes
    ]


def _kernel2d(win_ref, meta_ref, g_ref, *refs, shapes, wcfg, qb, p, hd,
              HB, WB, nqb, force_fit=False):
    """Grid (bh, nqb). refs = [full_0..L-1, one window ref per
    windowed level, out, c_scratch, r_scratch].

    shapes: per level (h, hp, w, wpad).
    wcfg: per level None | 'x' | 'yx' — which dims are windowed.
    win_ref: flat int32 [ty, tx, fits] per (bh*nqb, windowed level);
    ty/tx are HB-row / WB-px block indices (the window BlockSpec index
    maps consume them in block units; the kernel multiplies out to
    coordinates, keeping every VMEM slice static).
    window refs: 'yx' -> (1, 2HB, 2*WB*hd) at rows [ty*HB, ty*HB+2HB),
    px [tx*WB, tx*WB+2WB); 'x' -> (1, hp, 2*WB*hd).
    c_scratch: (qb, hd) f32 — the branch-written per-level
    contribution (pl.when bodies cannot return into the outer trace).
    r_scratch: (qb*p, max wpad*hd) f32, as in the full-width kernel.
    """
    L = len(shapes)
    nwin = sum(1 for c in wcfg if c is not None)
    full_refs = refs[:L]
    win_refs = refs[L:L + nwin]
    out_ref = refs[L + nwin]
    c_ref, r_ref = refs[-2:]
    i, j = pl.program_id(0), pl.program_id(1)
    qp = qb * p
    wbd = WB * hd
    acc = jnp.zeros((qb, hd), jnp.float32)
    wi = 0
    for lvl, ((h, hp, w, wpad), cfg) in enumerate(zip(shapes, wcfg)):
        wd = wpad * hd

        # transposed tent + lhs^T@rhs dot, as in the full-width kernel
        yf_r = meta_ref[0, 3 * lvl : 3 * lvl + 1, :]
        aw_r = meta_ref[0, 3 * lvl + 2 : 3 * lvl + 3, :]
        xf = jnp.transpose(
            meta_ref[0, 3 * lvl + 1 : 3 * lvl + 2, :], (1, 0)
        )
        v_dtype = full_refs[lvl].dtype

        def wy_t(base, rows, yf_r=yf_r, aw_r=aw_r, v_dtype=v_dtype):
            riota = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 0) + base
            ).astype(jnp.float32)
            return (
                jnp.maximum(0.0, 1.0 - jnp.abs(riota - yf_r)) * aw_r
            ).astype(v_dtype)

        def y_dot(wy_t_mat, v):
            return jax.lax.dot_general(
                wy_t_mat, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def xsel_fold(r_cols, base_px, xf=xf):
            # x tent over the lane-group index + point sum + fold.
            cols = r_cols.shape[1]
            xg = (
                jax.lax.broadcasted_iota(jnp.int32, (qp, cols), 1) // hd
                + base_px
            ).astype(jnp.float32)
            s = r_cols * jnp.maximum(0.0, 1.0 - jnp.abs(xg - xf))
            sq = s[0:qb]
            for k in range(1, p):
                sq = sq + s[k * qb : (k + 1) * qb]
            return jnp.dot(
                sq.astype(g_ref.dtype), g_ref[:cols, :],
                preferred_element_type=jnp.float32,
            )

        def full_contrib(lvl=lvl, wd=wd, hp=hp, wy_t=wy_t,
                         y_dot=y_dot, xsel_fold=xsel_fold):
            v = full_refs[lvl][0]
            r_ref[:, :wd] = y_dot(wy_t(0, hp), v)
            return xsel_fold(r_ref[:, :wd], 0)

        if cfg is None:
            acc = acc + full_contrib()
        else:
            base_i = ((i * nqb + j) * nwin + wi) * 3
            ty = win_ref[base_i]
            tx = win_ref[base_i + 1]
            fits = win_ref[base_i + 2]
            vw = win_refs[wi]
            win_rows = 2 * HB if cfg == "yx" else hp
            ybase = ty * HB if cfg == "yx" else 0

            if force_fit:
                # TIMING DIAGNOSTIC ONLY (incorrect for straddling
                # blocks): windowed path unconditionally, no branch.
                r_ref[:, : 2 * wbd] = y_dot(wy_t(ybase, win_rows), vw[0])
                acc = acc + xsel_fold(r_ref[:, : 2 * wbd], tx * WB)
                wi += 1
                continue

            @pl.when(fits > 0)
            def _(vw=vw, ybase=ybase, tx=tx, win_rows=win_rows,
                  wy_t=wy_t, y_dot=y_dot, xsel_fold=xsel_fold):
                r_ref[:, : 2 * wbd] = y_dot(wy_t(ybase, win_rows), vw[0])
                c_ref[...] = xsel_fold(r_ref[:, : 2 * wbd], tx * WB)

            @pl.when(fits == 0)
            def _(full_contrib=full_contrib):
                c_ref[...] = full_contrib()

            acc = acc + c_ref[...]
            wi += 1
    out_ref[0] = acc


def _overlap_windows(v, h, hp, w, hd, HB, WB, cfg):
    """(bh, hp, w*hd) value map -> overlapped window tensor.

    'yx': (bh, (n_ty-1)*2HB, (n_tx-1)*2*WB*hd): row-block t, col-block
    u hold the window at rows [t*HB, t*HB+2HB), px [u*WB, u*WB+2WB).
    'x': (bh, hp, (n_tx-1)*2*WB*hd). Pure pad/slice/concat — the 2-4x
    memory is a few MB and lets ONE BlockSpec DMA a whole window."""
    bh = v.shape[0]
    wbd = WB * hd
    n_tx = -(-w // WB)
    if v.shape[2] < n_tx * wbd:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_tx * wbd - v.shape[2])))
    if cfg == "yx":
        n_ty = -(-h // HB)
        if v.shape[1] < n_ty * HB:
            v = jnp.pad(v, ((0, 0), (0, n_ty * HB - v.shape[1]), (0, 0)))
        strips = v.reshape(bh, n_ty, HB, n_tx * wbd)
        pairs = jnp.concatenate(
            [strips[:, :-1], strips[:, 1:]], axis=2
        )  # (bh, n_ty-1, 2HB, n_tx*wbd)
        rows = pairs.reshape(bh, (n_ty - 1), 2 * HB, n_tx, wbd)
    else:
        rows = v.reshape(bh, 1, v.shape[1], n_tx, wbd)
        n_ty = 2  # one row block
    xpairs = jnp.concatenate(
        [rows[:, :, :, :-1], rows[:, :, :, 1:]], axis=4
    )  # (bh, n_ty-1, rows, n_tx-1, 2wbd)
    r = xpairs.shape[2]
    return xpairs.reshape(bh, (n_ty - 1) * r, (n_tx - 1) * 2 * wbd)


def multi_scale_deformable_attention_pallas_2d(
    value: jax.Array,  # (b, sum_hw, nh, hd)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,  # (b, q, nh, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (b, q, nh, L, P)
    *,
    tile: Tuple[int, int] = (8, 8),
    row_block: int = 32,
    col_block_px: int = 16,
    row_tile: int = 16,
    interpret: bool = False,
    _force_fit: bool = False,
) -> jax.Array:
    """2D-tiled windowed twin of multi_scale_deformable_attention_pallas
    for encoder self-attention shapes (q == sum_hw). Exact for ANY
    inputs (non-fitting blocks fall back to the full-map path); fast
    when sample spans are local, the raster-query regime."""
    b, sum_hw, nh, hd = value.shape
    q = sampling_locations.shape[1]
    assert q == sum_hw, "2d variant requires encoder raster queries"
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]
    HB, WB = row_block, col_block_px
    th = row_tile
    tile_h, tile_w = tile
    qb = tile_h * tile_w
    shapes = tuple((int(h), int(w)) for (h, w) in spatial_shapes)
    bh = b * nh
    wbd = WB * hd

    # -- per-level config: window each dim iff a 2-block window is a
    # real subset (>= 3 blocks) of the padded map in that dim.
    wcfg = []
    shapes4 = []  # (h, hp, w, wpad)
    for h, w in shapes:
        hp = -(-h // th) * th
        wy = hp >= 3 * HB
        wx = w >= 3 * WB
        if wx:
            wpad = -(-w // WB) * WB
            wcfg.append("yx" if wy else "x")
        else:
            wpad = w
            wcfg.append(None)
        shapes4.append((h, hp, w, wpad))
    shapes4 = tuple(shapes4)
    nwin = sum(1 for c in wcfg if c is not None)
    grids = _tile2d_segments(shapes, tile_h, tile_w)
    q2d = sum(hq * wq for hq, wq in grids)
    nqb = q2d // qb
    qp = qb * n_points

    # -- value maps (bh, hp, wpad*hd); zero row/col padding (padded
    # cells hold zeros -> any tent weight on them contributes 0).
    v_levels, v_windows = [], []
    offset = 0
    for (h, hp, w, wpad), cfg in zip(shapes4, wcfg):
        v = value[:, offset : offset + h * w]
        v = v.reshape(b, h, w, nh, hd).transpose(0, 3, 1, 2, 4)
        if wpad != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, wpad - w), (0, 0)))
        v = v.reshape(bh, h, wpad * hd)
        if hp != h:
            v = jnp.pad(v, ((0, 0), (0, hp - h), (0, 0)))
        v_levels.append(v)
        if cfg is not None:
            v_windows.append(
                _overlap_windows(v, h, hp, w, hd, HB, WB, cfg)
            )
        offset += h * w

    # -- meta: (bh, L, 3, q, p) in raster order, then per-level
    # reshape/pad/transpose into 8x8-tile order (NO gather). Pads get
    # the -10 sentinel on every channel: tent(yf=-10) == 0 everywhere,
    # so the aw channel's value is irrelevant.
    locs = sampling_locations.astype(jnp.float32).transpose(
        0, 2, 3, 1, 4, 5
    ).reshape(bh, n_levels, q, n_points, 2)
    aw = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 3, 1, 4)
        .reshape(bh, n_levels, q, n_points)
    )
    wh = jnp.asarray([[w, h] for (h, w) in shapes], jnp.float32)
    xy = locs * wh[None, :, None, None, :] - 0.5
    xy = jnp.where(jnp.isfinite(xy), xy, -10.0)
    meta = jnp.stack([xy[..., 1], xy[..., 0], aw], axis=2)  # (bh,L,3,q,p)

    segs = []
    off_q = 0
    for (h, w), (hq, wq) in zip(shapes, grids):
        m = meta[:, :, :, off_q : off_q + h * w]
        m = m.reshape(bh, n_levels, 3, h, w, n_points)
        m = jnp.pad(
            m,
            ((0, 0), (0, 0), (0, 0), (0, hq - h), (0, wq - w), (0, 0)),
            constant_values=-10.0,
        )
        m = m.reshape(
            bh, n_levels, 3, hq // tile_h, tile_h, wq // tile_w, tile_w,
            n_points,
        )
        m = m.transpose(0, 1, 2, 3, 5, 4, 6, 7)
        segs.append(m.reshape(bh, n_levels, 3, hq * wq, n_points))
        off_q += h * w
    meta = jnp.concatenate(segs, axis=3)  # (bh, L, 3, q2d, p)

    # -- per-(bh, block, windowed level) [ty, tx, fits] scalar prefetch.
    y0 = jnp.floor(meta[:, :, 0]).reshape(bh, n_levels, nqb, qp)
    x0 = jnp.floor(meta[:, :, 1]).reshape(bh, n_levels, nqb, qp)
    big = jnp.float32(1e9)

    def window_1d(c0, extent, pad_extent, blk):
        """c0: (bh, nqb) floor coords per sample -> (start_block, fits).
        Samples below the -9 sentinel line contribute nothing (their
        two corner rows/cols lie outside the map), so excluding them
        from the span is exact; included OOB samples clamp to
        [0, extent-1], the only rows/cols that exist."""
        valid = c0 > -9.0
        cmin = jnp.min(jnp.where(valid, c0, big), axis=-1)
        cmax = jnp.max(jnp.where(valid, c0, -big), axis=-1)
        low = jnp.maximum(cmin, 0.0)
        high = jnp.minimum(cmax + 1.0, extent - 1.0)
        t = jnp.clip(
            jnp.floor(low / blk).astype(jnp.int32),
            0,
            max(pad_extent // blk - 2, 0),
        )
        fits = high < (t * blk + 2 * blk).astype(jnp.float32)
        return t, fits

    win_cols = []
    for lvl, ((h, hp, w, wpad), cfg) in enumerate(zip(shapes4, wcfg)):
        if cfg is None:
            continue
        tx, fx = window_1d(x0[:, lvl], w, wpad, WB)
        if cfg == "yx":
            ty, fy = window_1d(y0[:, lvl], h, -(-h // HB) * HB, HB)
            fits = fy & fx
        else:
            ty = jnp.zeros_like(tx)
            fits = fx
        win_cols += [ty, tx, fits.astype(jnp.int32)]
    if win_cols:
        # flat 1-D: see the full-width kernel's SMEM note.
        win = jnp.stack(win_cols, axis=-1).reshape(-1)
    else:
        win = jnp.zeros((1,), jnp.int32)

    # p-major within each query block (see the full-width kernel).
    meta = meta.reshape(bh, n_levels, 3, nqb, qb, n_points)
    meta = meta.transpose(0, 1, 2, 3, 5, 4)
    meta = meta.reshape(bh, n_levels * 3, nqb * qp)

    max_wd = max(wpad for (_, _, _, wpad) in shapes4) * hd
    g = jnp.equal(
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 0) % hd,
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 1),
    ).astype(value.dtype)

    in_specs = [
        pl.BlockSpec(
            (1, 3 * n_levels, qp), lambda i, j, win: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (max_wd, hd), lambda i, j, win: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for h, hp, w, wpad in shapes4:
        in_specs.append(
            pl.BlockSpec(
                (1, hp, wpad * hd), lambda i, j, win: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    wi = 0
    for lvl, ((h, hp, w, wpad), cfg) in enumerate(zip(shapes4, wcfg)):
        if cfg is None:
            continue

        def mk(wi=wi, yx=(cfg == "yx")):
            def index_map(i, j, win):
                base = ((i * nqb + j) * nwin + wi) * 3
                return (i, win[base] if yx else 0, win[base + 1])

            return index_map

        rows = 2 * HB if cfg == "yx" else hp
        in_specs.append(
            pl.BlockSpec(
                (1, rows, 2 * wbd), mk(), memory_space=pltpu.VMEM,
            )
        )
        wi += 1

    out = pl.pallas_call(
        functools.partial(
            _kernel2d, shapes=shapes4, wcfg=tuple(wcfg), qb=qb,
            p=n_points, hd=hd, HB=HB, WB=WB, nqb=nqb,
            force_fit=bool(_force_fit),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nqb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, qb, hd), lambda i, j, win: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((qb, hd), jnp.float32),
                pltpu.VMEM((qp, max_wd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q2d, hd), jnp.float32),
        interpret=interpret,
    )(win, meta, g, *v_levels, *v_windows)

    # -- inverse permutation: per-level reshape/slice (no gather).
    outs = []
    off2 = 0
    for (h, w), (hq, wq) in zip(shapes, grids):
        o = out[:, off2 : off2 + hq * wq]
        o = o.reshape(bh, hq // tile_h, wq // tile_w, tile_h, tile_w, hd)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(bh, hq, wq, hd)
        outs.append(o[:, :h, :w].reshape(bh, h * w, hd))
        off2 += hq * wq
    out = jnp.concatenate(outs, axis=1)  # (bh, q, hd)
    out = out.reshape(b, nh, q, hd).transpose(0, 2, 1, 3)
    return out.reshape(b, q, nh * hd).astype(value.dtype)

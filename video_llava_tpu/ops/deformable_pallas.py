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
    carrying (1-dy, dy) — built with an iota compare, no scatter;
  * the x-selection multiplies the interpolated rows (qp, w*d) by a
    2-hot lane mask ((iota//d == x0)*(1-dx) + (iota//d == x0+1)*dx) and
    folds w*d -> d with a constant binary matrix G[x*d+j, j] = 1 — a
    second matmul, so the whole op runs at MXU rates;
  * out-of-map corners match no iota column and contribute exactly 0,
    reproducing grid_sample's zero padding without clip/select logic;
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


def _kernel(meta_ref, g_ref, *refs, shapes, qb, p, hd):
    """Grid (bh, nqb). refs = [v_0..v_{L-1}, out].

    meta_ref: (1, 5*L, p*qb) f32 rows [y0, dy, x0, dx, aw] per level,
        P-MAJOR within the block (row k*qb + i is point k of query i).
    g_ref: (max_wd, hd) fold matrix, G[x*hd + j, j] = 1.
    v_l: (1, h_l, w_l*hd) value map for this bh.
    out: (1, qb, hd) f32.
    """
    out_ref = refs[-1]
    qp = qb * p
    acc = jnp.zeros((qb, hd), jnp.float32)
    for lvl, (h, w) in enumerate(shapes):
        wd = w * hd

        def col(j):
            # (1, qp) meta row -> (qp, 1) column vector.
            return jnp.transpose(
                meta_ref[0, 5 * lvl + j : 5 * lvl + j + 1, :], (1, 0)
            )

        y0, dy, x0, dx, aw = (col(j) for j in range(5))

        # -- y interpolation: 2-hot rows x value map, one MXU dot.
        # (int32 iota + convert: Mosaic's iota is integer-typed.)
        riota = jax.lax.broadcasted_iota(jnp.int32, (qp, h), 1).astype(
            jnp.float32
        )
        wy = jnp.where(riota == y0, 1.0 - dy, 0.0) + jnp.where(
            riota == y0 + 1.0, dy, 0.0
        )
        v = refs[lvl][0]  # (h, wd)
        r = jnp.dot(
            wy.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (qp, wd) f32

        # -- x selection: 2-hot lane mask (iota//hd pattern), then fold
        # w*hd -> hd with the constant G matmul.
        xiota = (
            jax.lax.broadcasted_iota(jnp.int32, (qp, wd), 1) // hd
        ).astype(jnp.float32)
        mx = jnp.where(xiota == x0, 1.0 - dx, 0.0) + jnp.where(
            xiota == x0 + 1.0, dx, 0.0
        )
        # attention weight stays on the f32 mask (folding it into the
        # bf16-cast wy costs ~bf16 epsilon of accuracy).
        s = r * (mx * aw)
        # -- sum over points BEFORE the fold (both linear): p-major row
        # order makes this p-1 contiguous sublane-block adds, and the
        # fold matmul — whose N=hd pads to a full 128-lane MXU tile —
        # then runs on qb rows instead of qb*p.
        sq = s[0:qb]
        for k in range(1, p):
            sq = sq + s[k * qb : (k + 1) * qb]
        acc = acc + jnp.dot(
            sq, g_ref[:wd, :], preferred_element_type=jnp.float32
        )  # (qb, hd)
    out_ref[0] = acc


def multi_scale_deformable_attention_pallas(
    value: jax.Array,  # (b, sum_hw, nh, hd)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,  # (b, q, nh, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (b, q, nh, L, P)
    *,
    query_block: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in twin of ops.deformable.multi_scale_deformable_attention
    -> (b, q, nh*hd).

    query_block: queries per grid step. 64 (default) measures fastest
    within comfortable VMEM at 800 px; 128 is marginally faster but
    sits at the ~16 MB scoped-VMEM edge for large level-0 maps."""
    b, sum_hw, nh, hd = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]
    shapes = tuple((int(h), int(w)) for (h, w) in spatial_shapes)
    bh = b * nh

    qb = min(query_block, max(8, q))
    q_pad = -(-q // qb) * qb
    qp_pad = q_pad * n_points

    # -- per-level value maps, (bh, h, w*hd), head-major.
    v_levels = []
    offset = 0
    for h, w in shapes:
        v = value[:, offset : offset + h * w]  # (b, hw, nh, hd)
        v = v.reshape(b, h, w, nh, hd).transpose(0, 3, 1, 2, 4)
        v_levels.append(v.reshape(bh, h, w * hd))
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
    x0 = jnp.floor(xy[..., 0])
    y0 = jnp.floor(xy[..., 1])
    dx = xy[..., 0] - x0
    dy = xy[..., 1] - y0
    meta = jnp.stack([y0, dy, x0, dx, aw], axis=2)  # (bh, L, 5, q, p)
    if q_pad != q:
        # pad queries: y0 = -10 matches no row -> zero contribution.
        pad = jnp.zeros(
            (bh, n_levels, 5, q_pad - q, n_points), jnp.float32
        ).at[:, :, 0].set(-10.0)
        meta = jnp.concatenate([meta, pad], axis=3)
    # p-major within each query block (see _kernel): row k*qb + i is
    # point k of query i, so the kernel's point-sum is contiguous
    # sublane-block adds.
    meta = meta.reshape(bh, n_levels, 5, q_pad // qb, qb, n_points)
    meta = meta.transpose(0, 1, 2, 3, 5, 4)
    meta = meta.reshape(bh, n_levels * 5, qp_pad)

    max_wd = max(w for (_, w) in shapes) * hd
    g = jnp.equal(
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 0) % hd,
        jax.lax.broadcasted_iota(jnp.int32, (max_wd, hd), 1),
    ).astype(jnp.float32)

    nqb = q_pad // qb
    grid = (bh, nqb)
    in_specs = [
        pl.BlockSpec(
            (1, 5 * n_levels, qb * n_points),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (max_wd, hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    for h, w in shapes:
        in_specs.append(
            pl.BlockSpec(
                (1, h, w * hd),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, shapes=shapes, qb=qb, p=n_points, hd=hd
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, qb, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, hd), jnp.float32),
        interpret=interpret,
    )(meta, g, *v_levels)

    out = out[:, :q].reshape(b, nh, q, hd).transpose(0, 2, 1, 3)
    return out.reshape(b, q, nh * hd).astype(value.dtype)

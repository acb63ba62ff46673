"""Parity of the Pallas multi-scale deformable attention kernel
(ops/deformable_pallas.py, interpret mode on CPU) against the XLA
gather formulation it replaces on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_llava_tpu.ops.deformable import (
    multi_scale_deformable_attention as msda_xla,
)
from video_llava_tpu.ops.deformable_pallas import (
    multi_scale_deformable_attention_pallas as msda_pallas,
)


def _case(rng, shapes, q, b, nh=4, hd=32, P=4, dtype=jnp.float32):
    L = len(shapes)
    sum_hw = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, sum_hw, nh, hd)), dtype
    )
    # Locations straddle the map edges to exercise the zero-padding
    # semantics (grid_sample padding_mode='zeros').
    locs = jnp.asarray(
        rng.uniform(-0.3, 1.3, (b, q, nh, L, P, 2)), jnp.float32
    )
    weights = jnp.asarray(
        rng.uniform(0, 1, (b, q, nh, L, P)), jnp.float32
    )
    return value, locs, weights


@pytest.mark.parametrize(
    "shapes,q,b",
    [
        (((12, 12), (6, 6), (3, 3)), 50, 2),  # odd q: padding path
        (((10, 14), (5, 7)), 33, 1),  # non-square, non-aligned
        (((8, 8),), 16, 1),
    ],
)
def test_pallas_matches_xla(shapes, q, b):
    rng = np.random.default_rng(0)
    value, locs, weights = _case(rng, shapes, q, b)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_pallas(
        value, shapes, locs, weights, interpret=True, query_block=16
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_pallas_bf16_value():
    """bf16 maps (detector checkpoints): PTQ-level tolerance — the
    tent*attention-weight products round to the value dtype before the
    MXU dots."""
    rng = np.random.default_rng(1)
    shapes = ((9, 9), (4, 4))
    value, locs, weights = _case(rng, shapes, 21, 1, dtype=jnp.bfloat16)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_pallas(
        value, shapes, locs, weights, interpret=True, query_block=8
    )
    np.testing.assert_allclose(
        np.asarray(ref, np.float32),
        np.asarray(out, np.float32),
        atol=3e-2,
        rtol=3e-2,
    )


def test_decoder_shape_900_queries():
    """The GroundingDINO decoder's 900-query cross-attention shape
    (reference MSDeformAttn usage, grounding_new_api.py:288)."""
    rng = np.random.default_rng(2)
    shapes = ((16, 16), (8, 8), (4, 4), (2, 2))
    value, locs, weights = _case(rng, shapes, 900, 1, nh=8)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_pallas(
        value, shapes, locs, weights, interpret=True, query_block=64
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_row_window_branch_local_offsets():
    """Maps tall enough to exercise the dynamic row-WINDOW branch
    (h > win_tiles*row_tile): raster-ordered queries with small local
    offsets — every block's y-span fits the window, the typical
    encoder self-attention regime."""
    rng = np.random.default_rng(3)
    shapes = ((48, 20), (40, 10))
    L = len(shapes)
    nh, hd, P = 2, 32, 4
    sum_hw = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((1, sum_hw, nh, hd)), jnp.float32
    )
    # reference grid of level 0, like the encoder's raster queries
    h0, w0 = shapes[0]
    q = h0 * w0
    ys = (np.arange(h0) + 0.5) / h0
    xs = (np.arange(w0) + 0.5) / w0
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    ref_pts = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (q, 2)
    offs = rng.uniform(-0.02, 0.02, (q, nh, L, P, 2))
    locs = jnp.asarray(
        (ref_pts[:, None, None, None] + offs)[None], jnp.float32
    )
    weights = jnp.asarray(rng.uniform(0, 1, (1, q, nh, L, P)), jnp.float32)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_pallas(
        value, shapes, locs, weights, interpret=True, query_block=32,
        win_tiles=2,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_row_window_fallback_mixed_spans():
    """Some blocks fit the window, some (wild offsets) take the
    full-height fallback — both branches in one call, plus edge
    straddlers (samples outside the map)."""
    rng = np.random.default_rng(4)
    shapes = ((64, 12),)
    nh, hd, P = 2, 32, 2
    value = jnp.asarray(
        rng.standard_normal((1, 64 * 12, nh, hd)), jnp.float32
    )
    q = 96
    locs_local = rng.uniform(0.4, 0.45, (q // 2, nh, 1, P, 2))
    locs_wild = rng.uniform(-0.3, 1.3, (q // 2, nh, 1, P, 2))
    locs = jnp.asarray(
        np.concatenate([locs_local, locs_wild])[None], jnp.float32
    )
    weights = jnp.asarray(rng.uniform(0, 1, (1, q, nh, 1, P)), jnp.float32)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_pallas(
        value, shapes, locs, weights, interpret=True, query_block=48,
        win_tiles=2,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_nonfinite_locations_contribute_zero():
    """NaN/Inf sampling coords (degenerate inputs) sanitize to the
    padding sentinel: zero contribution, never NaN in the output."""
    rng = np.random.default_rng(3)
    shapes = ((8, 8),)
    value, locs, weights = _case(rng, shapes, 16, 1)
    bad = np.array(locs, copy=True)
    bad[0, :4, :, :, :2, 0] = np.nan
    bad[0, 4:8, :, :, :2, 1] = np.inf
    # finite twin with the bad points fully out of bounds (same
    # semantics: those points contribute zero)
    fin = np.array(locs, copy=True)
    fin[0, :4, :, :, :2, 0] = -5.0
    fin[0, 4:8, :, :, :2, 1] = -5.0
    out_bad = msda_pallas(
        value, shapes, jnp.asarray(bad), weights, interpret=True,
        query_block=8,
    )
    out_fin = msda_pallas(
        value, shapes, jnp.asarray(fin), weights, interpret=True,
        query_block=8,
    )
    assert np.isfinite(np.asarray(out_bad)).all()
    np.testing.assert_allclose(
        np.asarray(out_bad), np.asarray(out_fin), atol=1e-5, rtol=1e-5
    )


# ---- 2D-tiled windowed variant (encoder raster queries) -------------------

from video_llava_tpu.ops.deformable_pallas import (  # noqa: E402
    multi_scale_deformable_attention_pallas_2d as msda_2d,
)


def _encoder_case(rng, shapes, nh=2, hd=32, P=4, off_scale=0.02,
                  dtype=jnp.float32):
    """Raster queries over all levels with per-query reference points
    at their own grid location (the grounding_dino encoder regime,
    models/grounding_dino.py _deformable_attention)."""
    L = len(shapes)
    sum_hw = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.standard_normal((1, sum_hw, nh, hd)), dtype)
    pts = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref_pts = np.concatenate(pts)  # (q, 2) normalized (x, y)
    q = sum_hw
    offs = rng.uniform(-off_scale, off_scale, (q, nh, L, P, 2))
    locs = jnp.asarray((ref_pts[:, None, None, None] + offs)[None],
                       jnp.float32)
    weights = jnp.asarray(rng.uniform(0, 1, (1, q, nh, L, P)),
                          jnp.float32)
    return value, locs, weights


def test_tile2d_local_offsets_windowed():
    """Local offsets: L0/L1 blocks take the DMA'd window path; parity
    vs the XLA gather formulation. Shapes force y+x windowing on the
    first two levels (>= 3 blocks each way) and the full path on the
    small tail levels."""
    rng = np.random.default_rng(10)
    shapes = ((50, 50), (25, 25), (13, 13))
    value, locs, weights = _encoder_case(rng, shapes)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_tile2d_tall_map_yx_window():
    """h >= 3*row_block: the first level takes the 'yx' (row+col
    window) config — the L0 regime at 800 px. Offsets span the ring
    scale; some blocks straddle and fall back."""
    rng = np.random.default_rng(16)
    shapes = ((100, 50), (25, 13))
    value, locs, weights = _encoder_case(rng, shapes, off_scale=0.04)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_tile2d_wild_offsets_fallback():
    """Uniform [-0.3, 1.3] locations (parity-harness regime): spans
    cover the whole map, every block falls back to the resident
    full-map path — exactness must not depend on locality."""
    rng = np.random.default_rng(11)
    shapes = ((50, 50), (25, 25))
    sum_hw = sum(h * w for h, w in shapes)
    value, locs, weights = _case(rng, shapes, sum_hw, 1, nh=2)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_tile2d_mixed_fit_and_fallback():
    """Half the queries local (windowed), half wild (fallback) — both
    kernel branches exercised in one call, including blocks straddling
    the window grid."""
    rng = np.random.default_rng(12)
    shapes = ((48, 48), (24, 24))
    value, locs, weights = _encoder_case(rng, shapes)
    wild = rng.uniform(-0.3, 1.3, np.asarray(locs).shape)
    mixed = np.asarray(locs).copy()
    mixed[0, ::3] = wild[0, ::3]  # every 3rd query wild
    locs = jnp.asarray(mixed)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_tile2d_bf16_value():
    rng = np.random.default_rng(13)
    shapes = ((50, 50), (25, 25))
    value, locs, weights = _encoder_case(rng, shapes, dtype=jnp.bfloat16)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_tile2d_nonsquare_ragged_tiles():
    """Non-square maps whose dims are not tile multiples: per-level
    pad queries carry the sentinel and must contribute nothing."""
    rng = np.random.default_rng(14)
    shapes = ((50, 34), (21, 10))
    value, locs, weights = _encoder_case(rng, shapes, off_scale=0.05)
    ref = msda_xla(value, shapes, locs, weights)
    out = msda_2d(value, shapes, locs, weights, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )


def test_tile2d_dispatch_encoder_only():
    """The 2d variant asserts on decoder shapes (q != sum_hw — its
    tiling presumes raster queries); the dispatch default keeps the
    full-width kernel (the 2d variant measured slower on chip, see
    ops/deformable.py)."""
    from video_llava_tpu.ops import deformable

    assert not deformable._TILE2D
    rng = np.random.default_rng(15)
    shapes = ((16, 16), (8, 8))
    value, locs, weights = _case(rng, shapes, 40, 1, nh=2)
    # decoder shape: must not assert, must match xla
    out = msda_pallas(value, shapes, locs, weights, interpret=True)
    ref = msda_xla(value, shapes, locs, weights)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4
    )
    with pytest.raises(AssertionError):
        msda_2d(value, shapes, locs, weights, interpret=True)

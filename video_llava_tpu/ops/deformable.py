"""Multi-scale deformable attention (Deformable DETR / GroundingDINO).

The reference depends on GroundingDINO's CUDA MSDeformAttn kernel
(grounding_evaluation/grounding_new_api.py:25,288 via the groundingdino
package). TPU formulation: the op is, per (query, head, level, point),
a bilinear sample of the value feature map — four gathers and a lerp —
followed by an attention-weighted sum. Gathers vectorize cleanly on the
VPU; everything is static-shape.

Semantics match torch's grid_sample(align_corners=False, padding=zeros)
composition used by the original kernel and by HF's
`multi_scale_deformable_attention` (transformers
models/grounding_dino/modeling_grounding_dino.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# 'auto' selects the Pallas matmul kernel (ops/deformable_pallas.py) on
# TPU and the XLA gather formulation elsewhere. On-chip validation
# (scripts/validate_tpu_kernels.py, v5e, round 4 transposed-tent form):
# cos 0.99998 vs the XLA twin at the GroundingDINO 800px encoder shape,
# 5.4-7.4 ms vs ~60 ms (~10x; chained-iteration timing 7.4).
# Force either path per-process with set_default_impl('xla'|'pallas').
_DEFAULT_IMPL = "auto"

# set_tile2d(True) routes encoder self-attention shapes (q == sum_hw:
# the queries are the raster grid) to the 2D-tiled windowed kernel
# (deformable_pallas.multi_scale_deformable_attention_pallas_2d). It
# is OFF by default: despite ~2x fewer MXU passes and x-select lanes
# in the windowed path, it measured SLOWER than the full-width kernel
# on chip (chained-iteration, 800 px encoder, local offsets: 14.4 vs
# 8.2 ms/call) — ablation shows the full kernel's floor is scratch
# read/point-sum traffic plus per-block fixed work, which windowing
# does not shrink, while the overlap-tensor build, tile padding and
# window DMA streams add real cost. Kept for shapes/backends where the
# trade may flip; parity-tested either way.
_TILE2D = False


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "pallas")
    _DEFAULT_IMPL = impl


def set_tile2d(enabled: bool) -> None:
    global _TILE2D
    _TILE2D = bool(enabled)


def _bilinear_sample_level(
    value: jax.Array,  # (b, h, w, heads, d)
    loc: jax.Array,  # (b, q, heads, points, 2) in [0, 1] (x, y)
) -> jax.Array:
    """Zero-padded bilinear sampling -> (b, q, heads, points, d)."""
    b, h, w, nh, d = value.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = value.reshape(b, h * w, nh, d)
        idx = yc * w + xc  # (b, q, heads, points)
        # take_along_axis over the flattened spatial dim, per head.
        idx_e = idx.transpose(0, 2, 1, 3).reshape(b, nh, -1)  # (b, nh, q*p)
        v = flat.transpose(0, 2, 1, 3)  # (b, nh, hw, d)
        out = jnp.take_along_axis(v, idx_e[..., None], axis=2)
        q, p = loc.shape[1], loc.shape[3]
        out = out.reshape(b, nh, q, p, d).transpose(0, 2, 1, 3, 4)
        return out * inside[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def multi_scale_deformable_attention(
    value: jax.Array,  # (b, sum_hw, heads, d)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w), ...]
    sampling_locations: jax.Array,  # (b, q, heads, levels, points, 2) in [0,1]
    attention_weights: jax.Array,  # (b, q, heads, levels, points)
) -> jax.Array:
    """-> (b, q, heads * d)."""
    impl = _DEFAULT_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from video_llava_tpu.ops.deformable_pallas import (
            multi_scale_deformable_attention_pallas,
            multi_scale_deformable_attention_pallas_2d,
        )

        if _TILE2D and sampling_locations.shape[1] == value.shape[1]:
            return multi_scale_deformable_attention_pallas_2d(
                value, spatial_shapes, sampling_locations,
                attention_weights,
            )
        return multi_scale_deformable_attention_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    b, _, nh, d = value.shape
    q = sampling_locations.shape[1]
    out = jnp.zeros((b, q, nh, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset : offset + h * w].reshape(b, h, w, nh, d)
        sampled = _bilinear_sample_level(
            v, sampling_locations[:, :, :, lvl]
        )  # (b, q, nh, p, d)
        out = out + jnp.sum(
            sampled.astype(jnp.float32)
            * attention_weights[:, :, :, lvl, :, None].astype(jnp.float32),
            axis=3,
        )
        offset += h * w
    return out.reshape(b, q, nh * d).astype(value.dtype)

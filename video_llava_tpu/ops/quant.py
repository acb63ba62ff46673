"""Weights-only int8 quantization for the decode path.

Single-chip autoregressive decode is HBM-bandwidth bound (each step
streams every weight once): int8 weights halve the bytes per step and
roughly double tokens/sec. Quantization is symmetric per-output-channel
(absmax / 127); matmuls dequantize on the fly — XLA fuses the
convert+scale into the MXU feed.

Applies to any params pytree built from models/layers.py conventions:
2D 'kernel' leaves and embedding tables become {'qvalues': int8,
'scales': f32}; layers.linear dispatches on the quantized layout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def quantize_tensor(w: jax.Array, axis: int = 0):
    """Symmetric per-channel int8: scales over `axis` (the contraction
    axis is reduced; scales broadcast over the kept axes)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scales = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127)
    return q.astype(jnp.int8), scales.astype(jnp.float32)


def dequantize(q: jax.Array, scales: jax.Array, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scales).astype(dtype)


def quantize_rows_int8(x: jax.Array):
    """Per-row symmetric int8 activations: (..., K) -> (int8 values,
    f32 (..., 1) scales). THE canonical activation-quantize snippet —
    rounds to nearest-EVEN because jnp.round's half-away-from-zero
    tie-break makes XLA compile the fusion for ~6 MINUTES and run 5x
    slower (measured); ties are noise for quantization."""
    sx = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True),
        1e-8,
    ) / 127.0
    xq = jnp.clip(
        jax.lax.round(
            x.astype(jnp.float32) / sx,
            jax.lax.RoundingMethod.TO_NEAREST_EVEN,
        ),
        -127, 127,
    ).astype(jnp.int8)
    return xq, sx


def quantized_matmul(x: jax.Array, qvalues: jax.Array, scales: jax.Array):
    """x: (..., in); qvalues: (in, out) int8; scales: (1, out)."""
    y = jnp.dot(
        x, qvalues.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y * scales.astype(jnp.float32)[0]).astype(x.dtype)


def quantized_matmul_a8(x: jax.Array, qvalues: jax.Array, scales: jax.Array):
    """W8A8: per-token (row) symmetric int8 activations x per-channel
    int8 weights, accumulated in int32 on the MXU — 2x the bf16 MXU
    rate, the lever for compute-bound encoders (CLIP ViT runs ~91% of
    the bf16 roofline, so weights-only int8 buys nothing there).

    x: (..., in) -> (..., out), rescaled to x.dtype. One extra rounding
    vs weights-only int8 (per-row absmax); accuracy cost on ViT
    encoders is the standard PTQ-int8 regime."""
    xq, sx = quantize_rows_int8(x)
    y = jnp.dot(xq, qvalues, preferred_element_type=jnp.int32)
    return (
        y.astype(jnp.float32) * sx * scales.astype(jnp.float32)[0]
    ).astype(x.dtype)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "qvalues" in p


def quantize_params(
    params,
    min_size: int = 1 << 16,
    skip_keys: Sequence[str] = ("class_embedding", "position_embedding"),
    a8: bool = False,
):
    """Quantize every 2D kernel / embedding table leaf >= min_size
    elements. Norms, biases and small tensors stay as-is.

    a8=True stores kernels under 'qvalues_a8': layers.linear then runs
    the W8A8 int8-MXU matmul (quantized_matmul_a8) instead of the
    weights-only dequant form — the right mode for compute-bound
    encoders (CLIP); decode stays weights-only (activation quantize
    per step buys nothing when the matmul is HBM-bound). Embedding
    tables keep the gather layout either way."""

    def visit(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        name = keys[-1] if keys else ""
        if leaf.ndim < 2 or leaf.size < min_size:
            return leaf
        if any(k in "/".join(keys) for k in skip_keys):
            return leaf
        if name == "kernel":
            # contraction axis: -2 (supports stacked (L, in, out) kernels)
            q, s = quantize_tensor(leaf, axis=-2)
            if a8:
                return {"qvalues_a8": q, "scales": s}
            return {"qvalues": q, "scales": s}
        if name == "weight" and leaf.ndim == 2:  # embedding table
            q, s = quantize_tensor(leaf, axis=1)  # per-row scales
            return {"qvalues": q, "scales": s}
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)

"""Shared neural-net building blocks, pure-functional style.

Parameters are plain nested dicts of jnp arrays (pytrees) so sharding
specs, checkpointing and weight conversion stay trivial. Convention:
kernels are stored (in_dim, out_dim) — i.e. already transposed from
torch's (out, in) — so applies are single `x @ W` matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_PARAM_DTYPE = jnp.float32


# -- linear -----------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=DEFAULT_PARAM_DTYPE, scale: Optional[float] = None):
    scale = scale if scale is not None else in_dim**-0.5
    p = {"kernel": jax.random.normal(key, (in_dim, out_dim), dtype) * scale}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p, x):
    kernel = p["kernel"]
    if isinstance(kernel, dict) and "stacked_packed" in kernel:
        # int4 kernel kept scan-stacked (L, Dh, F) with a traced layer
        # index — see llama.split_stacked_int4: scan-slicing a packed
        # weight into a pallas_call makes XLA materialize the slice as
        # a per-token copy; the stacked kernel indexes the layer block
        # via scalar prefetch instead (zero-copy).
        from video_llava_tpu.ops.quant4 import int4_matmul_stacked

        y = int4_matmul_stacked(
            x, kernel["stacked_packed"], kernel["stacked_scales"],
            kernel["layer"],
        )
    elif isinstance(kernel, dict) and "qvalues_packed" in kernel:  # int4
        from video_llava_tpu.ops.quant4 import int4_matmul

        y = int4_matmul(x, kernel["qvalues_packed"], kernel["scales"])
    elif isinstance(kernel, dict) and "qvalues_a8" in kernel:  # W8A8
        from video_llava_tpu.ops.quant import quantized_matmul_a8

        y = quantized_matmul_a8(
            x, kernel["qvalues_a8"], kernel["scales"]
        ).astype(jnp.float32)
    elif isinstance(kernel, dict) and "qvalues" in kernel:  # int8 weights
        from video_llava_tpu.ops.quant import quantized_matmul

        y = quantized_matmul(x, kernel["qvalues"], kernel["scales"]).astype(
            jnp.float32
        )
    else:
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# -- norms ------------------------------------------------------------------


def layer_norm_init(dim: int, dtype=DEFAULT_PARAM_DTYPE):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def rms_norm_init(dim: int, dtype=DEFAULT_PARAM_DTYPE):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


# -- activations ------------------------------------------------------------


def quick_gelu(x):
    """OpenAI CLIP's gelu approximation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": jax.nn.gelu,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


# -- embeddings -------------------------------------------------------------


def embedding_init(key, vocab: int, dim: int, dtype=DEFAULT_PARAM_DTYPE):
    return {"weight": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def embed(p, ids):
    w = p["weight"]
    if isinstance(w, dict) and "qvalues" in w:  # int8 table
        rows = jnp.take(w["qvalues"], ids, axis=0).astype(jnp.float32)
        scales = jnp.take(w["scales"], ids, axis=0)
        return (rows * scales).astype(jnp.bfloat16)
    return jnp.take(w, ids, axis=0)


# -- rotary position embedding (LLaMA) ---------------------------------------


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 10000.0):
    """positions: (..., s) int32 -> cos/sin of shape (..., s, head_dim//2),
    fp32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (b, s, h, d); cos/sin: (b, s, d//2) or (s, d//2).

    Uses the LLaMA "rotate_half" convention: pairs are (x[i], x[i+d/2]).
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [x1f * cos - x2f * sin, x2f * cos + x1f * sin], axis=-1
    )
    return out.astype(x.dtype)

"""Spatio-temporal feature pooling.

Semantics (parity with reference video_chatgpt/inference.py:13-44 and
scripts/save_spatio_temporal_clip_features.py:46-57):

    features: (t, s, c) per-frame CLIP patch features
    temporal_tokens = mean over s           -> (t, c), zero-padded to (100, c)
    spatial_tokens  = mean over t           -> (s, c)
    output          = concat([temporal, spatial], axis=0)  # (100 + s, c)

The jnp version is the canonical implementation (XLA fuses it into the
surrounding program); the Pallas version fuses both reductions into a
single pass over the feature tensor in VMEM and is used on TPU where
the pooled output feeds the projector directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_llava_tpu.constants import MAX_TEMPORAL_TOKENS

# Mesh registered by the engine (runtime/model_init.py) so encode_video
# can keep the fused kernel under multi-chip meshes via the shard_map
# wrapper instead of silently dropping to the XLA path.
_GLOBAL_MESH = None


def set_pooling_mesh(mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_pooling_mesh():
    return _GLOBAL_MESH


def spatio_temporal_pool(
    features: jax.Array,
    num_valid_frames: Optional[jax.Array] = None,
    max_temporal_tokens: int = MAX_TEMPORAL_TOKENS,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Pool (t, s, c) or batched (b, t, s, c) features.

    When `num_valid_frames` is given (traced int32 scalar or (b,)),
    rows >= n are treated as padding: they are excluded from the
    spatial mean and zeroed in the temporal tokens, matching the
    reference's variable-length behavior (inference.py:31-36) under a
    static t = max_temporal_tokens.
    """
    if features.ndim == 4:
        fn = functools.partial(
            spatio_temporal_pool,
            max_temporal_tokens=max_temporal_tokens,
            out_dtype=out_dtype,
        )
        return jax.vmap(fn)(features, num_valid_frames)

    t, s, c = features.shape
    if t > max_temporal_tokens:
        raise ValueError(f"t={t} exceeds max_temporal_tokens={max_temporal_tokens}")
    x = features.astype(jnp.float32)

    if num_valid_frames is None:
        temporal = jnp.mean(x, axis=1)  # (t, c)
        spatial = jnp.mean(x, axis=0)  # (s, c)
    else:
        n = jnp.asarray(num_valid_frames, jnp.int32)
        frame_mask = (jnp.arange(t, dtype=jnp.int32) < n)[:, None]  # (t, 1)
        temporal = jnp.mean(x, axis=1) * frame_mask  # padded rows -> 0
        spatial = jnp.sum(x * frame_mask[:, :, None], axis=0) / jnp.maximum(
            n.astype(jnp.float32), 1.0
        )

    pad = max_temporal_tokens - t
    if pad > 0:
        temporal = jnp.pad(temporal, ((0, pad), (0, 0)))
    return jnp.concatenate([temporal, spatial], axis=0).astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _pool_kernel(n_ref, x_ref, temporal_ref, spatial_ref, acc_ref):
    """Grid = (c_blocks, s_blocks); s is the inner (fastest) dimension so
    the temporal accumulator for a c-block stays live in VMEM across all
    of its s-blocks.

    n_ref: (2,) int32 [n_mask, n_denom] — rows >= n_mask are padding;
    the spatial mean divides by n_denom. They differ only under the
    sharded wrapper, where n_mask counts THIS shard's valid rows but the
    mean is over the global count (partial sums psum'd outside)."""
    j = pl.program_id(1)
    n_s_blocks = pl.num_programs(1)
    t = x_ref.shape[0]
    s_total = n_s_blocks * x_ref.shape[1]

    x = x_ref[:].astype(jnp.float32)  # (t, BS, BC)

    n = n_ref[0]
    frame_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) < n
    ).astype(jnp.float32)

    # Spatial tokens: mean over valid frames, written once per (s, c) block.
    denom = jnp.maximum(n_ref[1].astype(jnp.float32), 1.0)
    spatial_ref[:] = (
        jnp.sum(x * frame_mask[:, :, None], axis=0) / denom
    ).astype(spatial_ref.dtype)

    # Temporal tokens: accumulate sum over s-blocks in fp32 scratch.
    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.sum(x, axis=1)  # (t, BC)

    @pl.when(j == n_s_blocks - 1)
    def _():
        mean_t = acc_ref[:] / float(s_total) * frame_mask
        t_pad = temporal_ref.shape[0]
        if t_pad > t:  # static pad to max_temporal_tokens rows
            mean_t = jnp.concatenate(
                [mean_t, jnp.zeros((t_pad - t, mean_t.shape[1]), jnp.float32)],
                axis=0,
            )
        temporal_ref[:] = mean_t.astype(temporal_ref.dtype)


def spatio_temporal_pool_pallas(
    features: jax.Array,
    num_valid_frames: Optional[jax.Array] = None,
    max_temporal_tokens: int = MAX_TEMPORAL_TOKENS,
    out_dtype: jnp.dtype = jnp.bfloat16,
    block_s: int = 64,
    block_c: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused single-pass pooling on TPU. Same contract as
    :func:`spatio_temporal_pool` for 3D inputs."""
    t, s, c = features.shape
    if t > max_temporal_tokens:
        raise ValueError(f"t={t} exceeds max_temporal_tokens={max_temporal_tokens}")
    if s % block_s or c % block_c:
        # Shapes from CLIP are 256/576 x 1024; fall back otherwise.
        return spatio_temporal_pool(
            features, num_valid_frames, max_temporal_tokens, out_dtype
        )

    n = (
        jnp.asarray(num_valid_frames, jnp.int32).reshape(())
        if num_valid_frames is not None
        else jnp.asarray(t, jnp.int32)
    )
    temporal, spatial = _pool_call(
        features, jnp.stack([n, n]), max_temporal_tokens, out_dtype,
        block_s, block_c, interpret,
    )
    return jnp.concatenate([temporal, spatial], axis=0)


def _pool_call(
    features, n2, max_temporal_tokens, out_dtype, block_s, block_c,
    interpret,
):
    """Invoke the fused kernel; n2 = (2,) int32 [n_mask, n_denom].
    Returns (temporal (max_temporal_tokens, c), spatial (s, c))."""
    t, s, c = features.shape
    n = n2

    grid = (c // block_c, s // block_s)
    temporal, spatial = pl.pallas_call(
        _pool_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (t, block_s, block_c),
                    lambda i, j, n_ref: (0, j, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (max_temporal_tokens, block_c),
                    lambda i, j, n_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block_s, block_c),
                    lambda i, j, n_ref: (j, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[pltpu.VMEM((t, block_c), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((max_temporal_tokens, c), out_dtype),
            jax.ShapeDtypeStruct((s, c), out_dtype),
        ],
        interpret=interpret,
    )(n, features)
    return temporal, spatial


def spatio_temporal_pool_sharded(
    features: jax.Array,
    num_valid_frames: Optional[jax.Array],
    mesh,
    axis: str = "data",
    max_temporal_tokens: int = MAX_TEMPORAL_TOKENS,
    out_dtype: jnp.dtype = jnp.bfloat16,
    block_s: int = 64,
    block_c: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused pooling with the frame axis sharded over `axis`: each shard
    runs the Pallas kernel on its local frame rows (temporal tokens stay
    frame-sharded), and the spatial mean's partial sums psum over the
    axis. Same contract as :func:`spatio_temporal_pool` for 3D inputs.

    Requires t == max_temporal_tokens (encode_video always pads frames
    to the cap first) and t divisible by the axis size; callers fall
    back to the XLA formulation otherwise."""
    from jax.sharding import PartitionSpec as P

    t, s, c = features.shape
    n_sh = int(mesh.shape[axis])
    if (
        t != max_temporal_tokens
        or t % n_sh
        or s % block_s
        or c % block_c
    ):
        return spatio_temporal_pool(
            features, num_valid_frames, max_temporal_tokens, out_dtype
        )
    tl = t // n_sh

    n_global = (
        jnp.asarray(num_valid_frames, jnp.int32).reshape((1,))
        if num_valid_frames is not None
        else jnp.full((1,), t, jnp.int32)
    )

    def per_shard(x, nvec):
        k = jax.lax.axis_index(axis)
        n = nvec[0]
        n_local = jnp.clip(n - k * tl, 0, tl)
        temporal, spatial_part = _pool_call(
            x, jnp.stack([n_local, n]), tl, out_dtype, block_s,
            block_c, interpret,
        )
        return temporal, jax.lax.psum(spatial_part, axis)

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None)),
        out_specs=(P(axis, None), P(None, None)),
        check_vma=False,
    )
    temporal, spatial = fn(features, n_global)
    return jnp.concatenate([temporal, spatial], axis=0)

"""Uniform frame sampling.

Parity target: reference `get_seq_frames` (video_chatgpt/eval/
model_utils.py:55-79): split [0, total-1] into `desired` equal segments
of size (total-1)/desired and take the middle index of each segment,
with numpy banker's rounding of the segment boundaries.

The TPU-native version is vectorized (no Python loop) and jit-safe when
`total_num_frames` is static; a traced-total variant is provided for
use inside jitted data pipelines.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def get_seq_frames(total_num_frames: int, desired_num_frames: int) -> list:
    """Exact reference-parity sampler (host-side, returns python ints).

    Matches video_chatgpt/eval/model_utils.py:55-79 for every input:
    seg = (total-1)/desired, index_i = (round(seg*i) + round(seg*(i+1)))//2
    where round is numpy's round-half-to-even.
    """
    return [int(x) for x in get_seq_frames_np(total_num_frames, desired_num_frames)]


def get_seq_frames_np(total_num_frames: int, desired_num_frames: int) -> np.ndarray:
    """Vectorized numpy twin of :func:`get_seq_frames`."""
    seg_size = float(total_num_frames - 1) / desired_num_frames
    i = np.arange(desired_num_frames + 1, dtype=np.float64)
    # np.round == round-half-to-even, same as the reference's np.round.
    bounds = np.round(seg_size * i).astype(np.int64)
    return (bounds[:-1] + bounds[1:]) // 2


def get_seq_frames_jax(total_num_frames, desired_num_frames: int):
    """Traced-total variant for on-device pipelines.

    `desired_num_frames` must be static (output shape); the total may be
    a traced int32 scalar. Uses exact integer round-half-to-even, which
    matches the fp64 host path everywhere except when seg_size*i lands
    within one ulp of an exact .5 boundary (where fp64 rounding noise in
    numpy can shift a segment bound, and thus a sampled index, by 1).
    The host `get_seq_frames` is the bit-parity path for data loading.
    """
    total = jnp.asarray(total_num_frames, jnp.int32)
    d = desired_num_frames
    i = jnp.arange(d + 1, dtype=jnp.int32)
    # Exact integer round-half-to-even of (total-1)*i/d, immune to the
    # fp32 precision loss a naive jnp.round would suffer.
    num = (total - 1) * i
    q, r = num // d, num % d
    round_up = (2 * r > d) | ((2 * r == d) & (q % 2 == 1))
    bounds = q + round_up.astype(jnp.int32)
    return (bounds[:-1] + bounds[1:]) // 2


def sample_or_pad_indices(total_num_frames: int, num_frames: int) -> np.ndarray:
    """Reference `load_video` behavior (model_utils.py:33-36): sample
    min(total, num_frames) uniformly; shorter videos keep all frames.

    Returns exactly `min(total, num_frames)` indices (no padding here —
    temporal padding happens in pooling, inference.py:31-36).
    """
    eff = min(total_num_frames, num_frames)
    return get_seq_frames_np(total_num_frames, eff)

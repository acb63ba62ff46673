"""Golden tests for uniform frame sampling.

Parity target: reference get_seq_frames (video_chatgpt/eval/
model_utils.py:55-79) — middle index of each of `desired` equal
segments with numpy round-half-even boundaries.
"""

import numpy as np
import pytest

from video_llava_tpu.ops.sampling import (
    get_seq_frames,
    get_seq_frames_jax,
    get_seq_frames_np,
    sample_or_pad_indices,
)


def _reference_formula(total, desired):
    seg = float(total - 1) / desired
    out = []
    for i in range(desired):
        start = int(np.round(seg * i))
        end = int(np.round(seg * (i + 1)))
        out.append((start + end) // 2)
    return out


@pytest.mark.parametrize(
    "total,desired",
    [
        (1000, 100),
        (100, 100),
        (101, 100),
        (99, 99),
        (37, 10),
        (250, 100),
        (3001, 100),
        (7, 7),
        (2, 1),
    ],
)
def test_matches_reference_formula(total, desired):
    assert get_seq_frames(total, desired) == _reference_formula(total, desired)


def test_indices_in_range_and_monotonic():
    for total in [50, 100, 483, 9999]:
        idx = get_seq_frames_np(total, min(total, 100))
        assert idx.min() >= 0 and idx.max() < total
        assert (np.diff(idx) >= 0).all()


def test_jax_variant_matches_numpy():
    """The traced variant uses exact rational round-half-even; it may
    differ from the fp64 host path by at most 1 frame, and only where a
    segment boundary lands exactly on .5 (fp64 noise territory)."""
    for total in [100, 101, 250, 3001, 483, 77]:
        a = np.asarray(get_seq_frames_jax(total, 100))
        b = get_seq_frames_np(total, 100)
        diff = np.abs(a - b)
        assert diff.max() <= 1
        # divergence is rare: only exact-half boundary cases
        assert (diff > 0).sum() <= 2


def test_short_video_keeps_all_frames():
    idx = sample_or_pad_indices(30, 100)
    assert len(idx) == 30
    assert idx.tolist() == _reference_formula(30, 30)

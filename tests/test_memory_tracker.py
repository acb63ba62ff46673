"""Memory tracker: propagation must follow a distinctly-colored object
moving across frames (training-free STM matching)."""

import numpy as np

from video_llava_tpu.grounding.memory_tracker import (
    MemoryTracker,
    TrackerConfig,
)


def _frame(cx, cy, size=16, H=64, W=64, color=(1.0, 0.1, 0.1)):
    f = np.full((H, W, 3), 0.5, np.float32)
    f[cy : cy + size, cx : cx + size] = color
    return f


def _mask(cx, cy, size=16, H=64, W=64):
    m = np.zeros((H, W), np.float32)
    m[cy : cy + size, cx : cx + size] = 1.0
    return m


def test_tracks_moving_object():
    cfg = TrackerConfig(max_objects=4, patch=8, temperature=0.02)
    tracker = MemoryTracker(cfg)
    tracker.add_reference(_frame(8, 8), _mask(8, 8)[None])

    # object moves by 8 px per frame
    for step, (cx, cy) in enumerate([(16, 8), (24, 16), (32, 24)]):
        masks = tracker.step(_frame(cx, cy))
        pred = masks[0] > 0.5
        want = _mask(cx, cy) > 0.5
        inter = (pred & want).sum()
        union = (pred | want).sum()
        assert inter / max(union, 1) > 0.5, (step, inter, union)

    assert tracker.num_objects == 1


def test_two_objects_stay_separate():
    cfg = TrackerConfig(max_objects=4, patch=8, temperature=0.02)
    tracker = MemoryTracker(cfg)
    H = W = 64
    f = np.full((H, W, 3), 0.5, np.float32)
    f[8:24, 8:24] = (1.0, 0.1, 0.1)  # red object
    f[40:56, 40:56] = (0.1, 0.1, 1.0)  # blue object
    m = np.stack([_mask(8, 8), _mask(40, 40)])
    tracker.add_reference(f, m)

    f2 = np.full((H, W, 3), 0.5, np.float32)
    f2[8:24, 16:32] = (1.0, 0.1, 0.1)
    f2[40:56, 32:48] = (0.1, 0.1, 1.0)
    masks = tracker.step(f2)
    assert masks[0, 16, 24] > 0.5  # red tracked to its new spot
    assert masks[1, 48, 40] > 0.5  # blue tracked
    assert masks[0, 48, 40] < 0.3  # no identity swap
    assert masks[1, 16, 24] < 0.3


def test_clear_resets():
    tracker = MemoryTracker(TrackerConfig())
    tracker.add_reference(_frame(8, 8), _mask(8, 8)[None])
    tracker.clear()
    assert tracker.state is None

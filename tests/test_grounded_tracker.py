"""Grounded tracker orchestration with stub detector/segmenter: online
and semionline modes, id persistence, NMS + voting."""

import numpy as np
import pytest

from video_llava_tpu.grounding.memory_tracker import TrackerConfig
from video_llava_tpu.grounding.tracker import GroundedTracker


def _make_video(n=10, H=64, W=64, size=16, step=4):
    """Red square moving right by `step` px per frame."""
    frames, gts = [], []
    for i in range(n):
        f = np.full((H, W, 3), 128, np.uint8)
        x = 4 + i * step
        f[24 : 24 + size, x : x + size] = (230, 40, 40)
        frames.append(f)
        gts.append((x, 24, x + size, 24 + size))
    return frames, gts


def _stub_detector(image, prompts):
    """Perfect color detector for the red square."""
    red = (image[..., 0] > 180) & (image[..., 1] < 100)
    ys, xs = np.nonzero(red)
    if len(xs) == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0,)), np.zeros((0,), int)
    box = np.array(
        [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]], np.float32
    )
    return box, np.array([0.9], np.float32), np.array([0], int)


def _stub_segmenter(image, boxes):
    masks = np.zeros((len(boxes),) + image.shape[:2], np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
        masks[i, y0:y1, x0:x1] = 1.0
    return masks


@pytest.mark.parametrize("setting", ["online", "semionline"])
def test_tracks_square(setting):
    frames, gts = _make_video()
    tracker = GroundedTracker(
        detector=_stub_detector,
        segmenter=_stub_segmenter,
        detection_every=5,
        temporal_setting=setting,
        num_voting_frames=3,
        tracker_cfg=TrackerConfig(max_objects=4, patch=4, temperature=0.02),
    )
    results = tracker.run_on_list_of_images(frames, ["red square"])
    assert len(results) == len(frames)
    assert [r.frame_index for r in results] == list(range(len(frames)))
    hits = 0
    for r, (x0, y0, x1, y1) in zip(results, gts):
        pred = r.masks[0] > 0.5
        want = np.zeros_like(pred)
        want[y0:y1, x0:x1] = True
        inter = (pred & want).sum()
        union = (pred | want).sum()
        if union and inter / union > 0.4:
            hits += 1
    assert hits >= len(frames) * 0.7, hits
    # one persistent object id
    assert all(len(r.objects) == 1 for r in results if r.objects)


def test_no_detections_yields_empty_masks():
    frames = [np.full((32, 32, 3), 128, np.uint8) for _ in range(4)]

    def empty_detector(image, prompts):
        return np.zeros((0, 4), np.float32), np.zeros((0,)), np.zeros((0,), int)

    tracker = GroundedTracker(
        detector=empty_detector,
        segmenter=_stub_segmenter,
        detection_every=2,
        tracker_cfg=TrackerConfig(max_objects=2, patch=4),
    )
    results = tracker.run_on_list_of_images(frames, ["thing"])
    assert len(results) == 4
    assert all((r.masks <= 0.5).all() for r in results)


class _BatchStubDetector:
    """detect_batch-aware stub: records chunk sizes so the test can
    assert the tracker actually batched (with static-size padding)."""

    def __init__(self):
        self.batch_calls = []
        self.single_calls = 0

    def __call__(self, image, prompts):
        self.single_calls += 1
        return _stub_detector(image, prompts)

    def detect_batch(self, images, prompts):
        self.batch_calls.append(len(images))
        return [_stub_detector(img, prompts) for img in images]


def test_batched_detection_matches_per_frame():
    frames, _ = _make_video(n=11)
    kw = dict(
        segmenter=_stub_segmenter,
        detection_every=2,  # detection frames 0,2,4,6,8,10 (six)
        tracker_cfg=TrackerConfig(max_objects=4, patch=4, temperature=0.02),
    )
    base = GroundedTracker(detector=_stub_detector, **kw)
    ref = base.run_on_list_of_images(frames, ["red square"])

    stub = _BatchStubDetector()
    batched = GroundedTracker(detector=stub, detect_batch_size=4, **kw)
    got = batched.run_on_list_of_images(frames, ["red square"])

    # 6 detection frames in chunks of 4: [4, 4(padded from 2)]
    assert stub.batch_calls == [4, 4]
    assert stub.single_calls == 0
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        assert a.frame_index == b.frame_index
        np.testing.assert_allclose(a.masks, b.masks)
        assert a.objects == b.objects


class _CachingStubSegmenter:
    """SamSegmenter-shaped stub: records precompute/call patterns so the
    test can assert the tracker batch-encodes detection frames and
    routes per-frame calls through the cache."""

    supports_frame_cache = True
    # The tracker gates embedding precompute on the SEGMENTER's own
    # batching knob (independent of detect_batch_size).
    encode_batch_size = 4

    def __init__(self):
        self.precomputed = []
        self.cache = set()
        self.cached_calls = 0
        self.uncached_calls = 0
        self.cleared = 0
        self.max_resident = 0

    def num_cached_embeddings(self):
        return len(self.cache)

    def precompute_embeddings(self, frames, frame_indices):
        self.precomputed.append(list(frame_indices))
        self.cache.update(frame_indices)
        self.max_resident = max(self.max_resident, len(self.cache))

    def discard_embedding(self, frame_index):
        self.cache.discard(frame_index)

    def clear_cache(self):
        self.cache = set()
        self.cleared += 1

    def __call__(self, image, boxes, frame_index=None):
        if frame_index in self.cache:
            self.cache.discard(frame_index)
            self.cached_calls += 1
        else:
            self.uncached_calls += 1
        return _stub_segmenter(image, boxes)


def test_segmenter_embedding_precompute_used():
    frames, _ = _make_video(n=11)
    kw = dict(
        detection_every=2,
        tracker_cfg=TrackerConfig(max_objects=4, patch=4, temperature=0.02),
    )
    base = GroundedTracker(
        detector=_stub_detector, segmenter=_stub_segmenter, **kw
    )
    ref = base.run_host_loop(frames, ["red square"])

    seg = _CachingStubSegmenter()
    det = _BatchStubDetector()
    tracked = GroundedTracker(
        detector=det, segmenter=seg, detect_batch_size=4, **kw
    )
    got = tracked.run_host_loop(frames, ["red square"])

    # the 6 detection frames all precompute (window 8 covers them in
    # one batch); every detect_and_segment hit the cache
    assert seg.precomputed == [[0, 2, 4, 6, 8, 10]]
    assert seg.cached_calls == 6
    assert seg.uncached_calls == 0
    assert not seg.cache
    assert seg.cleared >= 1  # clear() at run start resets the cache
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        assert a.frame_index == b.frame_index
        np.testing.assert_allclose(a.masks, b.masks)


def test_segmenter_embedding_prefetch_window_bounds_residency():
    """SAM embeddings are ~4 MB each; the tracker must keep a bounded
    sliding window resident, not all detection frames of the clip
    (advisor finding r2: unbounded HBM growth with video length)."""
    frames, _ = _make_video(n=11)
    seg = _CachingStubSegmenter()
    det = _BatchStubDetector()
    tracked = GroundedTracker(
        detector=det, segmenter=seg, detect_batch_size=4,
        detection_every=2, emb_prefetch_frames=2,
        tracker_cfg=TrackerConfig(max_objects=4, patch=4, temperature=0.02),
    )
    got = tracked.run_host_loop(frames, ["red square"])
    assert len(got) == 11
    # never more than the window resident; all frames still served from
    # the cache (prefetch keeps up with the cursor)
    assert seg.max_resident <= 2
    assert seg.cached_calls == 6
    assert seg.uncached_calls == 0
    # streamed in several small batches rather than one big precompute
    assert len(seg.precomputed) >= 3
    assert sorted(i for b in seg.precomputed for i in b) == [0, 2, 4, 6, 8, 10]


def test_segmenter_precompute_independent_of_detector_batching():
    """detect_batch_size=1 (detector batching off) must NOT disable SAM
    encoder amortization — the two knobs are independent (advisor
    finding r2)."""
    frames, _ = _make_video(n=7)
    seg = _CachingStubSegmenter()
    tracked = GroundedTracker(
        detector=_stub_detector, segmenter=seg, detect_batch_size=1,
        detection_every=2,
        tracker_cfg=TrackerConfig(max_objects=4, patch=4, temperature=0.02),
    )
    tracked.run_host_loop(frames, ["red square"])
    assert seg.cached_calls == 4
    assert seg.uncached_calls == 0

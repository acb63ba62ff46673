"""Grounding eval: sIoU metric + dataset frame-id resampling + e2e
benchmark loop on synthetic data with stub detector."""

import numpy as np

from video_llava_tpu.datasets.grounding_datasets import resample_frame_ids
from video_llava_tpu.grounding.eval_grounding import (
    evaluate_dataset,
    iou_per_video,
)
from video_llava_tpu.grounding.memory_tracker import TrackerConfig
from video_llava_tpu.grounding.tracker import FrameResult, GroundedTracker


def test_resample_frame_ids():
    # 30 fps -> 5 fps over 60 frames: every ~6th frame
    ids = resample_frame_ids(0, 60, 30.0, 5.0, 100)
    assert ids[0] == 0
    assert len(ids) == 10
    diffs = np.diff(ids)
    assert (diffs >= 5).all() and (diffs <= 7).all()
    # cap at video_max_len
    ids = resample_frame_ids(0, 3000, 30.0, 5.0, 100)
    assert len(ids) == 100


def test_iou_per_video_perfect_and_empty():
    H = W = 32
    masks = np.zeros((2, H, W), np.float32)
    masks[0, 8:16, 8:16] = 1.0
    results = [FrameResult(0, masks, []), FrameResult(1, np.zeros_like(masks), [])]
    img2box = {0: [[8, 8, 15, 15]], 1: [[8, 8, 15, 15]]}
    siou = iou_per_video(results, [0, 1], img2box)
    # frame 0 perfect (IoU 1), frame 1 empty (0) -> mean 0.5
    assert abs(siou - 0.5) < 1e-6


class _SyntheticDataset:
    """Red square at a fixed spot, GT box matching."""

    def __init__(self, n=2):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from video_llava_tpu.datasets.grounding_datasets import GroundingSample

        frames = np.full((6, 64, 64, 3), 128, np.uint8)
        frames[:, 24:40, 16:32] = (230, 40, 40)
        return GroundingSample(
            video_id=f"v{i}",
            caption="the red square",
            frames=frames,
            frame_ids=list(range(6)),
            inter_idx=[2, 4],
            img2box={2: [[16, 24, 31, 39]], 4: [[16, 24, 31, 39]]},
        )


def _stub_detector(image, prompts):
    red = (image[..., 0] > 180) & (image[..., 1] < 100)
    ys, xs = np.nonzero(red)
    if len(xs) == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0,)), np.zeros((0,), int)
    return (
        np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]], np.float32),
        np.array([0.9], np.float32),
        np.array([0], int),
    )


def _stub_segmenter(image, boxes):
    masks = np.zeros((len(boxes),) + image.shape[:2], np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
        masks[i, y0:y1, x0:x1] = 1.0
    return masks


def test_evaluate_dataset_end_to_end(tmp_path):
    tracker = GroundedTracker(
        detector=_stub_detector,
        segmenter=_stub_segmenter,
        detection_every=3,
        tracker_cfg=TrackerConfig(max_objects=2, patch=4, temperature=0.02),
    )
    out = evaluate_dataset(
        _SyntheticDataset(),
        tracker,
        use_annotator=False,
        output_dir=str(tmp_path),
    )
    assert out["num_samples"] == 2
    assert out["m_sIoU"] > 0.8
    assert (tmp_path / "v0.json").exists()

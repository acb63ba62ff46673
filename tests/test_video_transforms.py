"""Video transform zoo: reference-parity geometry and target tracking
(grounding_evaluation/util/image_transforms.py)."""

import numpy as np

from video_llava_tpu.ops.video_transforms import (
    Compose,
    RandomSizeCrop,
    VideoTransform,
    crop,
    crop_boxes,
    get_size_with_aspect_ratio,
    hflip,
    hflip_boxes,
    hflip_clip,
    make_video_transforms,
    prepare,
    resize,
    resize_boxes,
    resize_clip,
)


def test_resize_and_boxes():
    clip = np.zeros((2, 100, 200, 3), np.uint8)
    out = resize_clip(clip, (50, 100))
    assert out.shape == (2, 50, 100, 3)
    boxes = np.array([[20.0, 10.0, 40.0, 30.0]])
    got = resize_boxes(boxes, (100, 200), (50, 100))
    np.testing.assert_allclose(got, [[10, 5, 20, 15]])


def test_hflip_box_involution():
    boxes = np.array([[10.0, 5.0, 30.0, 25.0]])
    twice = hflip_boxes(hflip_boxes(boxes, 100), 100)
    np.testing.assert_allclose(twice, boxes)
    clip = np.zeros((1, 4, 4, 3), np.uint8)
    clip[0, 0, 0] = 255
    flipped = hflip_clip(clip)
    assert flipped[0, 0, 3, 0] == 255


def test_crop_boxes_clipped():
    boxes = np.array([[5.0, 5.0, 50.0, 50.0]])
    got = crop_boxes(boxes, top=10, left=10, size=(20, 20))
    np.testing.assert_allclose(got, [[0, 0, 20, 20]])


def test_aspect_ratio_math_matches_reference():
    """get_size_with_aspect_ratio (image_transforms.py:294-312)."""
    # shortest side -> 224, aspect preserved
    assert get_size_with_aspect_ratio((480, 640), 224) == (224, 298)
    # max_size caps the long side: 224*640/480=298 <= 373 ok; at 800
    # input the cap engages: 224/480*853 = 398 > 373 -> shrink
    h, w = get_size_with_aspect_ratio((480, 853), 224, max_size=373)
    assert w <= 373 and h <= 373
    assert abs(w / h - 853 / 480) < 0.02
    # already at size: identity
    assert get_size_with_aspect_ratio((224, 300), 224) == (224, 300)


def test_resize_scales_targets():
    clip = np.zeros((2, 100, 200, 3), np.uint8)
    targets = [
        {
            "boxes": np.array([[20.0, 10.0, 40.0, 30.0]]),
            "area": np.array([400.0]),
            "masks": np.zeros((1, 100, 200), bool),
        }
        for _ in range(2)
    ]
    out, tgts = resize(clip, targets, (50, 100))
    assert out.shape == (2, 50, 100, 3)
    np.testing.assert_allclose(tgts[0]["boxes"], [[10, 5, 20, 15]])
    np.testing.assert_allclose(tgts[0]["area"], [100.0])
    assert tgts[0]["masks"].shape == (1, 50, 100)


def test_crop_drops_degenerate_boxes_and_filters_fields():
    clip = np.zeros((1, 100, 100, 3), np.uint8)
    targets = [
        {
            "boxes": np.array(
                [[10.0, 10.0, 30.0, 30.0], [80.0, 80.0, 95.0, 95.0]]
            ),
            "labels": np.array([1, 2]),
            "area": np.array([400.0, 225.0]),
        }
    ]
    out, tgts = crop(clip, targets, (0, 0, 50, 50))
    assert out.shape == (1, 50, 50, 3)
    # second box is entirely outside the crop -> dropped with its label
    np.testing.assert_allclose(tgts[0]["boxes"], [[10, 10, 30, 30]])
    np.testing.assert_array_equal(tgts[0]["labels"], [1])


def test_random_size_crop_respect_boxes():
    """respect_boxes never loses a box (image_transforms.py:441-487)."""
    rng = np.random.default_rng(0)
    clip = np.zeros((1, 80, 80, 3), np.uint8)
    targets = [{"boxes": np.array([[5.0, 5.0, 75.0, 75.0]]),
                "labels": np.array([1])}]
    t = RandomSizeCrop(16, 64, respect_boxes=True, rng=rng)
    for _ in range(5):
        _, tgts = t(clip, targets)
        assert len(tgts[0]["boxes"]) == 1


def test_hflip_targets():
    clip = np.zeros((1, 10, 20, 3), np.uint8)
    targets = [{"boxes": np.array([[2.0, 1.0, 6.0, 5.0]]),
                "masks": np.zeros((1, 10, 20), bool)}]
    targets[0]["masks"][0, :, :3] = True
    out, tgts = hflip(clip, targets)
    np.testing.assert_allclose(tgts[0]["boxes"], [[14, 1, 18, 5]])
    assert tgts[0]["masks"][0, :, -3:].all()


def test_eval_transform_reference_semantics():
    """val/test = deterministic shortest-side resize (NO square crop),
    exactly the reference composition (:595-601)."""
    tf = make_video_transforms("test", cautious=True, resolution=128)
    clip = np.random.default_rng(0).integers(
        0, 255, size=(3, 64, 48, 3), dtype=np.uint8
    )
    out1, _ = tf(clip)
    out2, _ = tf(clip)
    assert out1.shape == (3, 170, 128, 3)  # shortest side 128, aspect kept
    np.testing.assert_allclose(out1, out2)
    assert out1.dtype == np.float32  # normalized


def test_train_factory_tracks_boxes():
    tf = make_video_transforms("train", cautious=True, resolution=128,
                               seed=3)
    clip = np.zeros((2, 160, 160, 3), np.uint8)
    targets = [
        {"boxes": np.array([[40.0, 40.0, 120.0, 120.0]]),
         "labels": np.array([1])}
        for _ in range(2)
    ]
    out, tgts = tf(clip, targets)
    assert out.dtype == np.float32
    h, w = out.shape[1:3]
    # cautious => no flip, crop preserves the box
    assert len(tgts[0]["boxes"]) == 1
    b = tgts[0]["boxes"]
    assert (b[..., 0::2] <= w).all() and (b[..., 1::2] <= h).all()
    assert (b >= 0).all()


def test_resolution_table_complete():
    for res in (128, 224, 256, 288, 320, 336, 352, 384, 416, 448, 480, 800):
        tf = make_video_transforms("test", cautious=False, resolution=res)
        assert isinstance(tf, Compose)


def test_prepare():
    anno = [{"bbox": [10, 20, 30, 40]}, {"bbox": [95, 95, 30, 30]},
            {"bbox": [5, 5, 0, 0]}]
    tgt = prepare(100, 100, anno)
    # xywh -> xyxy, clamped; zero-area box dropped
    np.testing.assert_allclose(
        tgt["boxes"], [[10, 20, 40, 60], [95, 95, 100, 100]]
    )
    np.testing.assert_array_equal(tgt["orig_size"], [100, 100])


def test_simple_pipeline_tracks_boxes():
    tf = VideoTransform(train=True, resolution=32, seed=1)
    clip = np.zeros((2, 64, 64, 3), np.uint8)
    boxes = np.array([[8.0, 8.0, 24.0, 24.0]])
    out, b = tf(clip, boxes)
    assert out.shape == (2, 32, 32, 3)
    assert b.shape == (1, 4)
    assert (b[..., 0::2] <= 32).all() and (b[..., 1::2] <= 32).all()

"""Video transform zoo: geometry of crops/flips tracks boxes correctly."""

import numpy as np

from video_llava_tpu.ops.video_transforms import (
    VideoTransform,
    crop_boxes,
    hflip_boxes,
    hflip_clip,
    make_video_transforms,
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


def test_eval_transform_deterministic():
    tf = make_video_transforms("test", resolution=32)
    clip = np.random.default_rng(0).integers(
        0, 255, size=(3, 64, 48, 3), dtype=np.uint8
    )
    out1, _ = tf(clip)
    out2, _ = tf(clip)
    assert out1.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(out1, out2)


def test_train_transform_tracks_boxes():
    tf = VideoTransform(train=True, resolution=32, seed=1)
    clip = np.zeros((2, 64, 64, 3), np.uint8)
    boxes = np.array([[8.0, 8.0, 24.0, 24.0]])
    out, b = tf(clip, boxes)
    assert out.shape == (2, 32, 32, 3)
    assert b.shape == (1, 4)
    assert (b[..., 0::2] <= 32).all() and (b[..., 1::2] <= 32).all()

"""Box math vs explicit numpy oracles (torchvision is not in this
environment; the formulas below are the standard definitions the
reference relies on via torchvision/box_ops)."""

import numpy as np
import jax.numpy as jnp

from video_llava_tpu.ops.box_ops import (
    batched_nms,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
    nms,
)


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 80, size=(n, 2))
    wh = rng.uniform(4, 40, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _iou_np(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union, union


def _giou_np(a, b):
    iou, union = _iou_np(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def _nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou, _ = _iou_np(boxes[i : i + 1], boxes)
        suppressed |= (iou[0] > thr) & (scores < scores[i])
        # ties broken by sort order, matching the greedy definition
        for j in order:
            if j != i and not suppressed[j] and iou[0, j] > thr:
                suppressed[j] = True
    return sorted(keep)


def test_iou_matches_oracle():
    rng = np.random.default_rng(0)
    a, b = _rand_boxes(rng, 12), _rand_boxes(rng, 7)
    got, _ = box_iou(jnp.asarray(a), jnp.asarray(b))
    want, _ = _iou_np(a, b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_giou_matches_oracle():
    rng = np.random.default_rng(1)
    a, b = _rand_boxes(rng, 9), _rand_boxes(rng, 9)
    got = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(got), _giou_np(a, b), rtol=1e-5, atol=1e-6
    )


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(2)
    b = _rand_boxes(rng, 5)
    back = box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-5)


def test_nms_matches_oracle():
    rng = np.random.default_rng(3)
    boxes = _rand_boxes(rng, 30)
    scores = rng.uniform(size=30).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    want = _nms_np(boxes, scores, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_nms_max_outputs():
    rng = np.random.default_rng(5)
    boxes = _rand_boxes(rng, 20)
    # Spread boxes so nothing suppresses: shift each far apart.
    boxes[:, [0, 2]] += np.arange(20)[:, None] * 100
    scores = rng.uniform(size=20).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5))
    assert keep.sum() == 5
    assert set(np.nonzero(keep)[0]) == set(np.argsort(-scores)[:5])


def test_batched_nms_keeps_classes_separate():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    same = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
    assert np.asarray(same).tolist() == [True, False]
    diff = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 1]), 0.3
    )
    assert np.asarray(diff).tolist() == [True, True]


def test_masks_to_boxes():
    masks = np.zeros((3, 20, 30), bool)
    masks[0, 3:9, 5:15] = True
    masks[1, 0:1, 29:30] = True
    # masks[2] empty
    got = np.asarray(masks_to_boxes(jnp.asarray(masks)))
    np.testing.assert_allclose(got[0], [5, 3, 14, 8], atol=1e-6)
    np.testing.assert_allclose(got[1], [29, 0, 29, 0], atol=1e-6)
    np.testing.assert_allclose(got[2], 0.0)

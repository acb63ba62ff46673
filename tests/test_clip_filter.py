"""CLIP zero-shot crop filter: mechanics with tiny towers and a
byte-level tokenizer; thresholds behave like the reference
(prob > 0.1 AND score >= 0.2)."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.grounding.clip_filter import ClipCropFilter
from video_llava_tpu.models import clip as clip_mod


def _build_filter(prob_threshold=0.0, score_threshold=-1.0):
    vcfg = CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16,
    )
    tcfg = CLIPTextConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, projection_dim=16,
    )
    vparams = clip_mod.init_vision_params(jax.random.PRNGKey(0), vcfg)
    tparams = clip_mod.init_text_params(jax.random.PRNGKey(1), tcfg)
    vproj = {
        "kernel": jnp.asarray(
            np.random.default_rng(2).normal(size=(32, 16)).astype(np.float32)
        )
    }
    tokenize = lambda s: [1] + [2 + (ord(c) % 250) for c in s[:20]] + [299]
    return ClipCropFilter(
        vparams, vcfg, tparams, tcfg, tokenize, vproj,
        prob_threshold=prob_threshold, score_threshold=score_threshold,
    )


def test_zeroshot_weights_cached_and_normalized():
    f = _build_filter()
    w = f.zeroshot_weights(["cat", "dog"])
    assert w.shape == (16, 2)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(w, axis=0)), 1.0, rtol=1e-5
    )
    assert f.zeroshot_weights(["cat", "dog"]) is w  # cache hit


def test_filter_keep_mask_shapes_and_thresholds():
    f = _build_filter(prob_threshold=0.0, score_threshold=-1.0)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    boxes = np.array(
        [[5, 5, 40, 40], [50, 30, 95, 75], [0, 0, 10, 10]], np.float32
    )
    keep = f(image, boxes, np.array([0, 1, 0]), ["cat", "dog"])
    assert keep.shape == (3,)
    assert keep.all()  # permissive thresholds keep everything
    # impossible threshold drops everything
    f2 = _build_filter(prob_threshold=1.1, score_threshold=2.0)
    keep2 = f2(image, boxes, np.array([0, 1, 0]), ["cat", "dog"])
    assert not keep2.any()
    assert f(image, np.zeros((0, 4), np.float32), np.zeros((0,), int),
             ["cat"]).shape == (0,)


def test_crop_resize_batch_matches_host_crops():
    """crop_resize_bicubic_batch == resize_bicubic(image[y0:y1, x0:x1])
    with the filter's integer clamp, for in/out-of-bounds boxes."""
    from video_llava_tpu.ops.image import (
        crop_resize_bicubic_batch, resize_bicubic,
    )

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(2, 60, 90, 3)).astype(np.uint8)
    boxes = np.asarray(
        [
            [[3.7, 5.2, 40.9, 50.1], [0, 0, 90, 60],
             [-5, -3, 10, 7], [88, 58, 200, 200]],
            [[10, 10, 11, 11], [20.5, 30.5, 80.2, 59.9],
             [5, 5, 6, 40], [0, 0, 1, 1]],
        ],
        np.float32,
    )
    out = np.asarray(
        crop_resize_bicubic_batch(jnp.asarray(imgs), jnp.asarray(boxes), 32)
    )
    H, W = 60, 90
    for f in range(2):
        for k in range(4):
            x0, y0, x1, y1 = boxes[f, k].astype(int)
            x0, y0 = max(x0, 0), max(y0, 0)
            x1 = min(max(x1, x0 + 1), W)
            y1 = min(max(y1, y0 + 1), H)
            x0, y0 = min(x0, x1 - 1), min(y0, y1 - 1)
            ref = np.asarray(
                resize_bicubic(
                    jnp.asarray(imgs[f, y0:y1, x0:x1].astype(np.float32)),
                    32, 32,
                )
            )
            np.testing.assert_allclose(out[f, k], ref, atol=2e-3)


def test_device_filter_matches_host_filter():
    """filter_frames_device (batched matmul crops, one program) ==
    the per-frame host __call__ path: same scores (tolerance), same
    keep decisions at thresholds chosen away from every score."""
    f = _build_filter()
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, size=(3, 64, 80, 3), dtype=np.uint8)
    boxes = np.asarray(
        [
            [[4, 6, 34, 36], [40, 10, 75, 55], [-2, -2, 20, 20]],
            [[0, 0, 80, 64], [10, 30, 30, 60], [50, 5, 78, 40]],
            [[8, 8, 9, 9], [25, 25, 60, 50], [5, 40, 45, 63]],
        ],
        np.float32,
    )
    cids = np.asarray([[0, 1, 0], [1, 0, 1], [0, 0, 1]])
    classes = ["cat", "dog"]
    dev_scores = f.score_frames_device(frames, boxes, classes, chunk=2)
    host_scores = np.stack(
        [
            np.asarray(f.embed_crops(frames[i], boxes[i]))
            @ np.asarray(f.zeroshot_weights(classes))
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(dev_scores, host_scores, atol=1e-4)

    # thresholds at least 1e-3 away from every selected score: the
    # keep decisions must then agree exactly
    sel = np.take_along_axis(host_scores, cids[..., None], -1)[..., 0]
    st = float(np.median(sel))
    while np.abs(sel - st).min() < 1e-3:
        st += 2e-3
    f.score_threshold, f.prob_threshold = st, 0.0
    valid = np.ones((3, 3), bool)
    valid[2, 0] = False  # invalid slots must come back False
    keep_dev = f.filter_frames_device(frames, boxes, valid, cids, classes)
    for i in range(3):
        keep_host = f(frames[i], boxes[i], cids[i], classes)
        np.testing.assert_array_equal(
            keep_dev[i], keep_host & valid[i], err_msg=str(i)
        )


def test_device_filter_accepts_device_frames():
    """Device-resident frames (the fused path's single clip upload)
    score identically to np frames."""
    f = _build_filter()
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 255, size=(5, 48, 64, 3), dtype=np.uint8)
    boxes = np.broadcast_to(
        np.asarray([[4, 4, 40, 40], [10, 10, 60, 44]], np.float32),
        (5, 2, 4),
    ).copy()
    a = f.score_frames_device(frames, boxes, ["cat"], chunk=2)
    b = f.score_frames_device(jnp.asarray(frames), boxes, ["cat"], chunk=2)
    np.testing.assert_allclose(a, b, atol=1e-6)

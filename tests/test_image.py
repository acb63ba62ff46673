"""CLIP image preprocessing parity: nearest resize must match torch
F.interpolate(mode='nearest') + HF CLIPImageProcessor normalize."""

import numpy as np
import jax.numpy as jnp

from video_llava_tpu.ops.image import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    normalize_clip,
    preprocess_frames,
    preprocess_frames_np,
    resize_nearest,
)


def test_nearest_resize_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(3, 180, 320, 3), dtype=np.uint8)
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2).float(), size=(224, 224)
        )
        .permute(0, 2, 3, 1)
        .to(torch.uint8)
        .numpy()
    )
    got = np.asarray(resize_nearest(jnp.asarray(x), 224, 224)).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_normalize_matches_formula():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(normalize_clip(jnp.asarray(x)))
    want = (x.astype(np.float32) / 255.0 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(
        CLIP_IMAGE_STD
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_device_and_host_paths_agree():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, size=(4, 120, 160, 3), dtype=np.uint8)
    got = np.asarray(preprocess_frames(x, 56))
    want = preprocess_frames_np(x, 56)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (4, 56, 56, 3)

"""Image preprocessing for the CLIP vision tower, on-device.

Reference pixel path (bit-parity target):
  1. `load_video` resizes decoded frames to (size, size) with
     torch.nn.functional.interpolate default mode='nearest'
     (video_chatgpt/eval/model_utils.py:40-44) and uint8 cast.
  2. HF CLIPImageProcessor.preprocess: shortest-edge resize (no-op at
     this point), center crop (no-op), rescale 1/255, normalize with
     the CLIP mean/std (video_chatgpt/inference.py:86-89).

Everything here is pure jnp so the whole path (resize -> normalize ->
patch embed) compiles into one XLA program; frames ride to the device
once as uint8 (4x less HBM traffic than fp32).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# OpenAI CLIP normalization constants (HF CLIPImageProcessor defaults).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_nearest(frames: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest'):
    src_index = floor(dst_index * in_size / out_size).

    frames: (..., h, w, c), any dtype. Gather-based, so it lowers to two
    cheap takes instead of a conv.
    """
    h, w = frames.shape[-3], frames.shape[-2]
    if (h, w) == (out_h, out_w):
        return frames
    rows = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (h / out_h)).astype(
        jnp.int32
    )
    cols = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (w / out_w)).astype(
        jnp.int32
    )
    out = jnp.take(frames, rows, axis=-3)
    return jnp.take(out, cols, axis=-2)


def resize_bicubic(frames: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Antialiased bicubic resize (approximates PIL's BICUBIC used by
    HF CLIPImageProcessor when frames are not pre-resized)."""
    h, w = frames.shape[-3], frames.shape[-2]
    if (h, w) == (out_h, out_w):
        return frames.astype(jnp.float32)
    shape = frames.shape[:-3] + (out_h, out_w, frames.shape[-1])
    return jax.image.resize(
        frames.astype(jnp.float32), shape, method="bicubic", antialias=True
    )


def center_crop(frames: jax.Array, size: int) -> jax.Array:
    """Center crop to (size, size); HF CLIPImageProcessor semantics."""
    h, w = frames.shape[-3], frames.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return frames[..., top : top + size, left : left + size, :]


def normalize_clip(frames: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/float pixels -> rescale(1/255) -> CLIP mean/std normalize.

    frames: (..., h, w, 3). Returns `dtype`.
    """
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    x = frames.astype(jnp.float32) * (1.0 / 255.0)
    return ((x - mean) / std).astype(dtype)


def preprocess_frames(
    frames,
    image_size: int,
    resize_mode: str = "nearest",
    dtype=jnp.float32,
) -> jax.Array:
    """Full device-side preprocessing: (t, h, w, 3) uint8 -> normalized
    (t, image_size, image_size, 3).

    resize_mode='nearest' reproduces the reference load_video+processor
    composition exactly; 'bicubic' reproduces the pure HF processor path
    for arbitrary-size inputs (shortest-edge resize + center crop).
    """
    x = jnp.asarray(frames)
    if resize_mode == "nearest":
        # load_video resizes straight to (size, size), then uint8.
        x = resize_nearest(x, image_size, image_size)
        if x.dtype != jnp.uint8:
            x = x.astype(jnp.uint8)
    elif resize_mode == "bicubic":
        h, w = x.shape[-3], x.shape[-2]
        scale = image_size / min(h, w)
        new_h, new_w = round(h * scale), round(w * scale)
        x = resize_bicubic(x, new_h, new_w)
        x = center_crop(x, image_size)
        x = jnp.clip(jnp.round(x), 0, 255)
    else:
        raise ValueError(f"unknown resize_mode: {resize_mode}")
    return normalize_clip(x, dtype=dtype)


def preprocess_frames_np(frames: np.ndarray, image_size: int) -> np.ndarray:
    """Host-side numpy twin (for golden tests and CPU data pipelines)."""
    t, h, w, _ = frames.shape
    if (h, w) != (image_size, image_size):
        rows = np.floor(np.arange(image_size) * (h / image_size)).astype(np.int64)
        cols = np.floor(np.arange(image_size) * (w / image_size)).astype(np.int64)
        frames = frames[:, rows][:, :, cols]
    x = frames.astype(np.float32) / 255.0
    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)
    return (x - mean) / std

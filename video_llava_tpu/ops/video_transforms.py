"""Clip-level video transforms.

Parity: reference grounding_evaluation/util/image_transforms.py
(torch_videovision/MDETR lineage): the clip transform zoo — resize,
center/random crop, horizontal flip (with box flipping), normalize —
and `make_video_transforms` with its resolution table
(image_transforms.py:489-604). NOTE: the reference datasets construct
but never apply these (hcstvg_dataset.py:147-151, SURVEY C21); they are
provided for API completeness and for training-time augmentation.

All ops are vectorized numpy over (t, h, w, c) uint8/float clips and
box arrays; device-side equivalents live in ops/image.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from video_llava_tpu.ops.image import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def resize_clip(clip: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of (t, h, w, c) to size=(H, W)."""
    t, h, w, c = clip.shape
    H, W = size
    rows = (np.arange(H) * h // H).clip(0, h - 1)
    cols = (np.arange(W) * w // W).clip(0, w - 1)
    return clip[:, rows][:, :, cols]


def resize_boxes(boxes: np.ndarray, from_hw, to_hw) -> np.ndarray:
    fy, fx = to_hw[0] / from_hw[0], to_hw[1] / from_hw[1]
    return boxes * np.array([fx, fy, fx, fy], boxes.dtype)


def center_crop_clip(clip: np.ndarray, size: Tuple[int, int]):
    t, h, w, c = clip.shape
    H, W = size
    top, left = (h - H) // 2, (w - W) // 2
    return clip[:, top : top + H, left : left + W], (top, left)


def random_crop_clip(clip: np.ndarray, size: Tuple[int, int],
                     rng: np.random.Generator):
    t, h, w, c = clip.shape
    H, W = size
    top = int(rng.integers(0, h - H + 1))
    left = int(rng.integers(0, w - W + 1))
    return clip[:, top : top + H, left : left + W], (top, left)


def crop_boxes(boxes: np.ndarray, top: int, left: int,
               size: Tuple[int, int]) -> np.ndarray:
    H, W = size
    out = boxes - np.array([left, top, left, top], boxes.dtype)
    out[..., 0::2] = out[..., 0::2].clip(0, W)
    out[..., 1::2] = out[..., 1::2].clip(0, H)
    return out


def hflip_clip(clip: np.ndarray) -> np.ndarray:
    return clip[:, :, ::-1]


def hflip_boxes(boxes: np.ndarray, width: int) -> np.ndarray:
    """xyxy boxes under horizontal flip (image_transforms.py flip path)."""
    out = boxes.copy()
    out[..., 0] = width - boxes[..., 2]
    out[..., 2] = width - boxes[..., 0]
    return out


def normalize_clip_np(clip: np.ndarray,
                      mean=CLIP_IMAGE_MEAN, std=CLIP_IMAGE_STD) -> np.ndarray:
    x = clip.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


@dataclasses.dataclass
class VideoTransform:
    """Composable clip+targets transform (reference Compose semantics)."""

    train: bool = False
    resolution: int = 224
    hflip_prob: float = 0.5
    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def __call__(self, clip: np.ndarray,
                 boxes: Optional[np.ndarray] = None):
        t, h, w, c = clip.shape
        # resize shortest side to `resolution` (reference resolution table)
        scale = self.resolution / min(h, w)
        new_hw = (max(int(round(h * scale)), self.resolution),
                  max(int(round(w * scale)), self.resolution))
        out = resize_clip(clip, new_hw)
        if boxes is not None:
            boxes = resize_boxes(boxes, (h, w), new_hw)
        size = (self.resolution, self.resolution)
        if self.train:
            if self._rng.random() < self.hflip_prob:
                out = hflip_clip(out)
                if boxes is not None:
                    boxes = hflip_boxes(boxes, out.shape[2])
            out, (top, left) = random_crop_clip(out, size, self._rng)
        else:
            out, (top, left) = center_crop_clip(out, size)
        if boxes is not None:
            boxes = crop_boxes(boxes, top, left, size)
        return normalize_clip_np(np.ascontiguousarray(out)), boxes


def make_video_transforms(image_set: str, resolution: int = 224,
                          cautious: bool = True) -> VideoTransform:
    """Reference factory signature (image_transforms.py:489-604)."""
    return VideoTransform(train=(image_set == "train"), resolution=resolution)

"""CLIP zero-shot crop filtering for detections.

Parity: reference __apply_clip_thresholding + mask_and_crop
(grounding_evaluation/grounding_new_api.py:111-230, :295): each detected
box is cropped, encoded with CLIP ViT-B/32, scored against
prompt-ensembled class text embeddings, and kept only when the class
probability > 0.1 and raw similarity score >= 0.2.

TPU design: all crops of a frame batch through one CLIP forward; the
text tower runs once per class list (cached).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.models import clip as clip_mod
from video_llava_tpu.models.layers import linear
from video_llava_tpu.ops.image import (
    crop_resize_bicubic_batch,
    normalize_clip,
    resize_bicubic,
)

# Prompt ensemble (a compact subset of the 80 ImageNet templates the
# reference ensembles over; configurable).
DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a bad photo of a {}.",
    "a cropped photo of a {}.",
    "a bright photo of a {}.",
    "a dark photo of a {}.",
    "a close-up photo of a {}.",
    "a photo of one {}.",
    "a blurry photo of a {}.",
    "a photo of a small {}.",
)


class ClipCropFilter:
    # GroundedTracker feature-detects this for fused-path eligibility.
    supports_batch_device = True

    def __init__(
        self,
        vision_params,
        vision_cfg: CLIPVisionConfig,
        text_params,
        text_cfg: CLIPTextConfig,
        tokenize: Callable[[str], List[int]],
        visual_projection,  # {'kernel': (hidden, proj)}
        prob_threshold: float = 0.1,
        score_threshold: float = 0.2,
        templates: Sequence[str] = DEFAULT_TEMPLATES,
    ):
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.text_params = text_params
        self.text_cfg = text_cfg
        self.tokenize = tokenize
        self.visual_projection = visual_projection
        self.prob_threshold = prob_threshold
        self.score_threshold = score_threshold
        self.templates = templates
        self._text_cache: Dict[Tuple[str, ...], jax.Array] = {}
        # Whole-tower jits: eager dispatch costs one host round trip per
        # op on a tunneled TPU; crop batches pad to power-of-2 buckets so
        # the vision program compiles a handful of times total.
        self._text_jit = jax.jit(
            lambda p, ids: clip_mod.text_forward(p, ids, self.text_cfg)
        )
        self._embed_jit = jax.jit(
            lambda p, proj, batch: linear(
                proj,
                clip_mod.vision_pooled_embedding(p, batch, self.vision_cfg),
            )
        )

        # Whole-batch device scorer (the fused grounded-clip path): all
        # K boxes of a frame chunk crop+resize as matmuls and encode in
        # ONE program — no per-crop host slice/transfer/dispatch (the
        # host loop in embed_crops costs a tunnel RTT per crop).
        def _scores(vp, proj, tw, frames, boxes):
            size = self.vision_cfg.image_size
            crops = crop_resize_bicubic_batch(frames, boxes, size)
            c, k = crops.shape[:2]
            batch = normalize_clip(crops).reshape(
                (c * k, size, size, crops.shape[-1])
            )
            emb = linear(
                proj, clip_mod.vision_pooled_embedding(
                    vp, batch, self.vision_cfg
                ),
            )
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return (emb @ tw).reshape(c, k, -1)

        self._scores_jit = jax.jit(_scores)

    def zeroshot_weights(self, classes: Sequence[str]) -> jax.Array:
        """(proj_dim, n_classes) L2-normalized ensemble embeddings
        (reference zeroshot_classifier, grounding_new_api.py:120-140)."""
        key = tuple(classes)
        if key in self._text_cache:
            return self._text_cache[key]
        cols = []
        for cls in classes:
            toks = [self.tokenize(t.format(cls)) for t in self.templates]
            maxlen = self.text_cfg.max_position_embeddings
            ids = np.zeros((len(toks), maxlen), np.int32)
            for i, t in enumerate(toks):
                t = t[:maxlen]
                ids[i, : len(t)] = t
            emb = self._text_jit(self.text_params, jnp.asarray(ids))
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            mean = jnp.mean(emb, axis=0)
            cols.append(mean / jnp.linalg.norm(mean))
        w = jnp.stack(cols, axis=1)
        self._text_cache[key] = w
        return w

    def embed_crops(self, image: np.ndarray, boxes: np.ndarray) -> jax.Array:
        """Crop + resize each box, batch-encode -> (n, proj) normalized."""
        size = self.vision_cfg.image_size
        crops = []
        h, w = image.shape[:2]
        for (x0, y0, x1, y1) in boxes.astype(int):
            x0, y0 = max(x0, 0), max(y0, 0)
            x1, y1 = min(max(x1, x0 + 1), w), min(max(y1, y0 + 1), h)
            crop = image[y0:y1, x0:x1]
            crops.append(
                np.asarray(
                    resize_bicubic(jnp.asarray(crop.astype(np.float32)), size, size)
                )
            )
        n = len(crops)
        # pad to a power-of-2 bucket: one compiled program per bucket
        bucket = 1 << (n - 1).bit_length()
        crops.extend([crops[-1]] * (bucket - n))
        batch = normalize_clip(jnp.asarray(np.stack(crops)))
        emb = self._embed_jit(
            self.vision_params, self.visual_projection, batch
        )[:n]
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(
        self,
        image: np.ndarray,
        boxes: np.ndarray,
        class_ids: np.ndarray,
        classes: Sequence[str],
    ) -> np.ndarray:
        """-> keep mask (n,) bool.

        Routes through the batched device scorer with the box count
        padded to a power-of-2 bucket: ONE compiled program per
        (H, W, bucket). The per-crop host path (embed_crops) compiles
        a resize for EVERY distinct crop shape — with arbitrary boxes
        that is a fresh ~30 s XLA compile per crop on a TPU, and a
        dispatch round trip per crop forever after; it remains only as
        the reference formulation for the parity tests."""
        n = len(boxes)
        if n == 0:
            return np.zeros((0,), bool)
        bucket = 1 << (n - 1).bit_length()
        bx = np.zeros((bucket, 4), np.float32)
        bx[:n] = boxes
        valid = np.zeros((bucket,), bool)
        valid[:n] = True
        cid = np.zeros((bucket,), np.int64)
        cid[:n] = class_ids
        keep = self.filter_frames_device(
            np.asarray(image)[None] if not isinstance(image, jax.Array)
            else image[None],
            bx[None], valid[None], cid[None], classes, chunk=1,
        )
        return np.asarray(keep[0, :n], bool)

    def _decide(
        self, scores: np.ndarray, class_ids: np.ndarray, n_classes: int
    ) -> np.ndarray:
        """scores (..., n_classes) cosine -> keep mask (...,) bool
        (reference thresholds: prob > 0.1 AND raw score >= 0.2,
        grounding_new_api.py:430-443)."""
        probs = np.asarray(
            jax.nn.softmax(100.0 * jnp.asarray(scores), axis=-1)
        )
        cls = np.clip(np.asarray(class_ids), 0, n_classes - 1)
        sel = np.take_along_axis(scores, cls[..., None], axis=-1)[..., 0]
        psel = np.take_along_axis(probs, cls[..., None], axis=-1)[..., 0]
        return (psel > self.prob_threshold) & (
            sel >= self.score_threshold
        )

    # -- batched device path (fused grounded clip) --------------------------

    def score_frames_device(
        self,
        frames,  # (F, H, W, 3) uint8 — np or device-resident jax array
        boxes,  # (F, K, 4) xyxy pixel coords
        classes: Sequence[str],
        chunk: int = 4,
    ) -> np.ndarray:
        """-> (F, K, n_classes) cosine scores. Frames process in
        fixed-size chunks (last pads by repetition) so any detection
        count reuses one compiled program per (H, W, K) shape; device-
        resident frames never revisit the host."""
        w = self.zeroshot_weights(classes)
        xp = jnp if isinstance(frames, jax.Array) else np
        boxes = (
            boxes if isinstance(boxes, jax.Array)
            else np.asarray(boxes, np.float32)
        )
        f_count = len(frames)
        outs = []
        for s in range(0, f_count, chunk):
            fc, bc = frames[s : s + chunk], boxes[s : s + chunk]
            n = len(fc)
            if n < chunk:
                reps = xp.repeat(fc[-1:], chunk - n, axis=0)
                fc = xp.concatenate([fc, reps])
                bc = jnp.concatenate(
                    [jnp.asarray(bc),
                     jnp.repeat(jnp.asarray(bc[-1:]), chunk - n, axis=0)]
                )
            outs.append(
                np.asarray(
                    self._scores_jit(
                        self.vision_params, self.visual_projection, w,
                        jnp.asarray(fc), jnp.asarray(bc),
                    )
                )[:n]
            )
        return np.concatenate(outs, axis=0)

    def filter_frames_device(
        self,
        frames,  # (F, H, W, 3) uint8 (np or device)
        boxes,  # (F, K, 4)
        valid,  # (F, K) bool
        class_ids,  # (F, K) int
        classes: Sequence[str],
        chunk: int = 4,
    ) -> np.ndarray:
        """Batched twin of __call__ over all detection frames of a clip
        -> keep (F, K) bool (False wherever `valid` is False). Same
        decision math as the per-frame host path; parity pinned by
        tests/test_clip_filter.py."""
        valid = np.asarray(valid, bool)
        if not valid.any():
            return np.zeros_like(valid)
        scores = self.score_frames_device(frames, boxes, classes,
                                          chunk=chunk)
        return self._decide(scores, class_ids, len(classes)) & valid

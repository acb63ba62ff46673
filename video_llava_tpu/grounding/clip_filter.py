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
from video_llava_tpu.ops.image import normalize_clip, resize_bicubic

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
        """-> keep mask (n,) bool."""
        if len(boxes) == 0:
            return np.zeros((0,), bool)
        w = self.zeroshot_weights(classes)
        emb = self.embed_crops(image, boxes)
        scores = np.asarray(emb @ w)  # (n, n_classes) cosine
        probs = np.asarray(jax.nn.softmax(100.0 * jnp.asarray(scores), axis=-1))
        idx = np.arange(len(boxes))
        cls = np.clip(class_ids, 0, len(classes) - 1)
        return (probs[idx, cls] > self.prob_threshold) & (
            scores[idx, cls] >= self.score_threshold
        )

"""Image tagging (RAM-style) on the JAX Swin backbone.

Parity: reference TaggingModule (grounding_evaluation/util/
image_tagging.py:8-50) — RAM Swin-L tags every frame at threshold 0.95;
`get_unique_tags` returns frequency-sorted unique tags. The reference's
module-level `string_counts` accumulates across videos (a documented
latent bug, image_tagging.py:52-59); here counts are per-call.

TPU design: all frames tag in ONE batched forward instead of the
reference's per-frame loop (image_tagging.py:44-47).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models import swin as swin_mod
from video_llava_tpu.models.layers import layer_norm, layer_norm_init, linear, linear_init
from video_llava_tpu.models.swin import SwinConfig


def init_tag_head(key, num_features: int, num_tags: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm": layer_norm_init(num_features, dtype),
        "proj": linear_init(k1, num_features, num_features, dtype=dtype),
        "head": linear_init(k2, num_features, num_tags, dtype=dtype),
    }


def tag_logits(backbone_params, head_params, pixels: jax.Array,
               cfg: SwinConfig) -> jax.Array:
    """(b, H, W, 3) -> (b, num_tags) logits."""
    feats = swin_mod.forward_features(backbone_params, pixels, cfg)[-1]
    b, hh, ww, c = feats.shape
    x = layer_norm(head_params["norm"], feats.reshape(b, hh * ww, c))
    x = jnp.mean(jax.nn.gelu(linear(head_params["proj"], x)), axis=1)
    return linear(head_params["head"], x)


class TaggingModule:
    """Batched frame tagger with a tag vocabulary."""

    def __init__(
        self,
        backbone_params,
        head_params,
        cfg: SwinConfig,
        tag_list: Sequence[str],
        threshold=0.95,  # scalar, or (num_tags,) per-tag thresholds as
        # shipped with the RAM release (class_threshold)
        logits_fn=None,
    ):
        self.backbone_params = backbone_params
        self.head_params = head_params
        self.cfg = cfg
        self.tag_list = list(tag_list)
        self.threshold = threshold
        self._fwd = jax.jit(
            logits_fn if logits_fn is not None
            else (lambda bp, hp, px: tag_logits(bp, hp, px, cfg))
        )

    @classmethod
    def with_ram_decoder(
        cls,
        backbone_params,
        ram_params,
        swin_cfg: SwinConfig,
        ram_cfg,
        tag_list: Sequence[str],
        threshold: float = 0.95,
    ):
        """RAM-architecture tagger: label-query cross-attention decoder
        (models/ram.py) instead of the pooled classifier head."""
        from video_llava_tpu.models import ram as ram_mod

        return cls(
            backbone_params,
            ram_params,
            swin_cfg,
            tag_list,
            threshold,
            logits_fn=lambda bp, hp, px: ram_mod.tag_logits(
                bp, hp, px, swin_cfg, ram_cfg
            ),
        )

    def run_on_frames(self, frames: np.ndarray) -> List[List[str]]:
        """frames: (t, H, W, 3) float normalized -> per-frame tag lists
        (reference run_on_video, image_tagging.py:40-50)."""
        probs = jax.nn.sigmoid(
            self._fwd(self.backbone_params, self.head_params, jnp.asarray(frames))
        )
        probs = np.asarray(probs)
        out = []
        for row in probs:
            idx = np.nonzero(row > self.threshold)[0]
            out.append([self.tag_list[i] for i in idx])
        return out

    def run_on_video(self, frames: np.ndarray, top_k: int = 10) -> List[str]:
        per_frame = self.run_on_frames(frames)
        return get_unique_tags(per_frame)[:top_k]


def get_unique_tags(per_frame_tags: Sequence[Sequence[str]]) -> List[str]:
    """Frequency-sorted unique tags across frames (reference
    image_tagging.py:55-71, with per-call counts instead of the global
    accumulator)."""
    counts = Counter()
    for tags in per_frame_tags:
        counts.update(tags)
    return [t for t, _ in counts.most_common()]

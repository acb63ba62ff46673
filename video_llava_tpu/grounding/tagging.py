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
        self._logits_fn = (
            logits_fn if logits_fn is not None
            else (lambda bp, hp, px: tag_logits(bp, hp, px, cfg))
        )
        self._fwd = jax.jit(self._logits_fn)
        self._raw_cache = {}

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
        return self._threshold_rows(probs)

    def _threshold_rows(self, probs: np.ndarray) -> List[List[str]]:
        out = []
        for row in probs:
            idx = np.nonzero(row > self.threshold)[0]
            out.append([self.tag_list[i] for i in idx])
        return out

    def _raw_fwd(self, image_size: int):
        """Jitted raw-uint8 forward: cast /255, bicubic resize to the
        RAM inference size, imagenet-normalize, Swin forward — ONE
        device program per batch shape. Matches the reference RAM
        transform (Resize(384) + ToTensor + Normalize(imagenet),
        recognize-anything inference pipeline) while transferring raw
        bytes (4x less host->device traffic than host-side f32)."""
        fn = self._raw_cache.get(image_size)
        if fn is None:
            from video_llava_tpu.ops.image import resize_bicubic

            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            inner = self._logits_fn

            def run(bp, hp, raw):
                x = resize_bicubic(
                    raw.astype(jnp.float32) / 255.0, image_size, image_size
                )
                x = (jnp.clip(x, 0.0, 1.0) - mean) / std
                # match the backbone dtype (bf16 backbones would other-
                # wise force f32 mixed-precision dots)
                leaves = jax.tree.leaves(bp)
                if leaves:
                    x = x.astype(leaves[0].dtype)
                return inner(bp, hp, x)

            fn = jax.jit(run)
            self._raw_cache[image_size] = fn
        return fn

    def run_on_frames_raw(
        self, frames: np.ndarray, image_size: int = 384,
        batch_size: int = 20,
    ) -> List[List[str]]:
        """frames: (t, H, W, 3) uint8 RGB — np, or a device-resident
        jax array (grounded chat shares ONE clip upload across tagging
        and tracking). Per-frame tag lists, with all preprocessing on
        device. Frames run in fixed-size batches (last one pads by
        repetition) so any clip length reuses one compiled program."""
        fn = self._raw_fwd(image_size)
        xp = jnp if isinstance(frames, jax.Array) else np
        t = len(frames)
        rows = []
        for s in range(0, t, batch_size):
            chunk = frames[s : s + batch_size]
            if xp is np:
                chunk = np.asarray(chunk)
            n = len(chunk)
            if n < batch_size:
                chunk = xp.concatenate(
                    [chunk, xp.repeat(chunk[-1:], batch_size - n, axis=0)]
                )
            probs = jax.nn.sigmoid(
                fn(self.backbone_params, self.head_params,
                   jnp.asarray(chunk))
            )
            rows.append(np.asarray(probs)[:n])
        return self._threshold_rows(np.concatenate(rows, axis=0))

    def run_on_video(self, frames: np.ndarray, top_k: int = 10) -> List[str]:
        if frames.dtype == np.uint8:
            per_frame = self.run_on_frames_raw(frames)
        else:
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

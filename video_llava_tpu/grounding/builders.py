"""Assembly of the grounding stack (detector + SAM + CLIP filter +
tagger + tracker + entity matching).

Checkpoint dirs are optional everywhere: absent weights fall back to
random init so the full pipeline stays runnable (and testable) in
air-gapped environments; real checkpoints drop in via the same HF
converters used in the parity tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.grounding.clip_filter import ClipCropFilter
from video_llava_tpu.grounding.entity_matching import EntityMatchingModule
from video_llava_tpu.grounding.memory_tracker import TrackerConfig
from video_llava_tpu.grounding.tagging import TaggingModule, init_tag_head
from video_llava_tpu.grounding.tracker import GroundedTracker
from video_llava_tpu.models import clip as clip_mod
from video_llava_tpu.models import sam as sam_mod
from video_llava_tpu.models import swin as swin_mod
from video_llava_tpu.models.sam import SamConfig, SamVisionConfig
from video_llava_tpu.models.swin import SwinConfig
from video_llava_tpu.ops.image import normalize_clip, resize_bicubic

# A small default tag vocabulary (the RAM checkpoint ships its own
# 4,585-tag list; loaded from file when available).
DEFAULT_TAG_LIST = [
    "person", "man", "woman", "child", "dog", "cat", "car", "bicycle",
    "tree", "building", "table", "chair", "food", "water", "road",
    "grass", "sky", "ball", "phone", "guitar",
]


class SamSegmenter:
    """segmenter(image, boxes) -> (n, H, W) masks: best-of-3 multimask
    by predicted IoU (reference grounding_new_api.py:410-418).

    The heavy ViT encoder and the light prompt+mask decoder are separate
    jits: `precompute_embeddings` batch-encodes known-upfront frames
    (the tracker's detection frames) so per-frame calls run only the
    decoder against the cached embedding — the encoder cost amortizes
    over the MXU batch dim exactly like batched detection."""

    # GroundedTracker feature-detects this to pass frame_index through.
    supports_frame_cache = True

    def __init__(self, params, cfg: SamConfig, encode_batch_size: int = 4,
                 encode_fn=None):
        """encode_fn(params, pixels) -> (b, g, g, d) image embeddings;
        defaults to the SAM ViT encoder. The MobileSAM variant plugs the
        TinyViT encoder here — prompt encoder and mask decoder are
        byte-identical between the two (reference runs MobileSAM as its
        live default, grounding_new_api.py:104)."""
        self.params = params
        self.cfg = cfg
        self.encode_batch_size = encode_batch_size
        if encode_fn is None:
            encode_fn = lambda p, px: sam_mod.vision_encoder(  # noqa: E731
                p["vision"], px, cfg.vision
            )
        self._encode = jax.jit(encode_fn)
        self._decode = jax.jit(
            lambda p, e, bx: sam_mod.predict_from_embeddings(p, e, bx, cfg)
        )
        # preprocess + encode fused into ONE device program taking RAW
        # uint8 frames: one (cheap) host->device transfer and one
        # dispatch per batch, with the f32 cast / resize / normalize on
        # device (the eager composition cost ~5 host round trips and a
        # 4x larger transfer per frame over a tunneled TPU).
        size = cfg.vision.image_size
        dtype = next(iter(jax.tree.leaves(params))).dtype

        def _prep(raw):  # (k, H, W, 3) uint8 -> (k, size, size, 3)
            x = resize_bicubic(raw.astype(jnp.float32), size, size)
            return normalize_clip(
                jnp.clip(jnp.round(x), 0, 255)
            ).astype(dtype)

        self._encode_raw = jax.jit(
            lambda p, raw: encode_fn(p, _prep(raw))
        )
        self._emb_cache: dict = {}
        self._batch_decode_cache: dict = {}

    def _preprocess(self, image: np.ndarray) -> jnp.ndarray:
        size = self.cfg.vision.image_size
        return normalize_clip(
            jnp.clip(
                jnp.round(
                    resize_bicubic(
                        jnp.asarray(image.astype(np.float32)), size, size
                    )
                ),
                0,
                255,
            )
        ).astype(next(iter(jax.tree.leaves(self.params))).dtype)

    def precompute_embeddings(
        self, frames, frame_indices, batch_size: Optional[int] = None
    ) -> None:
        """Encode `frames[i]` for i in frame_indices in fixed-size
        batches, caching per-frame embeddings for later __call__s. The
        last chunk pads by repetition so every chunk compiles once."""
        k = batch_size or self.encode_batch_size
        idx = [i for i in frame_indices if i not in self._emb_cache]
        for start in range(0, len(idx), k):
            chunk = idx[start : start + k]
            padded = chunk + [chunk[-1]] * (k - len(chunk))
            raw = np.stack([np.asarray(frames[i]) for i in padded])
            emb = self._encode_raw(self.params, jnp.asarray(raw))
            for j, i in enumerate(chunk):
                self._emb_cache[i] = emb[j : j + 1]

    def decode_masks_batch_device(
        self, frames, boxes: np.ndarray,
        out_hw: Optional[Tuple[int, int]] = None,
    ):
        """Batched box->mask decode whose output STAYS ON DEVICE — the
        producer side of the fused whole-clip tracker (grounding/
        fused_clip.py), where detection masks feed the clip scan without
        ever visiting the host.

        frames: (F, H, W, 3) uint8 — np, or a device-resident jax array
        (the fused path slices its single clip upload; no second
        host->device transfer). boxes: (F, K, 4) xyxy pixel coords
        (padded rows arbitrary — callers carry a validity mask).
        Returns jax (F, K, Hp, Wp) uint8 {0,1} where (Hp, Wp) =
        out_hw or (H, W) (zero-padded bottom/right, matching the
        tracker's stride-16 frame padding). Same mask math as __call__:
        best-IoU head, >0 threshold, nearest upsample from the mask
        grid."""
        xp = jnp if isinstance(frames, jax.Array) else np
        if xp is np:
            frames = np.asarray(frames)
        f_count, H, W = frames.shape[:3]
        hp, wp = out_hw or (H, W)
        size = self.cfg.vision.image_size
        k = self.encode_batch_size
        embs = []
        for s in range(0, f_count, k):
            chunk = frames[s : s + k]
            n = len(chunk)
            if n < k:
                chunk = xp.concatenate(
                    [chunk, xp.repeat(chunk[-1:], k - n, axis=0)]
                )
            embs.append(self._encode_raw(self.params, jnp.asarray(chunk))[:n])
        emb = jnp.concatenate(embs, axis=0)
        scale = np.asarray(
            [size / W, size / H, size / W, size / H], np.float32
        )
        scaled = jnp.asarray(np.asarray(boxes, np.float32) * scale)

        key = (H, W, hp, wp)
        fn = self._batch_decode_cache.get(key)
        if fn is None:
            cfg = self.cfg

            def decode(params, emb, bx):
                masks, iou = sam_mod.predict_from_embeddings(
                    params, emb, bx, cfg
                )  # (F, K, 3, g, g), (F, K, 3)
                best = jnp.argmax(iou, axis=-1)
                m = jnp.take_along_axis(
                    masks, best[..., None, None, None], axis=2
                )[:, :, 0]  # (F, K, g, g)
                g = m.shape[-1]
                ys = jnp.clip(jnp.arange(H) * g // H, 0, g - 1)
                xs = jnp.clip(jnp.arange(W) * g // W, 0, g - 1)
                up = (m[:, :, ys][:, :, :, xs] > 0).astype(jnp.uint8)
                return jnp.pad(
                    up, ((0, 0), (0, 0), (0, hp - H), (0, wp - W))
                )

            fn = jax.jit(decode)
            self._batch_decode_cache[key] = fn

        # decode in frame sub-chunks: the box-repeated embedding inside
        # predict_from_embeddings is (F*K, g, g, d) — chunking bounds the
        # transient without any host fetch between dispatches.
        outs = [
            fn(self.params, emb[s : s + 4], scaled[s : s + 4])
            for s in range(0, f_count, 4)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def num_cached_embeddings(self) -> int:
        """Resident precomputed embeddings (the tracker's sliding-window
        prefetch bounds this at its emb_prefetch_frames)."""
        return len(self._emb_cache)

    def discard_embedding(self, frame_index) -> None:
        self._emb_cache.pop(frame_index, None)

    def clear_cache(self) -> None:
        self._emb_cache = {}

    def __call__(
        self, image: np.ndarray, boxes: np.ndarray,
        frame_index: Optional[int] = None,
    ) -> np.ndarray:
        H, W = image.shape[:2]
        size = self.cfg.vision.image_size
        emb = (
            self._emb_cache.pop(frame_index, None)
            if frame_index is not None else None
        )
        if emb is None:
            emb = self._encode_raw(self.params, jnp.asarray(image)[None])
        scale_x, scale_y = size / W, size / H
        scaled = boxes.astype(np.float32) * np.array(
            [scale_x, scale_y, scale_x, scale_y], np.float32
        )
        # Pad the box count to a power-of-2 bucket: detection counts
        # vary per frame, and an unpadded (1, n, 4) prompt shape would
        # recompile the decoder for every distinct n (XLA static
        # shapes). Padded boxes decode garbage masks that are sliced
        # off below; each box decodes independently so real masks are
        # unaffected.
        n = len(scaled)
        bucket = max(1, 1 << (n - 1).bit_length()) if n else 1
        if bucket > n:
            scaled = np.concatenate(
                [scaled, np.zeros((bucket - n, 4), np.float32)]
            )
        masks, iou = self._decode(
            self.params, emb, jnp.asarray(scaled)[None]
        )
        masks = np.asarray(masks[0])[:n]  # (n, 3, g, g)
        iou = np.asarray(iou[0])[:n]
        best = iou.argmax(axis=1)
        out = np.zeros((len(boxes), H, W), np.float32)
        for i, b in enumerate(best):
            m = masks[i, b] > 0
            # nearest upsample from mask grid to frame size
            g = m.shape[0]
            ys = (np.arange(H) * g // H).clip(0, g - 1)
            xs = (np.arange(W) * g // W).clip(0, g - 1)
            out[i] = m[np.ix_(ys, xs)].astype(np.float32)
        return out


def build_sam(checkpoint_dir: Optional[str] = None,
              cfg: Optional[SamConfig] = None,
              variant: str = "mobile",
              tiny_cfg=None) -> SamSegmenter:
    """variant='mobile' (DEFAULT — the reference's live config,
    grounding_new_api.py:104 sets cfg['sam_variant']='mobile'): TinyViT-5M
    image encoder + the standard SAM prompt/mask decoder, ~10x cheaper
    than ViT-B at 1024px. checkpoint may be the official `mobile_sam.pt`
    file (image_encoder.* TinyViT keys + official prompt_encoder/
    mask_decoder keys) or a dir of shards.

    variant='vit_b' (or 'vit'): SAM ViT image encoder from an HF
    SamModel state dict (facebook/sam-vit-*)."""
    if variant == "mobile":
        from video_llava_tpu.models import tiny_vit as tv

        tiny_cfg = tiny_cfg or tv.TinyViTConfig()
        cfg = cfg or SamConfig(
            vision=dataclasses.replace(
                SamConfig().vision, image_size=tiny_cfg.image_size
            )
        )
        if checkpoint_dir:
            import os

            from video_llava_tpu.engine.weights import (
                load_checkpoint_dir,
                load_torch_checkpoint_file,
            )

            sd = (
                load_torch_checkpoint_file(checkpoint_dir)
                if os.path.isfile(checkpoint_dir)
                else load_checkpoint_dir(checkpoint_dir)
            )
            params = {"vision": tv.convert_tiny_vit(sd, tiny_cfg)}
            params.update(sam_mod.convert_official_sam_decoder(sd, cfg))
        else:
            import warnings

            warnings.warn("MobileSAM weights not provided; using random init")
            params = {
                "vision": tv.init_params(jax.random.PRNGKey(0), tiny_cfg)
            }
            params.update(_random_sam_decoder_params(cfg))
        encode_fn = (
            lambda p, px: tv.encoder(p["vision"], px, tiny_cfg)  # noqa: E731
        )
        return SamSegmenter(params, cfg, encode_fn=encode_fn)

    cfg = cfg or SamConfig()
    if checkpoint_dir:
        from video_llava_tpu.engine.weights import load_checkpoint_dir

        sd = load_checkpoint_dir(checkpoint_dir)
        params = sam_mod.convert_hf_sam(sd, cfg)
    else:
        # random init keeps the pipeline runnable without weights
        import warnings

        warnings.warn("SAM weights not provided; using random init")
        params = _random_sam_params(cfg)
    return SamSegmenter(params, cfg)


def _random_sam_decoder_params(cfg: SamConfig):
    """Random prompt-encoder + mask-decoder params (converter layout),
    built through the HF module with a throwaway tiny vision tower so
    the init distribution matches _random_sam_params."""
    src = _random_sam_params(
        dataclasses.replace(
            cfg,
            vision=SamVisionConfig(
                image_size=64, patch_size=8, hidden_size=32, num_layers=1,
                num_heads=2, mlp_dim=64, window_size=2,
                global_attn_indexes=(0,),
                output_channels=cfg.prompt_hidden,
            ),
        )
    )
    return {k: v for k, v in src.items() if k != "vision"}


def _random_sam_params(cfg: SamConfig):
    """Random SAM params with the converter's layout."""
    import torch
    import transformers

    hf = transformers.SamModel(
        transformers.SamConfig(
            vision_config=dict(
                hidden_size=cfg.vision.hidden_size,
                num_hidden_layers=cfg.vision.num_layers,
                num_attention_heads=cfg.vision.num_heads,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
                global_attn_indexes=list(cfg.vision.global_attn_indexes),
                window_size=cfg.vision.window_size,
                mlp_dim=cfg.vision.mlp_dim,
                output_channels=cfg.vision.output_channels,
                num_pos_feats=cfg.prompt_hidden // 2,
            ),
            prompt_encoder_config=dict(
                hidden_size=cfg.prompt_hidden,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
            ),
            mask_decoder_config=dict(
                hidden_size=cfg.prompt_hidden,
                num_attention_heads=cfg.decoder_heads,
                mlp_dim=cfg.decoder_mlp_dim,
            ),
        )
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    return sam_mod.convert_hf_sam(sd, cfg)


def build_tagger(
    swin_checkpoint: Optional[str] = None,
    tag_list: Sequence[str] = DEFAULT_TAG_LIST,
    cfg: Optional[SwinConfig] = None,
    ram_checkpoint: Optional[str] = None,
    tag_list_path: Optional[str] = None,
    threshold_path: Optional[str] = None,
) -> TaggingModule:
    """Tagger assembly.

    ram_checkpoint: released RAM state dict (ram_swin_large_14m.pth
    layout) — loads backbone + q2l decoder + per-tag thresholds via
    models/ram.py convert_ram_checkpoint; tag_list_path /
    threshold_path point at the released ram_tag_list(.threshold).txt
    files. Without it, falls back to an HF Swin backbone (or random
    init) with a linear tag head.
    """
    cfg = cfg or SwinConfig.swin_l()
    if ram_checkpoint:
        import os

        from video_llava_tpu.engine.weights import (
            load_checkpoint_dir,
            load_torch_checkpoint_file,
        )
        from video_llava_tpu.models import ram as ram_mod

        sd = (
            load_torch_checkpoint_file(ram_checkpoint)
            if os.path.isfile(ram_checkpoint)
            else load_checkpoint_dir(ram_checkpoint)
        )
        ram_cfg = ram_mod.infer_ram_config(sd)
        backbone, ram_params, thresholds = ram_mod.convert_ram_checkpoint(
            sd, cfg, ram_cfg
        )
        tags = (
            ram_mod.load_tag_list(tag_list_path)
            if tag_list_path
            else list(tag_list)
        )
        if len(tags) != ram_cfg.num_tags:
            raise ValueError(
                f"tag list has {len(tags)} entries but the checkpoint "
                f"predicts {ram_cfg.num_tags} tags — pass the release's "
                "ram_tag_list.txt via tag_list_path"
            )
        if threshold_path:
            thresholds = ram_mod.load_tag_thresholds(
                threshold_path, len(tags)
            )
        return TaggingModule.with_ram_decoder(
            backbone, ram_params, cfg, ram_cfg, tags, threshold=thresholds
        )
    if swin_checkpoint:
        from video_llava_tpu.engine.weights import load_checkpoint_dir

        sd = load_checkpoint_dir(swin_checkpoint)
        backbone = swin_mod.convert_hf_swin(sd, cfg)
    else:
        backbone = swin_mod.init_params(jax.random.PRNGKey(0), cfg)
    head = init_tag_head(jax.random.PRNGKey(1), cfg.num_features, len(tag_list))
    return TaggingModule(backbone, head, cfg, tag_list)


def random_clip_filter(
    seed: int = 0, dtype=jnp.float32,
    prob_threshold: float = 0.1, score_threshold: float = 0.2,
) -> ClipCropFilter:
    """Random-weight ViT-B/32 crop filter with a deterministic hash
    tokenizer — NOT for quality (random towers score noise), but the
    exact compute/transfer shape of the real filter: benches time it,
    tests pin device-vs-host parity with it."""
    vcfg = CLIPVisionConfig.b32()
    tcfg = CLIPTextConfig.b32()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    vparams = clip_mod.init_vision_params(k1, vcfg, dtype)
    tparams = clip_mod.init_text_params(k2, tcfg, dtype)
    proj = jax.random.normal(
        k3, (vcfg.hidden_size, vcfg.projection_dim), dtype
    ) * (vcfg.hidden_size ** -0.5)

    import zlib

    def tokenize(s: str):
        # deterministic (crc32 — Python's hash() is per-process
        # salted), vocabulary-bounded; EOT = max vocab id so
        # text_forward's argmax pooling lands on it (OpenAI convention)
        ids = [
            zlib.crc32(w.encode()) % (tcfg.vocab_size - 2) + 1
            for w in s.split()
        ]
        return ids[: tcfg.max_position_embeddings - 1] + [
            tcfg.vocab_size - 1
        ]

    return ClipCropFilter(
        vparams, vcfg, tparams, tcfg, tokenize=tokenize,
        visual_projection={"kernel": proj},
        prob_threshold=prob_threshold,
        score_threshold=score_threshold,
    )


def build_clip_filter(
    clip_checkpoint: Optional[str] = None,
) -> Optional[ClipCropFilter]:
    """CLIP zero-shot crop filter; None without weights or a real
    tokenizer (scores from random towers would be noise)."""
    if not clip_checkpoint:
        return None
    from transformers import AutoTokenizer

    from video_llava_tpu.engine.weights import (
        convert_clip_text,
        convert_clip_vision,
        load_checkpoint_dir,
    )

    sd = load_checkpoint_dir(clip_checkpoint)
    vcfg = CLIPVisionConfig()
    tcfg = CLIPTextConfig()
    vparams = convert_clip_vision(sd, vcfg)
    tparams = convert_clip_text(sd, tcfg)
    import numpy as _np

    vproj = {"kernel": _np.ascontiguousarray(sd["visual_projection.weight"].T)}
    tok = AutoTokenizer.from_pretrained(clip_checkpoint)
    return ClipCropFilter(
        vparams, vcfg, tparams, tcfg,
        tokenize=lambda s: tok(s).input_ids,
        visual_projection={"kernel": jnp.asarray(vproj["kernel"])},
    )


def build_grounding_stack(
    dino_checkpoint: Optional[str] = None,
    sam_checkpoint: Optional[str] = None,
    swin_checkpoint: Optional[str] = None,
    clip_checkpoint: Optional[str] = None,
    xmem_checkpoint: Optional[str] = None,
    detection_every: int = 5,
    temporal_setting: str = "online",
    max_objects: int = 5,
    sam_variant: str = "mobile",
) -> Tuple[GroundedTracker, TaggingModule, EntityMatchingModule]:
    """Wire the full PGVideoLLaVA grounding stack
    (reference chat.py:243-252). sam_variant defaults to 'mobile'
    exactly like the reference's live config (grounding_new_api.py:104).

    xmem_checkpoint: optional XMem/DEVA-propagation .pth — switches mask
    propagation from the handcrafted-feature STM to the trained XMem
    network (reference deva.step, grounding_new_api.py:503-509)."""
    from video_llava_tpu.models import grounding_dino as gdino_mod

    detector = gdino_mod.build_detector(dino_checkpoint)
    segmenter = build_sam(sam_checkpoint, variant=sam_variant)
    crop_filter = build_clip_filter(clip_checkpoint)
    propagator = None
    if xmem_checkpoint:
        import os

        import torch

        from video_llava_tpu.grounding.memory_tracker import (
            LearnedMemoryTracker,
        )
        from video_llava_tpu.models import xmem as xmem_mod

        if os.path.isfile(xmem_checkpoint):
            sd = torch.load(xmem_checkpoint, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "network" in sd:
                sd = sd["network"]
            cfg = xmem_mod.XMemConfig(max_objects=max_objects)
            propagator = LearnedMemoryTracker(
                xmem_mod.convert_xmem_checkpoint(sd, cfg), cfg
            )
        else:
            import warnings

            warnings.warn(f"xmem checkpoint {xmem_checkpoint} not found; "
                          "using handcrafted-feature propagation")
    tracker = GroundedTracker(
        detector=detector,
        segmenter=segmenter,
        crop_filter=crop_filter,
        detection_every=detection_every,
        temporal_setting=temporal_setting,
        tracker_cfg=TrackerConfig(max_objects=max_objects),
        propagator=propagator,
    )
    tagger = build_tagger(swin_checkpoint)
    matcher = EntityMatchingModule()
    return tracker, tagger, matcher

"""VideoLLaVA: CLIP vision tower + mm_projector + Vicuna LM.

Parity target: reference VideoChatGPTLlamaForCausalLM
(video_chatgpt/model/video_chatgpt.py:82-251). The reference splices
projected video features into the token embeddings with a per-sample
Python loop (:110-168); here the splice is a fully vectorized
mask+cumsum gather that works for any placement of the <vid_patch>
block, compiles once, and batches freely.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_tpu.config import VideoLLaVAConfig
from video_llava_tpu.constants import IGNORE_INDEX
from video_llava_tpu.models import clip, llama, projector
from video_llava_tpu.models.layers import embed
from video_llava_tpu.models.llama import KVCache
from video_llava_tpu.ops.pooling import spatio_temporal_pool


def init_params(key, cfg: VideoLLaVAConfig, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision": clip.init_vision_params(k1, cfg.vision, dtype),
        "projector": projector.init_params(k2, cfg.projector, dtype),
        "llm": llama.init_params(k3, cfg.llm, dtype),
    }


def encode_video(
    params,
    pixels: jax.Array,
    cfg: VideoLLaVAConfig,
    num_valid_frames: Optional[jax.Array] = None,
    frame_batch: int = 0,
) -> jax.Array:
    """(t, H, W, 3) normalized frames -> pooled spatio-temporal features
    (video_token_len, mm_hidden): CLIP penultimate patches + pooling
    (reference inference.py:92-95). The fused Pallas pooling kernel runs
    on a single TPU chip; under a registered multi-chip mesh the
    shard_map wrapper keeps it fused per-shard (frame axis on 'data',
    spatial partials psum'd); CPU paths use the XLA formulation."""
    import jax as _jax

    feats = clip.encode_frames(params["vision"], pixels, cfg.vision, frame_batch)
    if _jax.default_backend() == "tpu" and _jax.device_count() == 1:
        from video_llava_tpu.ops.pooling import spatio_temporal_pool_pallas

        return spatio_temporal_pool_pallas(
            feats,
            num_valid_frames=num_valid_frames,
            max_temporal_tokens=cfg.max_temporal_tokens,
            out_dtype=feats.dtype,
        )
    from video_llava_tpu.ops.pooling import get_pooling_mesh

    mesh = get_pooling_mesh()
    if mesh is not None and "data" in mesh.shape:
        from video_llava_tpu.ops.pooling import spatio_temporal_pool_sharded

        return spatio_temporal_pool_sharded(
            feats,
            num_valid_frames,
            mesh,
            max_temporal_tokens=cfg.max_temporal_tokens,
            out_dtype=feats.dtype,
            interpret=_jax.default_backend() != "tpu",
        )
    return spatio_temporal_pool(
        feats,
        num_valid_frames=num_valid_frames,
        max_temporal_tokens=cfg.max_temporal_tokens,
        out_dtype=feats.dtype,
    )


def splice_video_embeddings(
    token_embeds: jax.Array,
    input_ids: jax.Array,
    video_features: jax.Array,
    vid_patch_token_id: int,
) -> jax.Array:
    """Replace embeddings at <vid_patch> positions with video features.

    token_embeds: (b, s, d); input_ids: (b, s);
    video_features: (b, n_video_tokens, d).

    Vectorized scatter replacing the reference's per-sample Python loop
    (video_chatgpt.py:110-168): the j-th patch token of each row takes
    video_features[:, j]. Works for non-multimodal rows too (mask is
    empty -> embeddings unchanged), which also supersedes the
    reference's dummy-feature gradient trick (:107-117) — in JAX the
    projector gradient is simply zero for those rows.
    """
    mask = input_ids == vid_patch_token_id  # (b, s)
    n = video_features.shape[1]
    # Index of each position within its row's patch-token block.
    order = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    order = jnp.clip(order, 0, n - 1)
    gathered = jnp.take_along_axis(
        video_features, order[:, :, None], axis=1
    )  # (b, s, d)
    return jnp.where(mask[:, :, None], gathered.astype(token_embeds.dtype), token_embeds)


def build_inputs_embeds(
    params,
    input_ids: jax.Array,
    video_features: Optional[jax.Array],
    cfg: VideoLLaVAConfig,
) -> jax.Array:
    """Token embeddings with projected video features spliced in.

    video_features: raw pooled CLIP features (b, video_token_len,
    mm_hidden) — projection happens here (video_chatgpt.py:100-104).
    """
    embeds = embed(params["llm"]["embed_tokens"], input_ids)
    if video_features is not None:
        projected = projector.apply(
            params["projector"], video_features, cfg.projector
        )
        embeds = splice_video_embeddings(
            embeds, input_ids, projected, cfg.vid_patch_token_id
        )
    return embeds


def forward(
    params,
    cfg: VideoLLaVAConfig,
    input_ids: jax.Array,
    video_features: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    new_length: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[KVCache]]:
    """Multimodal LM forward.

    Returns (logits fp32 (b, s, vocab), loss or None, updated cache).
    Loss is the shifted masked CE of the reference
    (video_chatgpt.py:225-239) with IGNORE_INDEX label masking.
    """
    embeds = build_inputs_embeds(params, input_ids, video_features, cfg)
    logits, new_cache = llama.forward(
        params["llm"], cfg.llm, inputs_embeds=embeds, cache=cache,
        new_length=new_length, remat=remat,
    )
    loss = None
    if labels is not None:
        loss = shifted_cross_entropy(logits, labels)
    return logits, loss, new_cache


def shifted_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE of logits[:, :-1] vs labels[:, 1:], ignoring IGNORE_INDEX."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[:, :, None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_logp, 0.0)) / n


class PrefillResult(NamedTuple):
    logits_last: jax.Array  # (b, vocab) logits at each row's last real token
    cache: KVCache


def prefill(
    params,
    cfg: VideoLLaVAConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    video_features: Optional[jax.Array],
    max_cache_len: int,
    cache_dtype=jnp.bfloat16,
    mesh=None,
) -> PrefillResult:
    """Prefill a right-padded batch into a fresh KV cache.

    input_ids: (b, s_pad); seq_lens: (b,) real lengths. The returned
    logits are taken at position seq_lens-1 of each row (the next-token
    logits), and cache.length = seq_lens.

    mesh: optional jax.sharding.Mesh — pins the fresh cache to the
    ('data', 'model') inference layout (parallel/sharding.cache_spec);
    the decode loop inherits the layout from this operand.
    """
    b, s = input_ids.shape
    cache = KVCache.create(cfg.llm, b, max_cache_len, cache_dtype)
    if mesh is not None:
        from video_llava_tpu.parallel.sharding import constrain_kv_cache

        cache = constrain_kv_cache(cache, mesh)
    embeds = build_inputs_embeds(params, input_ids, video_features, cfg)
    logits, new_cache = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        positions=jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s)),
        cache=cache,
        new_length=seq_lens,
    )
    last = jnp.take_along_axis(
        logits, (seq_lens - 1)[:, None, None], axis=1
    )[:, 0]
    return PrefillResult(logits_last=last, cache=new_cache)

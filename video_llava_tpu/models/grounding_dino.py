"""Grounding DINO (open-vocabulary detector) in pure-functional JAX.

Replaces the reference's GroundingDINO dependency — the text-prompted
detector inside the grounding tracker (grounding_evaluation/
grounding_new_api.py:25,288,393-398) whose multi-scale deformable
attention is a CUDA kernel there and ops/deformable.py here.

Architecture (matching HF GroundingDinoForObjectDetection so official
checkpoints convert 1:1):
  Swin backbone (3 stages + 1 extra stride-2 conv level)  ─┐
  BERT text backbone + projection                          ├─ encoder
  (6 x [bi-attention fusion, text enhancer, deformable])  ─┘
  two-stage query selection (top-900 proposals)  →  decoder
  (6 x [self-attn, text cross-attn, deformable cross-attn])
  contrastive class head (query·text) + box-refinement MLP.

Simplification vs HF: batches are same-size unpadded images (our video
pipeline resizes frames), so pixel masks / valid ratios are identity.
Text masks (special-token block-diagonal self-attention, padding) are
implemented in full.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models import bert as bert_mod
from video_llava_tpu.models import swin as swin_mod
from video_llava_tpu.models.bert import BertConfig
from video_llava_tpu.models.layers import layer_norm, linear
from video_llava_tpu.models.swin import SwinConfig
from video_llava_tpu.ops.deformable import multi_scale_deformable_attention
from video_llava_tpu.ops.image import normalize_clip, resize_bicubic

# BERT ids for [CLS], [SEP], '.', '?' (prompt phrase separators).
SPECIAL_TOKENS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    num_feature_levels: int = 4
    max_text_len: int = 256
    layer_norm_eps: float = 1e-5
    positional_embedding_temperature: float = 20.0
    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig.swin_t)
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    # Swin stages used as feature maps (HF out_indices [2, 3, 4]).
    backbone_stage_indices: Tuple[int, ...] = (1, 2, 3)

    @classmethod
    def tiny_test(cls):
        return cls(
            d_model=32,
            num_queries=20,
            encoder_layers=2,
            decoder_layers=2,
            encoder_attention_heads=4,
            decoder_attention_heads=4,
            encoder_ffn_dim=64,
            decoder_ffn_dim=64,
            num_feature_levels=3,
            max_text_len=32,
            swin=SwinConfig.tiny_test(),
            text=BertConfig.tiny_test(),
            backbone_stage_indices=(0, 1),
        )


# -- host-side text mask construction ------------------------------------------


def generate_text_masks(input_ids: np.ndarray):
    """Block-diagonal self-attention between special tokens + restarted
    position ids (HF generate_masks_with_special_tokens_and_transfer_map)."""
    b, n = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKENS)
    attention_mask = np.eye(n, dtype=bool)[None].repeat(b, axis=0)
    position_ids = np.zeros((b, n), np.int64)
    for row in range(b):
        previous_col = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                attention_mask[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attention_mask[
                    row, previous_col + 1 : col + 1, previous_col + 1 : col + 1
                ] = True
                position_ids[row, previous_col + 1 : col + 1] = np.arange(
                    0, col - previous_col
                )
            previous_col = col
    return attention_mask, position_ids


# -- positional encodings --------------------------------------------------------


def sine_position_2d(h: int, w: int, d_model: int, temperature: float) -> jnp.ndarray:
    """DETR-style sine pos embedding for an unpadded (h, w) map ->
    (h*w, d_model)."""
    half = d_model // 2
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)
    pos_x = x[:, None] / dim_t  # (w, half)
    pos_y = y[:, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, 0::2]), jnp.cos(pos_x[:, 1::2])], axis=2
                      ).reshape(w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, 0::2]), jnp.cos(pos_y[:, 1::2])], axis=2
                      ).reshape(h, -1)
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(pos_y[:, None, :], (h, w, half)),
            jnp.broadcast_to(pos_x[None, :, :], (h, w, half)),
        ],
        axis=-1,
    )
    return pos.reshape(h * w, d_model)


def get_sine_pos_embed(
    pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0,
    exchange_xy: bool = True,
) -> jnp.ndarray:
    """HF get_sine_pos_embed: (..., n) -> (..., n * num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    def sine(x):  # x: (..., 1)
        s = x * scale / dim_t
        return jnp.stack([jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])],
                         axis=-1).reshape(*x.shape[:-1], -1)

    parts = [sine(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


# -- small modules ---------------------------------------------------------------


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5):
    """x: (b, h, w, c) channel-last GroupNorm with torch semantics:
    statistics per (batch, group) over spatial dims AND the group's
    channels."""
    b, h, w, c = x.shape
    g = min(num_groups, c)
    xs = x.reshape(b, h * w, g, c // g).astype(jnp.float32)
    mean = xs.mean(axis=(1, 3), keepdims=True)
    var = xs.var(axis=(1, 3), keepdims=True)
    xs = (xs - mean) * jax.lax.rsqrt(var + eps)
    xs = xs.reshape(b, h, w, c)
    return (xs * p["scale"] + p["bias"]).astype(x.dtype)


def _mha(p, q, k, v, num_heads: int, bias=None):
    """Standard MHA with separate projections; bias: additive (b,h,q,k)."""
    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // num_heads
    qh = linear(p["q"], q).reshape(b, nq, num_heads, hd)
    kh = linear(p["k"], k).reshape(b, nk, num_heads, hd)
    vh = linear(p["v"], v).reshape(b, nk, num_heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return linear(p["o"], out.reshape(b, nq, d))


def _deformable_attention(
    p,
    hidden: jnp.ndarray,  # queries (b, nq, d)
    value_states: jnp.ndarray,  # (b, sum_hw, d)
    pos: Optional[jnp.ndarray],
    reference_points: jnp.ndarray,  # (b, nq, levels, 2 or 4)
    spatial_shapes: Sequence[Tuple[int, int]],
    num_heads: int,
    n_points: int,
):
    d = hidden.shape[-1]
    n_levels = len(spatial_shapes)
    if pos is not None:
        hidden = hidden + pos
    b, nq, _ = hidden.shape
    value = linear(p["value_proj"], value_states)
    value = value.reshape(b, -1, num_heads, d // num_heads)
    offsets = linear(p["sampling_offsets"], hidden).reshape(
        b, nq, num_heads, n_levels, n_points, 2
    )
    weights = linear(p["attention_weights"], hidden).reshape(
        b, nq, num_heads, n_levels * n_points
    )
    weights = jax.nn.softmax(weights, axis=-1).reshape(
        b, nq, num_heads, n_levels, n_points
    )
    nc = reference_points.shape[-1]
    if nc == 2:
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32
        )  # (levels, 2) as (w, h)
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
    else:
        locs = (
            reference_points[:, :, None, :, None, :2]
            + offsets / n_points * reference_points[:, :, None, :, None, 2:] * 0.5
        )
    out = multi_scale_deformable_attention(value, spatial_shapes, locs, weights)
    return linear(p["output_proj"], out)


# -- encoder/decoder layers --------------------------------------------------------


def _bi_attention(p, vision, text, text_pad_mask, num_heads: int, head_dim: int):
    """Bidirectional vision<->text cross attention (HF
    GroundingDinoBiMultiHeadAttention). Returns (delta_v, delta_t)."""
    b, nv, _ = vision.shape
    nt = text.shape[1]
    embed_dim = num_heads * head_dim
    scale = head_dim**-0.5

    vq = (linear(p["vision_proj"], vision) * scale).reshape(
        b, nv, num_heads, head_dim
    )
    tk = linear(p["text_proj"], text).reshape(b, nt, num_heads, head_dim)
    vv = linear(p["values_vision_proj"], vision).reshape(
        b, nv, num_heads, head_dim
    )
    tv = linear(p["values_text_proj"], text).reshape(b, nt, num_heads, head_dim)

    attn = jnp.einsum(
        "bvhd,bthd->bhvt", vq, tk, preferred_element_type=jnp.float32
    )
    attn = attn - jnp.max(attn)
    attn = jnp.clip(attn, -50000, 50000)
    attn_t = jnp.swapaxes(attn, 2, 3)  # (b, h, t, v)
    attn_t = attn_t - jnp.max(attn_t, axis=-1, keepdims=True)
    attn_t = jnp.clip(attn_t, -50000, 50000)

    # mask text (padding) for vision->text attention
    if text_pad_mask is not None:
        attn = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, attn)
    v_probs = jax.nn.softmax(attn, axis=-1)
    t_probs = jax.nn.softmax(attn_t, axis=-1)

    delta_v = jnp.einsum(
        "bhvt,bthd->bvhd", v_probs.astype(tv.dtype), tv,
        preferred_element_type=jnp.float32,
    ).astype(vision.dtype).reshape(b, nv, embed_dim)
    delta_t = jnp.einsum(
        "bhtv,bvhd->bthd", t_probs.astype(vv.dtype), vv,
        preferred_element_type=jnp.float32,
    ).astype(text.dtype).reshape(b, nt, embed_dim)
    return linear(p["out_vision_proj"], delta_v), linear(p["out_text_proj"], delta_t)


def _encoder_layer(
    p,
    cfg: GroundingDinoConfig,
    vision, text, vision_pos, reference_points, spatial_shapes,
    text_pad_mask, text_self_mask, text_position_ids,
):
    eps = cfg.layer_norm_eps
    # fusion (pre-LN + gated residual)
    vn = layer_norm(p["fusion"]["ln_vision"], vision, eps)
    tn = layer_norm(p["fusion"]["ln_text"], text, eps)
    fusion_heads = cfg.encoder_attention_heads // 2
    fusion_dim = cfg.encoder_ffn_dim // 2
    delta_v, delta_t = _bi_attention(
        p["fusion"], vn, tn, text_pad_mask, fusion_heads,
        fusion_dim // fusion_heads,
    )
    vision = vn + p["fusion"]["vision_param"] * delta_v
    text = tn + p["fusion"]["text_param"] * delta_t

    # text enhancer (self-attn with sine pos from restarted position ids)
    text_pos = get_sine_pos_embed(
        text_position_ids[..., None].astype(jnp.float32),
        num_pos_feats=cfg.d_model, exchange_xy=False,
    ).astype(text.dtype)
    q = text + text_pos
    bias = jnp.where(text_self_mask[:, None], 0.0, -jnp.inf)  # (b,1,s,s)
    attn = _mha(
        p["text_enhancer"]["attn"], q, q, text,
        cfg.encoder_attention_heads // 2, bias=bias,
    )
    text = layer_norm(p["text_enhancer"]["ln1"], text + attn, eps)
    h = jax.nn.relu(linear(p["text_enhancer"]["fc1"], text))
    text = layer_norm(
        p["text_enhancer"]["ln2"], text + linear(p["text_enhancer"]["fc2"], h), eps
    )

    # deformable self-attention on vision
    residual = vision
    attn = _deformable_attention(
        p["deformable"], vision, vision, vision_pos, reference_points,
        spatial_shapes, cfg.encoder_attention_heads, cfg.encoder_n_points,
    )
    vision = layer_norm(p["deformable"]["ln1"], residual + attn, eps)
    h = jax.nn.relu(linear(p["deformable"]["fc1"], vision))
    vision = layer_norm(
        p["deformable"]["ln2"], vision + linear(p["deformable"]["fc2"], h), eps
    )
    return vision, text


def _decoder_layer(
    p,
    cfg: GroundingDinoConfig,
    hidden, query_pos, reference_points_input, spatial_shapes,
    vision_states, text_states, text_pad_mask,
):
    eps = cfg.layer_norm_eps
    heads = cfg.decoder_attention_heads
    # self attention
    q = hidden + query_pos
    attn = _mha(p["self_attn"], q, q, hidden, heads)
    hidden = layer_norm(p["self_attn_ln"], hidden + attn, eps)
    # text cross attention
    q = hidden + query_pos
    bias = None
    if text_pad_mask is not None:
        bias = jnp.where(text_pad_mask[:, None, None, :], -1e9, 0.0)
    attn = _mha(p["text_cross_attn"], q, text_states, text_states, heads,
                bias=bias)
    hidden = layer_norm(p["text_cross_attn_ln"], hidden + attn, eps)
    # deformable cross attention
    attn = _deformable_attention(
        p["deform_cross_attn"], hidden, vision_states, query_pos,
        reference_points_input, spatial_shapes, heads, cfg.decoder_n_points,
    )
    hidden = layer_norm(p["deform_cross_attn_ln"], hidden + attn, eps)
    # ffn
    h = jax.nn.relu(linear(p["fc1"], hidden))
    hidden = layer_norm(p["final_ln"], hidden + linear(p["fc2"], h), eps)
    return hidden


def _mlp_head(p, x, num_layers: int = 3):
    for i in range(num_layers - 1):
        x = jax.nn.relu(linear(p[f"layer{i}"], x))
    return linear(p[f"layer{num_layers - 1}"], x)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# -- full model ---------------------------------------------------------------------


def forward(
    params,
    cfg: GroundingDinoConfig,
    pixels: jnp.ndarray,  # (b, H, W, 3) normalized
    input_ids: np.ndarray,  # (b, text_len) BERT ids (host array)
    text_attention_mask: Optional[np.ndarray] = None,  # (b, text_len) 1=real
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (logits (b, num_queries, max_text_len), boxes cxcywh in [0,1]
    (b, num_queries, 4)).

    Host wrapper: text masks derive from token VALUES (special-token
    block structure), so they are computed host-side; everything else is
    ONE jitted device program per (batch, image, text-len) shape — on a
    tunneled TPU the previous eager dispatch cost a host round trip per
    op across the whole detector."""
    input_ids = np.asarray(input_ids)
    if text_attention_mask is None:
        text_attention_mask = np.ones_like(input_ids)
    text_self_mask_np, position_ids_np = generate_text_masks(input_ids)
    return _forward_device(
        params,
        cfg,
        pixels,
        jnp.asarray(input_ids),
        jnp.asarray(text_attention_mask == 0),  # True = pad
        jnp.asarray(text_self_mask_np),
        jnp.asarray(position_ids_np),
        jnp.asarray(text_attention_mask == 1),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "stage"))
def _forward_device(
    params,
    cfg: GroundingDinoConfig,
    pixels: jnp.ndarray,
    input_ids: jnp.ndarray,
    text_pad_mask: jnp.ndarray,
    text_self_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    text_token_mask: jnp.ndarray,
    stage: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # `stage` truncates the program after a pipeline stage and returns
    # that stage's output — a profiling knob (scripts/profile_gdino.py):
    # successive-prefix timings decompose the forward without touching
    # the shipped stage=None program.
    b = pixels.shape[0]
    d = cfg.d_model
    eps = cfg.layer_norm_eps

    # text backbone (block-diagonal self-attention + restarted position
    # ids) + projection
    bert_bias = jnp.where(text_self_mask[:, None], 0.0, -1e9)
    text_features = bert_mod.forward(
        params["text_backbone"],
        input_ids,
        None,
        cfg.text,
        attention_bias=bert_bias,
        position_ids=position_ids,
    )
    text_features = linear(params["text_projection"], text_features)
    if stage == "text":
        return text_features, text_features

    # vision backbone: selected Swin stages (+ stage norms) + extra level
    stages = swin_mod.forward_features(params["swin"], pixels, cfg.swin)
    feature_maps = []
    for i, si in enumerate(cfg.backbone_stage_indices):
        f = stages[si]
        bb, hh, ww, cc = f.shape
        f = layer_norm(params["backbone_norms"][i], f, eps)
        feature_maps.append(f)
    # input projections (1x1 conv + GN) to d_model
    projected = []
    spatial_shapes: List[Tuple[int, int]] = []
    for i, f in enumerate(feature_maps):
        p = params["input_proj"][i]
        g = jnp.einsum("bhwc,co->bhwo", f, p["conv"]["kernel"]) + p["conv"]["bias"]
        g = group_norm(p["gn"], g)
        projected.append(g)
        spatial_shapes.append((g.shape[1], g.shape[2]))
    # extra levels: 3x3 stride-2 conv on the last backbone map
    src = feature_maps[-1]
    for i in range(len(cfg.backbone_stage_indices), cfg.num_feature_levels):
        p = params["input_proj"][i]
        src = jax.lax.conv_general_dilated(
            src, p["conv"]["kernel"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv"]["bias"]
        src = group_norm(p["gn"], src)
        projected.append(src)
        spatial_shapes.append((src.shape[1], src.shape[2]))

    # flatten + level embed + sine positions
    sources, pos_embeds = [], []
    for lvl, f in enumerate(projected):
        bb, hh, ww, cc = f.shape
        sources.append(f.reshape(bb, hh * ww, cc))
        pos = sine_position_2d(
            hh, ww, d, cfg.positional_embedding_temperature
        ).astype(f.dtype)
        pos_embeds.append(pos[None] + params["level_embed"][lvl][None, None])
    source_flatten = jnp.concatenate(sources, axis=1)
    pos_flatten = jnp.concatenate(
        [jnp.broadcast_to(p, (b,) + p.shape[1:]) for p in pos_embeds], axis=1
    )
    if stage == "backbone":
        return source_flatten, pos_flatten

    # encoder reference points: normalized grid centers per level,
    # replicated across levels (valid ratios = 1)
    refs = []
    for (hh, ww) in spatial_shapes:
        ys = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh
        xs = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    reference_points = jnp.concatenate(refs, axis=0)  # (sum_hw, 2)
    reference_points = jnp.broadcast_to(
        reference_points[None, :, None, :],
        (b, reference_points.shape[0], len(spatial_shapes), 2),
    )

    vision, text = source_flatten, text_features
    for lp in params["encoder_layers"]:
        vision, text = _encoder_layer(
            lp, cfg, vision, text, pos_flatten, reference_points,
            spatial_shapes, text_pad_mask, text_self_mask, position_ids,
        )
    if stage == "encoder":
        return vision, text

    # two-stage proposal generation
    proposals = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        gy, gx = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.float32), jnp.arange(ww, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([gx, gy], axis=-1)  # (h, w, 2) as (x, y)
        scale = jnp.asarray([ww, hh], jnp.float32)
        center = (grid + 0.5) / scale
        wh = jnp.full_like(center, 0.05 * (2.0**lvl))
        proposals.append(
            jnp.concatenate([center, wh], axis=-1).reshape(hh * ww, 4)
        )
    output_proposals = jnp.concatenate(proposals, axis=0)[None]  # (1, sum, 4)
    valid = jnp.all(
        (output_proposals > 0.01) & (output_proposals < 0.99), axis=-1,
        keepdims=True,
    )
    output_proposals = jnp.where(
        valid, _inverse_sigmoid(output_proposals), jnp.inf
    )
    object_query = jnp.where(valid, vision, 0.0)
    object_query = layer_norm(
        params["enc_output_norm"], linear(params["enc_output"], object_query),
        eps,
    )

    enc_logits = _contrastive(
        object_query, text, text_token_mask, cfg.max_text_len
    )
    delta = _mlp_head(params["encoder_bbox_head"], object_query)
    enc_coord_logits = delta + output_proposals

    topk = cfg.num_queries
    topk_scores = jnp.max(enc_logits, axis=-1)  # (b, sum)
    _, topk_idx = jax.lax.top_k(topk_scores, topk)
    topk_coords = jnp.take_along_axis(
        enc_coord_logits, topk_idx[:, :, None], axis=1
    )
    reference = jax.nn.sigmoid(topk_coords)  # (b, nq, 4)
    if stage == "two_stage":
        return reference, reference

    target = jnp.broadcast_to(
        params["query_embeds"][None], (b, topk, d)
    ).astype(vision.dtype)

    # decoder with iterative box refinement
    hidden = target
    for li, lp in enumerate(params["decoder_layers"]):
        ref_input = jnp.broadcast_to(
            reference[:, :, None, :], (b, topk, len(spatial_shapes), 4)
        )
        query_sine = get_sine_pos_embed(
            reference, num_pos_feats=d // 2
        )  # (b, nq, 2*d)
        query_pos = _mlp_head(
            params["ref_point_head"], query_sine, num_layers=2
        ).astype(hidden.dtype)
        hidden = _decoder_layer(
            lp, cfg, hidden, query_pos, ref_input, spatial_shapes, vision,
            text, text_pad_mask,
        )
        delta = _mlp_head(params["bbox_heads"][li], hidden)
        reference = jax.nn.sigmoid(delta + _inverse_sigmoid(reference))

    hidden = layer_norm(params["decoder_norm"], hidden, eps)
    logits = _contrastive(hidden, text, text_token_mask, cfg.max_text_len)
    return logits, reference


def _contrastive(queries, text, text_token_mask, max_text_len: int):
    out = jnp.einsum(
        "bqd,btd->bqt", queries, text, preferred_element_type=jnp.float32
    )
    out = jnp.where(text_token_mask[:, None, :], out, -jnp.inf)
    pad = max_text_len - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-jnp.inf)
    return out[..., :max_text_len]


# -- HF conversion --------------------------------------------------------------


def convert_hf_grounding_dino(sd, cfg: GroundingDinoConfig, dtype=jnp.float32):
    """transformers GroundingDinoForObjectDetection state dict -> params."""

    def t(w):
        return np.ascontiguousarray(w.T)

    def ln(prefix):
        return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}

    def lin(prefix):
        out = {"kernel": t(sd[prefix + "weight"])}
        if prefix + "bias" in sd:
            out["bias"] = sd[prefix + "bias"]
        return out

    def mha(prefix):
        # HF GroundingDinoMultiheadAttention uses query/key/value/out_proj
        names = (
            ("q", "query."), ("k", "key."), ("v", "value."), ("o", "out_proj.")
        ) if prefix + "query.weight" in sd else (
            ("q", "q_proj."), ("k", "k_proj."), ("v", "v_proj."),
            ("o", "out_proj."),
        )
        return {ours: lin(prefix + theirs) for ours, theirs in names}

    def deform(prefix):
        return {
            "sampling_offsets": lin(prefix + "sampling_offsets."),
            "attention_weights": lin(prefix + "attention_weights."),
            "value_proj": lin(prefix + "value_proj."),
            "output_proj": lin(prefix + "output_proj."),
        }

    def mlp_head(prefix, n=3):
        return {
            f"layer{i}": lin(prefix + f"layers.{i}.") for i in range(n)
        }

    m = "model."
    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"{m}encoder.layers.{i}."
        enc_layers.append(
            {
                "fusion": {
                    "ln_vision": ln(p + "fusion_layer.layer_norm_vision."),
                    "ln_text": ln(p + "fusion_layer.layer_norm_text."),
                    "vision_param": sd[p + "fusion_layer.vision_param"],
                    "text_param": sd[p + "fusion_layer.text_param"],
                    "vision_proj": lin(p + "fusion_layer.attn.vision_proj."),
                    "text_proj": lin(p + "fusion_layer.attn.text_proj."),
                    "values_vision_proj": lin(
                        p + "fusion_layer.attn.values_vision_proj."
                    ),
                    "values_text_proj": lin(
                        p + "fusion_layer.attn.values_text_proj."
                    ),
                    "out_vision_proj": lin(
                        p + "fusion_layer.attn.out_vision_proj."
                    ),
                    "out_text_proj": lin(p + "fusion_layer.attn.out_text_proj."),
                },
                "text_enhancer": {
                    "attn": mha(p + "text_enhancer_layer.self_attn."),
                    "fc1": lin(p + "text_enhancer_layer.fc1."),
                    "fc2": lin(p + "text_enhancer_layer.fc2."),
                    "ln1": ln(p + "text_enhancer_layer.layer_norm_before."),
                    "ln2": ln(p + "text_enhancer_layer.layer_norm_after."),
                },
                "deformable": {
                    **deform(p + "deformable_layer.self_attn."),
                    "ln1": ln(p + "deformable_layer.self_attn_layer_norm."),
                    "fc1": lin(p + "deformable_layer.fc1."),
                    "fc2": lin(p + "deformable_layer.fc2."),
                    "ln2": ln(p + "deformable_layer.final_layer_norm."),
                },
            }
        )

    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"{m}decoder.layers.{i}."
        dec_layers.append(
            {
                "self_attn": mha(p + "self_attn."),
                "self_attn_ln": ln(p + "self_attn_layer_norm."),
                "text_cross_attn": mha(p + "encoder_attn_text."),
                "text_cross_attn_ln": ln(p + "encoder_attn_text_layer_norm."),
                "deform_cross_attn": deform(p + "encoder_attn."),
                "deform_cross_attn_ln": ln(p + "encoder_attn_layer_norm."),
                "fc1": lin(p + "fc1."),
                "fc2": lin(p + "fc2."),
                "final_ln": ln(p + "final_layer_norm."),
            }
        )

    n_backbone = len(cfg.backbone_stage_indices)
    input_proj = []
    for i in range(cfg.num_feature_levels):
        cp = f"{m}input_proj_vision.{i}."
        w = sd[cp + "0.weight"]  # conv
        if w.ndim == 4 and w.shape[-1] == 1:  # 1x1
            kernel = w[:, :, 0, 0].T
        else:  # 3x3 -> HWIO
            kernel = w.transpose(2, 3, 1, 0)
        input_proj.append(
            {
                "conv": {"kernel": kernel, "bias": sd[cp + "0.bias"]},
                "gn": {"scale": sd[cp + "1.weight"], "bias": sd[cp + "1.bias"]},
            }
        )

    # Swin backbone + per-stage norms
    swin_prefix = f"{m}backbone.conv_encoder.model."
    swin_params = swin_mod.convert_hf_swin(
        sd, cfg.swin, dtype, prefix=swin_prefix + ""
    )
    backbone_norms = []
    for i, si in enumerate(cfg.backbone_stage_indices):
        key = f"{swin_prefix}hidden_states_norms.stage{si + 1}."
        backbone_norms.append(ln(key))

    params = {
        "swin": swin_params,
        "backbone_norms": backbone_norms,
        "input_proj": input_proj,
        "text_backbone": bert_mod.convert_hf_bert(
            sd, cfg.text, dtype, prefix=f"{m}text_backbone."
        ),
        "text_projection": lin(m + "text_projection."),
        "level_embed": sd[m + "level_embed"],
        "encoder_layers": enc_layers,
        "decoder_layers": dec_layers,
        "enc_output": lin(m + "enc_output."),
        "enc_output_norm": ln(m + "enc_output_norm."),
        "encoder_bbox_head": mlp_head(m + "encoder_output_bbox_embed."),
        "query_embeds": sd[m + "query_position_embeddings.weight"],
        "ref_point_head": mlp_head(m + "decoder.reference_points_head.", n=2),
        "decoder_norm": ln(m + "decoder.layer_norm."),
        "bbox_heads": [
            mlp_head(f"bbox_embed.{i}.") for i in range(cfg.decoder_layers)
        ],
    }
    out = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    # swin params already converted (avoid double-cast issues)
    out["swin"] = swin_params
    return out


def convert_original_grounding_dino(
    sd, cfg: GroundingDinoConfig, dtype=jnp.float32
):
    """Original-repo checkpoint (groundingdino_swint_ogc.pth /
    swinb_cogcoor.pth layout) -> params.

    Key schema differences vs the HF layout handled here:
      backbone.0.*                 timm-style Swin (+ per-stage norm{i})
      bert.*                       HF BertModel, feat_map = text proj
      transformer.encoder.layers / .text_layers / .fusion_layers
                                   split per-role lists (HF interleaves
                                   them inside one layer object)
      nn.MultiheadAttention        fused in_proj_weight/bias (split into
                                   q/k/v thirds)
      transformer.decoder.layers.{i}: self_attn+norm2, ca_text+
                                   catext_norm, cross_attn(deform)+norm1,
                                   linear1/2+norm3
      transformer.tgt_embed        learned content queries
      transformer.enc_out_bbox_embed / bbox_embed.{i}  box heads
    """

    def t(w):
        return np.ascontiguousarray(np.asarray(w).T)

    def ln(prefix):
        return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}

    def lin(prefix):
        out = {"kernel": t(sd[prefix + "weight"])}
        if prefix + "bias" in sd:
            out["bias"] = sd[prefix + "bias"]
        return out

    def mha_fused(prefix):
        """torch nn.MultiheadAttention: in_proj packs q;k;v rows."""
        w = np.asarray(sd[prefix + "in_proj_weight"])
        b = np.asarray(sd[prefix + "in_proj_bias"])
        d = w.shape[1]
        return {
            "q": {"kernel": t(w[:d]), "bias": b[:d]},
            "k": {"kernel": t(w[d : 2 * d]), "bias": b[d : 2 * d]},
            "v": {"kernel": t(w[2 * d :]), "bias": b[2 * d :]},
            "o": lin(prefix + "out_proj."),
        }

    def deform(prefix):
        return {
            "sampling_offsets": lin(prefix + "sampling_offsets."),
            "attention_weights": lin(prefix + "attention_weights."),
            "value_proj": lin(prefix + "value_proj."),
            "output_proj": lin(prefix + "output_proj."),
        }

    def mlp_head(prefix, n=3):
        return {f"layer{i}": lin(prefix + f"layers.{i}.") for i in range(n)}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        fus = f"transformer.encoder.fusion_layers.{i}."
        txt = f"transformer.encoder.text_layers.{i}."
        dfm = f"transformer.encoder.layers.{i}."
        enc_layers.append(
            {
                "fusion": {
                    "ln_vision": ln(fus + "layer_norm_v."),
                    "ln_text": ln(fus + "layer_norm_l."),
                    "vision_param": sd[fus + "gamma_v"],
                    "text_param": sd[fus + "gamma_l"],
                    "vision_proj": lin(fus + "attn.v_proj."),
                    "text_proj": lin(fus + "attn.l_proj."),
                    "values_vision_proj": lin(fus + "attn.values_v_proj."),
                    "values_text_proj": lin(fus + "attn.values_l_proj."),
                    "out_vision_proj": lin(fus + "attn.out_v_proj."),
                    "out_text_proj": lin(fus + "attn.out_l_proj."),
                },
                "text_enhancer": {
                    "attn": mha_fused(txt + "self_attn."),
                    "fc1": lin(txt + "linear1."),
                    "fc2": lin(txt + "linear2."),
                    "ln1": ln(txt + "norm1."),
                    "ln2": ln(txt + "norm2."),
                },
                "deformable": {
                    **deform(dfm + "self_attn."),
                    "ln1": ln(dfm + "norm1."),
                    "fc1": lin(dfm + "linear1."),
                    "fc2": lin(dfm + "linear2."),
                    "ln2": ln(dfm + "norm2."),
                },
            }
        )

    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"transformer.decoder.layers.{i}."
        dec_layers.append(
            {
                "self_attn": mha_fused(p + "self_attn."),
                "self_attn_ln": ln(p + "norm2."),
                "text_cross_attn": mha_fused(p + "ca_text."),
                "text_cross_attn_ln": ln(p + "catext_norm."),
                "deform_cross_attn": deform(p + "cross_attn."),
                "deform_cross_attn_ln": ln(p + "norm1."),
                "fc1": lin(p + "linear1."),
                "fc2": lin(p + "linear2."),
                "final_ln": ln(p + "norm3."),
            }
        )

    input_proj = []
    for i in range(cfg.num_feature_levels):
        cp = f"input_proj.{i}."
        w = np.asarray(sd[cp + "0.weight"])
        if w.ndim == 4 and w.shape[-1] == 1:  # 1x1 conv
            kernel = w[:, :, 0, 0].T
        else:  # 3x3 -> HWIO
            kernel = w.transpose(2, 3, 1, 0)
        input_proj.append(
            {
                "conv": {"kernel": kernel, "bias": sd[cp + "0.bias"]},
                "gn": {"scale": sd[cp + "1.weight"], "bias": sd[cp + "1.bias"]},
            }
        )

    swin_params = swin_mod.convert_timm_swin(
        sd, cfg.swin, dtype, prefix="backbone.0."
    )
    backbone_norms = [
        ln(f"backbone.0.norm{si}.") for si in cfg.backbone_stage_indices
    ]

    # Box heads may be weight-shared across decoder layers; fall back to
    # head 0 when a later index was deduplicated out of the save.
    bbox_heads = []
    for i in range(cfg.decoder_layers):
        if f"bbox_embed.{i}.layers.0.weight" in sd:
            bbox_heads.append(mlp_head(f"bbox_embed.{i}."))
        else:
            bbox_heads.append(bbox_heads[0])

    params = {
        "swin": swin_params,
        "backbone_norms": backbone_norms,
        "input_proj": input_proj,
        "text_backbone": bert_mod.convert_hf_bert(
            sd, cfg.text, dtype, prefix="bert."
        ),
        "text_projection": lin("feat_map."),
        "level_embed": sd["transformer.level_embed"],
        "encoder_layers": enc_layers,
        "decoder_layers": dec_layers,
        "enc_output": lin("transformer.enc_output."),
        "enc_output_norm": ln("transformer.enc_output_norm."),
        "encoder_bbox_head": mlp_head("transformer.enc_out_bbox_embed."),
        "query_embeds": sd["transformer.tgt_embed.weight"],
        "ref_point_head": mlp_head(
            "transformer.decoder.ref_point_head.", n=2
        ),
        "decoder_norm": ln("transformer.decoder.norm."),
        "bbox_heads": bbox_heads,
    }
    out = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    out["swin"] = swin_params
    out["text_backbone"] = params["text_backbone"]
    return out


# -- detector adapter ---------------------------------------------------------------


class GroundingDinoDetector:
    """detector(image, prompts) -> (boxes xyxy, scores, class_ids).

    Prompts are joined as 'a. b. c.' (the groundingdino convention the
    reference uses via predict_with_classes); per-query class = argmax
    over prompt token spans, score = max sigmoid logit.

    `detect_batch` runs k frames through ONE forward (the caption is
    shared, so the text tower and masks broadcast) — the grounded-video
    pipeline knows its detection frames upfront (every Nth frame),
    unlike the reference's strictly per-frame loop
    (grounding_new_api.py:448-521), so detection amortizes over the MXU
    batch dimension.
    """

    def __init__(self, params, cfg: GroundingDinoConfig, tokenize,
                 image_size: int = 800, box_threshold: float = 0.35):
        self.params = params
        self.cfg = cfg
        self.tokenize = tokenize  # str -> List[int] (BERT ids, with specials)
        self.image_size = image_size
        self.box_threshold = box_threshold
        # whole preprocessing (cast+resize+round+normalize) as one device
        # program per (k, H, W) shape — eager ops cost a tunnel RTT
        # each. Frames arrive uint8 and cast to f32 ON DEVICE (4x less
        # host->device transfer than casting on host).
        self._preprocess = jax.jit(
            lambda imgs: normalize_clip(
                jnp.clip(
                    jnp.round(
                        resize_bicubic(
                            imgs.astype(jnp.float32),
                            self.image_size, self.image_size,
                        )
                    ),
                    0, 255,
                )
            )
        )

    def __call__(self, image: np.ndarray, prompts: Sequence[str]):
        return self.detect_batch(image[None], prompts)[0]

    def detect_batch(
        self, images: np.ndarray, prompts: Sequence[str]
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """images: (k, H, W, 3) uint8 — np, or an already
        device-resident jax array (the fused grounded-clip path slices
        its single clip upload; converting back to np here would cost a
        device->host fetch per batch). One caption, k frames, ONE
        jitted forward. Returns per-frame (boxes xyxy, scores,
        class_ids)."""
        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        k, H, W = images.shape[0], images.shape[1], images.shape[2]
        caption = " . ".join(p.strip().lower() for p in prompts) + " ."
        ids1 = self.tokenize(caption)
        ids = np.broadcast_to(
            np.asarray(ids1, np.int64)[None], (k, len(ids1))
        )

        pixels = self._preprocess(jnp.asarray(images))
        logits, boxes = forward(self.params, self.cfg, pixels, ids)
        probs_b = np.asarray(jax.nn.sigmoid(logits))  # (k, nq, text_len)
        boxes_b = np.asarray(boxes)  # (k, nq, 4) cxcywh normalized

        spans = self._prompt_spans(np.asarray(ids1), len(prompts))
        out = []
        for f in range(k):
            out.append(
                self._postprocess_frame(
                    probs_b[f], boxes_b[f], spans, H, W
                )
            )
        return out

    def _postprocess_frame(self, probs, boxes, spans, H, W):
        scores = probs.max(axis=-1)
        keep = scores > self.box_threshold
        if not keep.any():
            return (
                np.zeros((0, 4), np.float32),
                np.zeros((0,), np.float32),
                np.zeros((0,), np.int64),
            )
        kept_boxes = boxes[keep]
        kept_scores = scores[keep]
        kept_probs = probs[keep]
        class_ids = np.array(
            [
                int(np.argmax([kept_probs[i, s:e].max() if e > s else -1
                               for (s, e) in spans]))
                for i in range(len(kept_boxes))
            ],
            np.int64,
        )
        cx, cy, w, h = kept_boxes.T
        xyxy = np.stack(
            [
                (cx - w / 2) * W,
                (cy - h / 2) * H,
                (cx + w / 2) * W,
                (cy + h / 2) * H,
            ],
            axis=1,
        ).astype(np.float32)
        return xyxy, kept_scores.astype(np.float32), class_ids

    def _prompt_spans(self, ids: np.ndarray, num_prompts: int):
        """Token index ranges of each prompt between separators."""
        spans = []
        start = 1  # skip [CLS]
        for i, tok in enumerate(ids):
            if tok in SPECIAL_TOKENS and i > 0:
                if i > start:
                    spans.append((start, i))
                start = i + 1
        return spans[:num_prompts] if spans else [(0, len(ids))]


def build_detector(
    checkpoint_dir: Optional[str] = None,
    cfg: Optional[GroundingDinoConfig] = None,
    box_threshold: float = 0.35,
    tokenizer_name: str = "bert-base-uncased",
):
    """GroundingDinoDetector from an HF checkpoint dir or an
    original-repo .pth file (groundingdino_swint_ogc.pth); random init
    fallback keeps the pipeline runnable without weights.

    tokenizer_name: HF tokenizer for the .pth path (the original repo
    pairs its checkpoints with bert-base-uncased)."""
    cfg = cfg or GroundingDinoConfig()
    if checkpoint_dir and os.path.isfile(checkpoint_dir):
        from transformers import AutoTokenizer

        from video_llava_tpu.engine.weights import load_torch_checkpoint_file

        sd = load_torch_checkpoint_file(checkpoint_dir)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        params = convert_original_grounding_dino(sd, cfg)
        try:
            tok = AutoTokenizer.from_pretrained(tokenizer_name)
        except (ValueError, OSError):
            # bare vocab.txt dir (no config.json): the original repo
            # always pairs its checkpoints with BERT-uncased
            from transformers import BertTokenizerFast

            tok = BertTokenizerFast.from_pretrained(tokenizer_name)
        tokenize = lambda s: tok(s).input_ids
    elif checkpoint_dir:
        from transformers import AutoTokenizer

        from video_llava_tpu.engine.weights import load_checkpoint_dir

        sd = load_checkpoint_dir(checkpoint_dir)
        params = convert_hf_grounding_dino(sd, cfg)
        tok = AutoTokenizer.from_pretrained(checkpoint_dir)
        tokenize = lambda s: tok(s).input_ids
    else:
        import warnings

        warnings.warn("GroundingDINO weights not provided; random init")
        params = _random_params(cfg)
        tokenize = lambda s: (
            [101] + [max(1, min(ord(c), 900)) for c in s][:30] + [102]
        )
    return GroundingDinoDetector(params, cfg, tokenize,
                                 box_threshold=box_threshold)


def _random_params(cfg: GroundingDinoConfig):
    """Random params via a tiny HF model + the converter (guarantees
    layout agreement)."""
    import torch
    import transformers

    hf_cfg = transformers.GroundingDinoConfig(
        d_model=cfg.d_model,
        num_queries=cfg.num_queries,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        num_feature_levels=cfg.num_feature_levels,
        max_text_len=cfg.max_text_len,
        backbone_config=transformers.SwinConfig(
            image_size=cfg.swin.image_size,
            patch_size=cfg.swin.patch_size,
            embed_dim=cfg.swin.embed_dim,
            depths=list(cfg.swin.depths),
            num_heads=list(cfg.swin.num_heads),
            window_size=cfg.swin.window_size,
            out_indices=[i + 1 for i in cfg.backbone_stage_indices],
        ),
        text_config=transformers.BertConfig(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            intermediate_size=cfg.text.intermediate_size,
            max_position_embeddings=cfg.text.max_position_embeddings,
        ),
    )
    torch.manual_seed(0)
    model = transformers.GroundingDinoForObjectDetection(hf_cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return convert_hf_grounding_dino(sd, cfg)

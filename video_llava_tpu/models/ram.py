"""RAM-style image tagging head: label-query cross-attention decoder.

The reference's tagger is RAM (recognize-anything) Swin-L
(grounding_evaluation/util/image_tagging.py:5-29): a frozen image
encoder whose patch features are queried by per-tag label embeddings
through a small cross-attention decoder; each tag's query produces one
recognition logit. This module implements that architecture on our
JAX Swin backbone (models/swin.py).

TPU design: all frames and all tags batch in one program — queries are
(num_tags, d) broadcast over the frame batch; the reference loops
frames one by one (image_tagging.py:44-47).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import (
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from video_llava_tpu.models.swin import SwinConfig, forward_features
from video_llava_tpu.ops.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class RamConfig:
    num_tags: int = 4585  # RAM tag vocabulary size
    hidden_size: int = 512
    num_heads: int = 8
    decoder_layers: int = 2
    layer_norm_eps: float = 1e-5


def _dec_layer_init(key, cfg: RamConfig, dtype):
    ks = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "ln_q": layer_norm_init(d, dtype),
        "q": linear_init(ks[0], d, d, dtype=dtype),
        "k": linear_init(ks[1], d, d, dtype=dtype),
        "v": linear_init(ks[2], d, d, dtype=dtype),
        "o": linear_init(ks[3], d, d, dtype=dtype),
        "ln_ffn": layer_norm_init(d, dtype),
        "fc1": linear_init(ks[4], d, 4 * d, dtype=dtype),
        "fc2": linear_init(ks[5], 4 * d, d, dtype=dtype),
    }


def init_params(key, cfg: RamConfig, backbone_features: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4 + cfg.decoder_layers)
    return {
        "label_embeddings": jax.random.normal(
            ks[0], (cfg.num_tags, cfg.hidden_size), dtype
        )
        * 0.02,
        "image_proj": linear_init(
            ks[1], backbone_features, cfg.hidden_size, dtype=dtype
        ),
        "image_norm": layer_norm_init(cfg.hidden_size, dtype),
        "layers": [
            _dec_layer_init(ks[2 + i], cfg, dtype)
            for i in range(cfg.decoder_layers)
        ],
        "head": linear_init(ks[-1], cfg.hidden_size, 1, dtype=dtype),
    }


def tag_logits(
    backbone_params,
    ram_params,
    pixels: jax.Array,
    swin_cfg: SwinConfig,
    cfg: RamConfig,
) -> jax.Array:
    """(b, H, W, 3) -> (b, num_tags) recognition logits."""
    feats = forward_features(backbone_params, pixels, swin_cfg)[-1]
    b, hh, ww, c = feats.shape
    img = linear(ram_params["image_proj"], feats.reshape(b, hh * ww, c))
    img = layer_norm(ram_params["image_norm"], img, cfg.layer_norm_eps)

    q = jnp.broadcast_to(
        ram_params["label_embeddings"][None],
        (b, cfg.num_tags, cfg.hidden_size),
    ).astype(img.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    for lp in ram_params["layers"]:
        qn = layer_norm(lp["ln_q"], q, cfg.layer_norm_eps)
        qh = linear(lp["q"], qn).reshape(b, cfg.num_tags, cfg.num_heads, hd)
        kh = linear(lp["k"], img).reshape(b, hh * ww, cfg.num_heads, hd)
        vh = linear(lp["v"], img).reshape(b, hh * ww, cfg.num_heads, hd)
        attn = attention_reference(qh, kh, vh)
        q = q + linear(lp["o"], attn.reshape(b, cfg.num_tags, cfg.hidden_size))
        h = layer_norm(lp["ln_ffn"], q, cfg.layer_norm_eps)
        q = q + linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], h)))
    return linear(ram_params["head"], q)[..., 0]

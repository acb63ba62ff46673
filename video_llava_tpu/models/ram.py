"""RAM (recognize-anything) image tagging head: query2label decoder.

The reference's tagger is RAM Swin-L (grounding_evaluation/util/
image_tagging.py:5-29): a Swin image encoder whose patch features are
queried by per-tag label embeddings through a small BERT-style decoder
(the "q2l" tagging head); each tag's query produces one recognition
logit against a per-tag threshold.

Architecture here mirrors the released checkpoint's computation so its
weights convert losslessly: per layer an optional query self-attention
block, a cross-attention block over projected image features, and an
FFN — all post-LN (BertLayer form). Blocks are keyed on presence in
the converted checkpoint, so q2l configs with or without query
self-attention both load.

TPU design: all frames and all 4,585 tags batch in one program —
queries are (num_tags, d) broadcast over the frame batch; the
reference loops frames one by one (image_tagging.py:44-47).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

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
    num_tags: int = 4585  # released RAM tag vocabulary size
    hidden_size: int = 512
    num_heads: int = 4  # q2l_config num_attention_heads
    decoder_layers: int = 2
    intermediate_size: int = 2048
    layer_norm_eps: float = 1e-12
    default_threshold: float = 0.68  # RAM's class_threshold default


def _attn_block_init(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], d, d, dtype=dtype),
        "k": linear_init(ks[1], d, d, dtype=dtype),
        "v": linear_init(ks[2], d, d, dtype=dtype),
        "o": linear_init(ks[3], d, d, dtype=dtype),
        "ln": layer_norm_init(d, dtype),
    }


def _dec_layer_init(key, cfg: RamConfig, dtype, self_attention: bool):
    ks = jax.random.split(key, 4)
    d = cfg.hidden_size
    layer = {
        "cross": _attn_block_init(ks[0], d, dtype),
        "fc1": linear_init(ks[1], d, cfg.intermediate_size, dtype=dtype),
        "fc2": linear_init(ks[2], cfg.intermediate_size, d, dtype=dtype),
        "ffn_ln": layer_norm_init(d, dtype),
    }
    if self_attention:
        layer["self"] = _attn_block_init(ks[3], d, dtype)
    return layer


def init_params(
    key,
    cfg: RamConfig,
    backbone_features: int,
    dtype=jnp.float32,
    self_attention: bool = True,
):
    ks = jax.random.split(key, 4 + cfg.decoder_layers)
    return {
        "label_embeddings": jax.random.normal(
            ks[0], (cfg.num_tags, cfg.hidden_size), dtype
        )
        * 0.02,
        "image_proj": linear_init(
            ks[1], backbone_features, cfg.hidden_size, dtype=dtype
        ),
        "layers": [
            _dec_layer_init(ks[2 + i], cfg, dtype, self_attention)
            for i in range(cfg.decoder_layers)
        ],
        "head": linear_init(ks[-1], cfg.hidden_size, 1, dtype=dtype),
    }


def _mha(p, x, kv, num_heads, eps):
    """Post-LN attention block: LN(x + O(attn(x, kv)))."""
    b, q_len, d = x.shape
    hd = d // num_heads
    qh = linear(p["q"], x).reshape(b, q_len, num_heads, hd)
    kh = linear(p["k"], kv).reshape(b, kv.shape[1], num_heads, hd)
    vh = linear(p["v"], kv).reshape(b, kv.shape[1], num_heads, hd)
    attn = attention_reference(qh, kh, vh).reshape(b, q_len, d)
    return layer_norm(p["ln"], x + linear(p["o"], attn), eps)


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

    q = jnp.broadcast_to(
        ram_params["label_embeddings"][None],
        (b, cfg.num_tags, cfg.hidden_size),
    ).astype(img.dtype)
    for lp in ram_params["layers"]:
        if "self" in lp:
            q = _mha(lp["self"], q, q, cfg.num_heads, cfg.layer_norm_eps)
        q = _mha(lp["cross"], q, img, cfg.num_heads, cfg.layer_norm_eps)
        h = jax.nn.gelu(linear(lp["fc1"], q), approximate=False)
        q = layer_norm(
            lp["ffn_ln"], q + linear(lp["fc2"], h), cfg.layer_norm_eps
        )
    return linear(ram_params["head"], q)[..., 0]


# -- released-checkpoint conversion ------------------------------------------


def infer_ram_config(sd, num_heads: int = 4) -> RamConfig:
    """Derive the decoder geometry from a RAM state dict (tag count,
    hidden size, layer count, FFN width). num_heads isn't recoverable
    from weight shapes — q2l_config's value (4) is the released
    default."""
    sd_keys = {k.removeprefix("module."): k for k in sd}

    def shape(name):
        return np.asarray(sd[sd_keys[name]]).shape

    num_tags, _ = shape("label_embed")
    hidden = shape("fc.weight")[1]
    layers = 0
    while (
        f"tagging_head.encoder.layer.{layers}.crossattention.self.query.weight"
        in sd_keys
    ):
        layers += 1
    ff = shape("tagging_head.encoder.layer.0.intermediate.dense.weight")[0]
    return RamConfig(
        num_tags=num_tags,
        hidden_size=hidden,
        num_heads=num_heads,
        decoder_layers=layers,
        intermediate_size=ff,
    )


def convert_ram_checkpoint(
    sd,
    swin_cfg: SwinConfig,
    cfg: RamConfig,
    dtype=jnp.float32,
):
    """RAM release checkpoint (ram_swin_large_14m.pth-style state dict)
    -> (backbone_params, ram_params, class_thresholds).

    Key schema of the released tagger (recognize-anything RAM class):
      visual_encoder.*          timm-style Swin-L
      image_proj.{weight,bias}  vision_width -> 512
      label_embed               (num_tags, 512) raw textual embeddings
      wordvec_proj.{weight,bias} applied as relu(wordvec_proj(label_embed))
                                at inference; we fold it in here
      tagging_head.encoder.layer.{i}.attention.self.{query,key,value}
                               .attention.output.{dense,LayerNorm}
                               .crossattention.self.{query,key,value}
                               .crossattention.output.{dense,LayerNorm}
                               .intermediate.dense / .output.{dense,LayerNorm}
      fc.{weight,bias}          512 -> 1 per-query logit
      class_threshold           (num_tags,) per-tag sigmoid thresholds
    """
    from video_llava_tpu.models.swin import convert_timm_swin

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    np_sd = {k: np.asarray(v) for k, v in sd.items()}

    backbone = convert_timm_swin(np_sd, swin_cfg, dtype,
                                 prefix="visual_encoder.")

    def t(w):
        return np.ascontiguousarray(w.T)

    def lin(prefix):
        p = {"kernel": jnp.asarray(t(np_sd[f"{prefix}.weight"]), dtype)}
        if f"{prefix}.bias" in np_sd:
            p["bias"] = jnp.asarray(np_sd[f"{prefix}.bias"], dtype)
        return p

    def ln(prefix):
        return {
            "scale": jnp.asarray(np_sd[f"{prefix}.weight"], dtype),
            "bias": jnp.asarray(np_sd[f"{prefix}.bias"], dtype),
        }

    # Fold the word-vector projection into the label embeddings
    # (inference-time constant in the released model).
    label = np_sd["label_embed"]
    if "wordvec_proj.weight" in np_sd:
        label = label @ np_sd["wordvec_proj.weight"].T
        if "wordvec_proj.bias" in np_sd:
            label = label + np_sd["wordvec_proj.bias"]
        label = np.maximum(label, 0.0)  # relu

    layers = []
    i = 0
    while f"tagging_head.encoder.layer.{i}.crossattention.self.query.weight" in np_sd:
        pre = f"tagging_head.encoder.layer.{i}"
        layer = {
            "cross": {
                "q": lin(f"{pre}.crossattention.self.query"),
                "k": lin(f"{pre}.crossattention.self.key"),
                "v": lin(f"{pre}.crossattention.self.value"),
                "o": lin(f"{pre}.crossattention.output.dense"),
                "ln": ln(f"{pre}.crossattention.output.LayerNorm"),
            },
            "fc1": lin(f"{pre}.intermediate.dense"),
            "fc2": lin(f"{pre}.output.dense"),
            "ffn_ln": ln(f"{pre}.output.LayerNorm"),
        }
        if f"{pre}.attention.self.query.weight" in np_sd:
            layer["self"] = {
                "q": lin(f"{pre}.attention.self.query"),
                "k": lin(f"{pre}.attention.self.key"),
                "v": lin(f"{pre}.attention.self.value"),
                "o": lin(f"{pre}.attention.output.dense"),
                "ln": ln(f"{pre}.attention.output.LayerNorm"),
            }
        layers.append(layer)
        i += 1

    ram_params = {
        "label_embeddings": jnp.asarray(label, dtype),
        "image_proj": lin("image_proj"),
        "layers": layers,
        "head": lin("fc"),
    }
    thresholds = (
        np.asarray(np_sd["class_threshold"], np.float32)
        if "class_threshold" in np_sd
        else np.full((label.shape[0],), cfg.default_threshold, np.float32)
    )
    return backbone, ram_params, thresholds


def load_tag_list(path: str) -> List[str]:
    """Released RAM vocabulary file (ram_tag_list.txt, one tag per
    line, 4,585 entries)."""
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def load_tag_thresholds(
    path: Optional[str], num_tags: int, default: float = 0.68
) -> np.ndarray:
    """Per-tag sigmoid thresholds (ram_tag_list_threshold.txt); a
    missing file yields the uniform default."""
    if path is None:
        return np.full((num_tags,), default, np.float32)
    with open(path, encoding="utf-8") as f:
        vals = [float(line.strip()) for line in f if line.strip()]
    if len(vals) != num_tags:
        raise ValueError(
            f"threshold file has {len(vals)} entries, expected {num_tags}"
        )
    return np.asarray(vals, np.float32)

"""BERT encoder in pure-functional JAX (GroundingDINO's text backbone).

The reference's GroundingDINO loads a BERT-base text encoder
(grounding_evaluation/grounding_new_api.py via the groundingdino pkg).
Post-LN transformer; converts from HF BertModel state dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import (
    embed,
    layer_norm,
    linear,
)
from video_llava_tpu.ops.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def tiny_test(cls):
        return cls(
            # vocab must cover the BERT special ids (1012, 1029, ...)
            vocab_size=2048, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )


def forward(
    params,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array],
    cfg: BertConfig,
    token_type_ids: Optional[jax.Array] = None,
    attention_bias: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """-> last hidden state (b, s, d).

    attention_mask: (b, s) 1=keep. attention_bias: optional additive
    (b, 1|h, s, s) mask (GroundingDINO's special-token block-diagonal
    text self-attention mask). position_ids: optional (b, s) override
    (GroundingDINO restarts positions per prompt segment).
    """
    b, s = input_ids.shape
    x = embed(params["word_embeddings"], input_ids)
    pos = position_ids if position_ids is not None else jnp.arange(s)
    x = x + jnp.take(params["position_embeddings"], pos, axis=0)
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = x + jnp.take(params["token_type_embeddings"], tt, axis=0)
    x = layer_norm(params["embed_ln"], x, cfg.layer_norm_eps)

    bias = 0.0
    if attention_mask is not None:
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    if attention_bias is not None:
        bias = bias + attention_bias

    hd = cfg.hidden_size // cfg.num_heads
    for lp in params["layers"]:
        q = linear(lp["q"], x).reshape(b, s, cfg.num_heads, hd)
        k = linear(lp["k"], x).reshape(b, s, cfg.num_heads, hd)
        v = linear(lp["v"], x).reshape(b, s, cfg.num_heads, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        attn = linear(lp["attn_out"], attn.reshape(b, s, cfg.hidden_size))
        x = layer_norm(lp["attn_ln"], x + attn, cfg.layer_norm_eps)
        h = jax.nn.gelu(linear(lp["fc1"], x), approximate=False)
        x = layer_norm(lp["out_ln"], x + linear(lp["fc2"], h), cfg.layer_norm_eps)
    return x


def convert_hf_bert(sd, cfg: BertConfig, dtype=jnp.float32, prefix: str = ""):
    def t(w):
        return np.ascontiguousarray(w.T)

    g = lambda k: sd[prefix + k]
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        layers.append(
            {
                "q": {"kernel": t(g(p + "attention.self.query.weight")),
                      "bias": g(p + "attention.self.query.bias")},
                "k": {"kernel": t(g(p + "attention.self.key.weight")),
                      "bias": g(p + "attention.self.key.bias")},
                "v": {"kernel": t(g(p + "attention.self.value.weight")),
                      "bias": g(p + "attention.self.value.bias")},
                "attn_out": {
                    "kernel": t(g(p + "attention.output.dense.weight")),
                    "bias": g(p + "attention.output.dense.bias"),
                },
                "attn_ln": {
                    "scale": g(p + "attention.output.LayerNorm.weight"),
                    "bias": g(p + "attention.output.LayerNorm.bias"),
                },
                "fc1": {"kernel": t(g(p + "intermediate.dense.weight")),
                        "bias": g(p + "intermediate.dense.bias")},
                "fc2": {"kernel": t(g(p + "output.dense.weight")),
                        "bias": g(p + "output.dense.bias")},
                "out_ln": {
                    "scale": g(p + "output.LayerNorm.weight"),
                    "bias": g(p + "output.LayerNorm.bias"),
                },
            }
        )
    params = {
        "word_embeddings": {"weight": g("embeddings.word_embeddings.weight")},
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        "token_type_embeddings": g("embeddings.token_type_embeddings.weight"),
        "embed_ln": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
        "layers": layers,
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

"""mm_projector: maps pooled CLIP features into LM embedding space.

Parity: reference video_chatgpt/model/multimodal_projector/builder.py:
33-51 — 'linear' (the 224px / LLaVA-1.1 path, video_chatgpt.py:52-54),
'mlp{N}x_gelu' (the 336px / LLaVA-1.5 path), and 'identity'.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from video_llava_tpu.config import ProjectorConfig
from video_llava_tpu.models.layers import linear, linear_init

_MLP_RE = re.compile(r"^mlp(\d+)x_gelu$")


def init_params(key, cfg: ProjectorConfig, dtype=jnp.float32):
    t = cfg.projector_type
    if t == "identity":
        return {}
    if t == "linear":
        return {"layers": [linear_init(key, cfg.mm_hidden_size, cfg.hidden_size, dtype=dtype)]}
    m = _MLP_RE.match(t)
    if m:
        depth = int(m.group(1))
        ks = jax.random.split(key, depth)
        layers = [linear_init(ks[0], cfg.mm_hidden_size, cfg.hidden_size, dtype=dtype)]
        for i in range(1, depth):
            layers.append(
                linear_init(ks[i], cfg.hidden_size, cfg.hidden_size, dtype=dtype)
            )
        return {"layers": layers}
    raise ValueError(f"Unknown projector type: {t}")


def apply(params, x: jax.Array, cfg: ProjectorConfig) -> jax.Array:
    t = cfg.projector_type
    if t == "identity":
        return x
    layers = params["layers"]
    y = linear(layers[0], x)
    for p in layers[1:]:
        y = linear(p, jax.nn.gelu(y))
    return y

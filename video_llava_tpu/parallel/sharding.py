"""Parameter / cache partition specs (Megatron-style TP + optional FSDP).

Layout rationale (scaling-book recipe):
  * attention q/k/v kernels (d, heads*hd): shard the head dim on
    'model' — each chip owns heads, attention is fully local;
  * attention out kernel (heads*hd, d): shard the input (head) dim —
    XLA inserts one psum per layer on the residual;
  * MLP gate/up shard the ffn dim, down shards the ffn input dim —
    one psum per layer;
  * embed/lm_head shard the vocab dim (logits psum/all-gather);
  * norms replicated;
  * optional FSDP: the non-TP dim of every big kernel additionally
    shards on 'data' (ZeRO-3-style; XLA all-gathers at use).

Specs are matched to parameter pytree paths by regex, so they apply to
any model built from models/layers.py conventions. Stacked layer params
get a leading None axis automatically (path contains 'layers').
"""

from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig

# (regex on '/'-joined path, spec for the *parameter itself* without the
# stacked-layer axis)
_LLAMA_RULES = [
    (r"embed_tokens/weight$", ("model", None)),
    (r"lm_head/kernel$", (None, "model")),
    (r"w[qkv]/kernel$", (None, "model")),
    (r"wo/kernel$", ("model", None)),
    (r"(gate|up)/kernel$", (None, "model")),
    (r"down/kernel$", ("model", None)),
    (r"(input_norm|post_norm|final_norm)/scale$", (None,)),
]

_CLIP_RULES = [
    (r"(^|/)o/kernel$", ("model", None)),
    (r"(^|/)[qkv]/kernel$", (None, "model")),
    (r"fc1/kernel$", (None, "model")),
    (r"fc2/kernel$", ("model", None)),
    (r"(^|/)[qkv]/bias$", ("model",)),
    (r"fc1/bias$", ("model",)),
]

_PROJECTOR_RULES = [
    (r"projector/.*kernel$", (None, "model")),
    (r"projector/.*bias$", ("model",)),
]


def _spec_for_path(path: str, ndim: int, rules, fsdp: bool) -> P:
    axes = None
    for pat, spec in rules:
        if re.search(pat, path):
            axes = list(spec)
            break
    if axes is None:
        return P()
    # Stacked layer params carry a leading num_layers axis.
    if "/layers/" in path or path.startswith("layers/"):
        axes = [None] + axes
    if len(axes) != ndim:
        # bias/norm matched against a differently-shaped leaf: replicate.
        return P()
    if fsdp and ndim >= 2:
        # Shard an unsharded axis on 'data' (ZeRO-3); norms/biases are
        # too small to be worth the all-gather.
        free = [i for i, a in enumerate(axes) if a is None]
        if free:
            axes[free[-1]] = "data"
    if all(a is None for a in axes):
        return P()
    return P(*axes)


def _specs_for_tree(params, rules, fsdp: bool):
    def mk(path, leaf):
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            else:
                keys.append(str(p))
        return _spec_for_path("/".join(keys), leaf.ndim, rules, fsdp)

    return jax.tree_util.tree_map_with_path(mk, params)


def llama_param_specs(params, fsdp: bool = False):
    return _specs_for_tree(params, _LLAMA_RULES, fsdp)


def clip_param_specs(params, fsdp: bool = False):
    return _specs_for_tree(params, _CLIP_RULES, fsdp)


def videollava_param_specs(params, fsdp: bool = False):
    """Specs for the full {vision, projector, llm} pytree."""
    return {
        "vision": clip_param_specs(params["vision"], fsdp),
        "projector": _specs_for_tree(params["projector"], _PROJECTOR_RULES, fsdp),
        "llm": llama_param_specs(params["llm"], fsdp),
    }


def cache_spec() -> P:
    """KV cache (L, b, len, h_kv, hd): batch on 'data', heads on 'model'."""
    return P(None, "data", None, "model", None)


def batch_spec(ndim: int) -> P:
    return P(*(["data"] + [None] * (ndim - 1)))


def shard_params(params, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_shardings(specs, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))

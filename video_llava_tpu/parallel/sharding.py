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


_QUANT_LEAVES = ("qvalues", "qvalues_a8", "qvalues_packed", "scales")


def _spec_for_path(path: str, shape, rules, fsdp: bool) -> P:
    ndim = len(shape)
    # Quantized kernels (ops/quant, ops/quant4) replace the 'kernel' leaf
    # with a dict: match the rules against the PARENT path and adapt the
    # spec to the quantized layout.
    leaf = path.rsplit("/", 1)[-1]
    is_quant = leaf in _QUANT_LEAVES
    match_path = path.rsplit("/", 1)[0] if is_quant else path
    axes = None
    for pat, spec in rules:
        if re.search(pat, match_path):
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
    if is_quant and axes[-2] is not None:
        # Contraction-sharded kernel (wo/down): int4 nibble packing pairs
        # rows i and i+D/2 in one byte, and int4 group scales span fixed
        # contraction groups — sharding the contraction axis would split
        # packed pairs / groups across chips. int8 qvalues shard fine
        # ((D, F) rows are independent); everything else replicates.
        if leaf == "qvalues_packed" or (leaf == "scales" and shape[-2] > 1):
            return P()
    if fsdp and ndim >= 2 and not is_quant:
        # Shard an unsharded axis on 'data' (ZeRO-3); norms/biases are
        # too small to be worth the all-gather.
        free = [i for i, a in enumerate(axes) if a is None]
        if free:
            axes[free[-1]] = "data"
    # Degenerate (size-1) dims — e.g. int8 per-channel scales' reduced
    # contraction axis — cannot shard.
    axes = [a if (a is None or shape[i] > 1) else None
            for i, a in enumerate(axes)]
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
        return _spec_for_path("/".join(keys), leaf.shape, rules, fsdp)

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


def cache_scale_spec() -> P:
    """int8 KV-cache scales (L, b, len, h_kv) — 4D, same sharding."""
    return P(None, "data", None, "model")


def paged_cache_spec() -> P:
    """Paged KV block pool (L, NB, BS, h_kv, hd): block ids are GLOBAL
    (every row's table indexes the one shared pool), so the pool can't
    shard on 'data' — only heads split, on 'model'."""
    return P(None, None, None, "model", None)


def paged_cache_scale_spec() -> P:
    """int8 paged-pool scales (L, NB, BS, h_kv)."""
    return P(None, None, None, "model")


def divisible_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes from dims they don't evenly divide (e.g. a 32006
    vocab on an 8-way 'model' axis): the dim falls back to replicated
    rather than erroring. Serving avoids the fallback's bandwidth cost by
    padding such dims first (models.llama.pad_vocab)."""
    import numpy as _np

    axes = list(spec) + [None] * (len(shape) - len(spec))
    for i, a in enumerate(axes):
        if a is None:
            continue
        names = (a,) if isinstance(a, str) else tuple(a)
        size = int(_np.prod([mesh.shape[n] for n in names]))
        if shape[i] % size:
            axes[i] = None
    while axes and axes[-1] is None:
        axes.pop()
    return P(*axes)


def _kv_cache_layout(cache):
    """(kv_spec, scale_spec, extra-field specs) for a slot KVCache or a
    paged PagedKVCache (detected by its block table)."""
    if getattr(cache, "table", None) is not None:
        return (
            paged_cache_spec(),
            paged_cache_scale_spec(),
            # per-row lengths/tables stay replicated: the shared pool
            # isn't data-sharded, so every shard reads every row
            {"length": P(), "table": P()},
        )
    return cache_spec(), cache_scale_spec(), {"length": P("data")}


def constrain_kv_cache(cache, mesh: Mesh):
    """Pin a models.llama.KVCache (or PagedKVCache) to its mesh layout
    (cache_spec for k/v and int8 scales, per-row lengths on 'data').
    Called inside jitted prefill so the freshly created cache
    materializes sharded instead of relying on GSPMD propagating
    backwards from the attention reads."""
    wsc = jax.lax.with_sharding_constraint

    def pin(x, spec):
        if x is None:
            return None
        return wsc(x, NamedSharding(mesh, divisible_spec(spec, x.shape, mesh)))

    kv, sc, extra = _kv_cache_layout(cache)
    return cache._replace(
        k=pin(cache.k, kv),
        v=pin(cache.v, kv),
        k_scale=pin(cache.k_scale, sc),
        v_scale=pin(cache.v_scale, sc),
        **{f: pin(getattr(cache, f), s) for f, s in extra.items()},
    )


def shard_kv_cache(cache, mesh: Mesh):
    """device_put a host/default-device KVCache (or PagedKVCache) into
    its mesh layout (same specs as constrain_kv_cache; used when a
    persistent cache is created OUTSIDE any jit, e.g. the continuous
    batching engine's slot cache)."""

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(
            x, NamedSharding(mesh, divisible_spec(spec, x.shape, mesh))
        )

    kv, sc, extra = _kv_cache_layout(cache)
    return cache._replace(
        k=put(cache.k, kv),
        v=put(cache.v, kv),
        k_scale=put(cache.k_scale, sc),
        v_scale=put(cache.v_scale, sc),
        **{f: put(getattr(cache, f), s) for f, s in extra.items()},
    )


def batch_spec(ndim: int) -> P:
    return P(*(["data"] + [None] * (ndim - 1)))


def shard_params(params, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (non-divisible dims
    fall back to replicated, see divisible_spec)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, divisible_spec(s, x.shape, mesh))
        ),
        params,
        specs,
    )


def make_shardings(specs, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))

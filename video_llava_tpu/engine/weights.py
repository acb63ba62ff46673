"""HF checkpoint -> JAX pytree weight conversion.

Covers the reference's loading semantics:
  * Vicuna/LLaMA + CLIP towers from HF state dicts
    (video_chatgpt/eval/model_utils.py:101-137);
  * embedding resize with mean-init for the added video tokens
    (video_chatgpt/model/video_chatgpt.py:294-305);
  * non-strict projector overlay from mm_projector.bin — matching keys
    applied, missing/unexpected reported (model_utils.py:119-127).

All converters take a flat {name: numpy array} state dict, so the same
code path serves torch .bin (via torch.load), safetensors, and npz.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from video_llava_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    LlamaConfig,
    ProjectorConfig,
)


# -- state-dict IO ------------------------------------------------------------


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin checkpoint into numpy (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.to(torch.float32).numpy() for k, v in sd.items()}


def load_torch_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    """Load a research-repo .pth/.pt checkpoint file: unwraps the
    common {'model': sd} / {'state_dict': sd} nesting (RAM and
    GroundingDINO releases) and drops non-tensor entries."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "state_dict", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {
        k: v.to(torch.float32).numpy()
        for k, v in obj.items()
        if hasattr(v, "numpy")
    }


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Load an HF model directory: handles single/sharded .bin and
    .safetensors layouts (incl. index.json shard maps)."""
    out: Dict[str, np.ndarray] = {}
    for idx_name in (
        "model.safetensors.index.json",
        "pytorch_model.bin.index.json",
    ):
        idx = os.path.join(path, idx_name)
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            for shard in sorted(set(weight_map.values())):
                fp = os.path.join(path, shard)
                out.update(
                    load_safetensors(fp)
                    if shard.endswith(".safetensors")
                    else load_torch_bin(fp)
                )
            return out
    for name in ("model.safetensors", "pytorch_model.bin"):
        fp = os.path.join(path, name)
        if os.path.exists(fp):
            return (
                load_safetensors(fp)
                if name.endswith(".safetensors")
                else load_torch_bin(fp)
            )
    raise FileNotFoundError(f"no checkpoint found under {path}")


# -- helpers ------------------------------------------------------------------


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear stores (out, in); we store (in, out)."""
    return np.ascontiguousarray(w.T)


def _stack(layer_dicts):
    """List of per-layer pytrees -> leading-axis-stacked pytree."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layer_dicts)


def _cast(tree, dtype):
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


# -- CLIP vision --------------------------------------------------------------


def convert_clip_vision(
    sd: Dict[str, np.ndarray], cfg: CLIPVisionConfig, dtype=jnp.float32,
    prefix: str = "vision_model.",
):
    """HF CLIPVisionModel state dict -> our vision params pytree.

    The stride-P conv kernel (hidden, 3, P, P) becomes the patchify
    matmul kernel (P*P*3, hidden) with (ph, pw, c) flatten order.
    """
    g = lambda k: sd[prefix + k]
    conv = g("embeddings.patch_embedding.weight")  # (H, 3, P, P)
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.hidden_size)

    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}."
        layers.append(
            {
                "ln1": {
                    "scale": g(lp + "layer_norm1.weight"),
                    "bias": g(lp + "layer_norm1.bias"),
                },
                "q": {"kernel": _t(g(lp + "self_attn.q_proj.weight")),
                      "bias": g(lp + "self_attn.q_proj.bias")},
                "k": {"kernel": _t(g(lp + "self_attn.k_proj.weight")),
                      "bias": g(lp + "self_attn.k_proj.bias")},
                "v": {"kernel": _t(g(lp + "self_attn.v_proj.weight")),
                      "bias": g(lp + "self_attn.v_proj.bias")},
                "o": {"kernel": _t(g(lp + "self_attn.out_proj.weight")),
                      "bias": g(lp + "self_attn.out_proj.bias")},
                "ln2": {
                    "scale": g(lp + "layer_norm2.weight"),
                    "bias": g(lp + "layer_norm2.bias"),
                },
                "fc1": {"kernel": _t(g(lp + "mlp.fc1.weight")),
                        "bias": g(lp + "mlp.fc1.bias")},
                "fc2": {"kernel": _t(g(lp + "mlp.fc2.weight")),
                        "bias": g(lp + "mlp.fc2.bias")},
            }
        )

    params = {
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": patch_kernel,
        "position_embedding": g("embeddings.position_embedding.weight"),
        # HF's (sic) attribute name is pre_layrnorm.
        "pre_layernorm": {
            "scale": g("pre_layrnorm.weight"),
            "bias": g("pre_layrnorm.bias"),
        },
        "post_layernorm": {
            "scale": g("post_layernorm.weight"),
            "bias": g("post_layernorm.bias"),
        },
        "layers": _stack(layers),
    }
    return _cast(params, dtype)


# -- LLaMA --------------------------------------------------------------------


def convert_llama(
    sd: Dict[str, np.ndarray], cfg: LlamaConfig, dtype=jnp.bfloat16,
    prefix: str = "model.",
):
    """HF LlamaForCausalLM state dict -> our llama params pytree.

    Pads embed_tokens/lm_head up to cfg.vocab_size (row-mean init for
    the pad rows, mirroring the reference's resize+avg-init,
    video_chatgpt.py:294-305).
    """
    g = lambda k: sd[prefix + k]
    layers = []
    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        layers.append(
            {
                "input_norm": {"scale": g(lp + "input_layernorm.weight")},
                "wq": {"kernel": _t(g(lp + "self_attn.q_proj.weight"))},
                "wk": {"kernel": _t(g(lp + "self_attn.k_proj.weight"))},
                "wv": {"kernel": _t(g(lp + "self_attn.v_proj.weight"))},
                "wo": {"kernel": _t(g(lp + "self_attn.o_proj.weight"))},
                "post_norm": {"scale": g(lp + "post_attention_layernorm.weight")},
                "gate": {"kernel": _t(g(lp + "mlp.gate_proj.weight"))},
                "up": {"kernel": _t(g(lp + "mlp.up_proj.weight"))},
                "down": {"kernel": _t(g(lp + "mlp.down_proj.weight"))},
            }
        )
    embed = g("embed_tokens.weight")
    lm_head = sd["lm_head.weight"] if "lm_head.weight" in sd else g(
        "embed_tokens.weight"
    )
    params = {
        "embed_tokens": {"weight": resize_rows(embed, cfg.vocab_size)},
        "layers": _stack(layers),
        "final_norm": {"scale": g("norm.weight")},
        "lm_head": {"kernel": _t(resize_rows(lm_head, cfg.vocab_size))},
    }
    return _cast(params, dtype)


def resize_rows(w: np.ndarray, new_rows: int) -> np.ndarray:
    """Grow (or keep) the leading dim; new rows take the column mean of
    the existing rows (reference resize+avg-init semantics)."""
    rows = w.shape[0]
    if rows == new_rows:
        return w
    if rows > new_rows:
        raise ValueError(f"cannot shrink vocab {rows} -> {new_rows}")
    mean = w.mean(axis=0, keepdims=True)
    return np.concatenate([w, np.repeat(mean, new_rows - rows, axis=0)], axis=0)


# -- projector ----------------------------------------------------------------


def convert_projector(
    sd: Dict[str, np.ndarray], cfg: ProjectorConfig, dtype=jnp.float32,
):
    """mm_projector weights from a reference-style checkpoint.

    Accepts either single-linear keys ('...mm_projector.weight'/'bias')
    or mlpNx Sequential keys ('...mm_projector.{0,2,4}.weight').
    """
    proj_keys = {
        k.split("mm_projector.")[1]: v for k, v in sd.items() if "mm_projector." in k
    }
    if not proj_keys:
        raise KeyError("no mm_projector keys in state dict")
    if "weight" in proj_keys:  # single linear
        layers = [{"kernel": _t(proj_keys["weight"]), "bias": proj_keys["bias"]}]
    else:  # torch Sequential: indices 0, 2, 4, ... are the Linears
        idxs = sorted(
            {int(m.group(1)) for k in proj_keys for m in [re.match(r"^(\d+)\.", k)] if m}
        )
        layers = [
            {"kernel": _t(proj_keys[f"{i}.weight"]), "bias": proj_keys[f"{i}.bias"]}
            for i in idxs
        ]
    return _cast({"layers": layers}, dtype)


def apply_projector_overlay(
    params, sd: Dict[str, np.ndarray], cfg: ProjectorConfig,
    dtype=jnp.float32,
) -> Tuple[dict, Dict[str, list]]:
    """Non-strict overlay of a reference mm_projector checkpoint onto
    full model params (model_utils.py:119-127 semantics): the projector
    weights and, if present, the (resized) token embeddings are
    replaced; everything else is untouched. Returns (params, report).
    """
    report = {"applied": [], "unexpected": []}
    new = dict(params)
    try:
        new["projector"] = convert_projector(sd, cfg, dtype)
        report["applied"].append("mm_projector")
    except KeyError:
        pass
    embed_key = next((k for k in sd if k.endswith("embed_tokens.weight")), None)
    if embed_key is not None:
        vocab = params["llm"]["embed_tokens"]["weight"].shape[0]
        w = resize_rows(sd[embed_key], vocab)
        llm = dict(new["llm"])
        llm["embed_tokens"] = {
            "weight": jnp.asarray(w, params["llm"]["embed_tokens"]["weight"].dtype)
        }
        new["llm"] = llm
        report["applied"].append("embed_tokens")
    known = ("mm_projector.", "embed_tokens.weight", "embed_in")
    report["unexpected"] = [
        k for k in sd if not any(s in k for s in known)
    ]
    return new, report


# -- CLIP text ----------------------------------------------------------------


def convert_clip_text(
    sd: Dict[str, np.ndarray], cfg: CLIPTextConfig, dtype=jnp.float32,
    prefix: str = "text_model.",
):
    g = lambda k: sd[prefix + k]
    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}."
        layers.append(
            {
                "ln1": {"scale": g(lp + "layer_norm1.weight"),
                        "bias": g(lp + "layer_norm1.bias")},
                "q": {"kernel": _t(g(lp + "self_attn.q_proj.weight")),
                      "bias": g(lp + "self_attn.q_proj.bias")},
                "k": {"kernel": _t(g(lp + "self_attn.k_proj.weight")),
                      "bias": g(lp + "self_attn.k_proj.bias")},
                "v": {"kernel": _t(g(lp + "self_attn.v_proj.weight")),
                      "bias": g(lp + "self_attn.v_proj.bias")},
                "o": {"kernel": _t(g(lp + "self_attn.out_proj.weight")),
                      "bias": g(lp + "self_attn.out_proj.bias")},
                "ln2": {"scale": g(lp + "layer_norm2.weight"),
                        "bias": g(lp + "layer_norm2.bias")},
                "fc1": {"kernel": _t(g(lp + "mlp.fc1.weight")),
                        "bias": g(lp + "mlp.fc1.bias")},
                "fc2": {"kernel": _t(g(lp + "mlp.fc2.weight")),
                        "bias": g(lp + "mlp.fc2.bias")},
            }
        )
    params = {
        "token_embedding": {"weight": g("embeddings.token_embedding.weight")},
        "position_embedding": g("embeddings.position_embedding.weight"),
        "final_layernorm": {
            "scale": g("final_layer_norm.weight"),
            "bias": g("final_layer_norm.bias"),
        },
        "text_projection": {"kernel": _t(sd["text_projection.weight"])}
        if "text_projection.weight" in sd
        else {"kernel": np.eye(cfg.hidden_size, cfg.projection_dim, dtype=np.float32)},
        "layers": _stack(layers),
    }
    return _cast(params, dtype)

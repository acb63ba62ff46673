"""Swin Transformer backbone in pure-functional JAX.

Used by two reference dependencies: the RAM Swin-L tagger
(grounding_evaluation/util/image_tagging.py:5-29) and GroundingDINO's
SwinT-OGC vision backbone (grounding_new_api.py:25,288). Weight layout
converts from HF SwinModel / the timm-style checkpoints both projects
use.

TPU design notes: window partitioning is pure reshape/transpose (free
in XLA); windowed attention batches all windows of all images into one
(B*nW, w*w, heads) attention call; the shifted-window mask is
precomputed per resolution as a constant.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import (
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from video_llava_tpu.ops.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny_test(cls):
        return cls(
            image_size=64,
            patch_size=4,
            embed_dim=24,
            depths=(2, 2),
            num_heads=(2, 4),
            window_size=4,
        )

    @classmethod
    def swin_t(cls):
        return cls()

    @classmethod
    def swin_l(cls):
        return cls(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48))

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (self.num_stages - 1)


# -- init ----------------------------------------------------------------------


def _block_init(key, dim, heads, window, mlp_dim, dtype):
    ks = jax.random.split(key, 5)
    num_rel = (2 * window - 1) ** 2
    return {
        "ln1": layer_norm_init(dim, dtype),
        "qkv": linear_init(ks[0], dim, 3 * dim, dtype=dtype),
        "proj": linear_init(ks[1], dim, dim, dtype=dtype),
        "rel_bias": jax.random.normal(ks[2], (num_rel, heads), dtype) * 0.02,
        "ln2": layer_norm_init(dim, dtype),
        "fc1": linear_init(ks[3], dim, mlp_dim, dtype=dtype),
        "fc2": linear_init(ks[4], mlp_dim, dim, dtype=dtype),
    }


def init_params(key, cfg: SwinConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 2 + cfg.num_stages)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_channels
    params = {
        "patch_embed": {
            "kernel": jax.random.normal(ks[0], (patch_dim, cfg.embed_dim), dtype)
            * patch_dim**-0.5,
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "patch_norm": layer_norm_init(cfg.embed_dim, dtype),
        "stages": [],
        "final_norm": layer_norm_init(cfg.num_features, dtype),
    }
    dim = cfg.embed_dim
    for s in range(cfg.num_stages):
        stage_key = jax.random.split(ks[2 + s], cfg.depths[s] + 1)
        blocks = [
            _block_init(
                stage_key[i],
                dim,
                cfg.num_heads[s],
                cfg.window_size,
                int(dim * cfg.mlp_ratio),
                dtype,
            )
            for i in range(cfg.depths[s])
        ]
        stage = {"blocks": blocks}
        if s < cfg.num_stages - 1:
            stage["downsample"] = {
                "norm": layer_norm_init(4 * dim, dtype),
                "reduction": linear_init(
                    stage_key[-1], 4 * dim, 2 * dim, use_bias=False, dtype=dtype
                ),
            }
            dim *= 2
        params["stages"].append(stage)
    return params


# -- window helpers -------------------------------------------------------------


def _window_partition(x, w):
    """(b, h, w_, c) -> (b*nW, w*w, c)"""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(windows, w, hh, ww):
    b = windows.shape[0] // ((hh // w) * (ww // w))
    x = windows.reshape(b, hh // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh, ww, -1)


@functools.lru_cache(maxsize=64)
def _relative_position_index(
    window: int, table_window: Optional[int] = None
) -> np.ndarray:
    """Bias-table indices for a (window x window) attention window.

    table_window: the CONFIG window the checkpoint's bias table was
    built for — its rows are laid out at stride 2*table_window - 1.
    When the runtime window shrinks below it (tiny feature maps), the
    same relative displacements must still be looked up at the table's
    stride, not the shrunken window's (caught by adversarial review)."""
    tw = window if table_window is None else table_window
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += tw - 1
    rel[:, :, 1] += tw - 1
    rel[:, :, 0] *= 2 * tw - 1
    return rel.sum(-1)  # (w*w, w*w)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(hh: int, ww: int, window: int, shift: int) -> np.ndarray:
    """HF/Swin attention mask for shifted windows: (nW, w*w, w*w) with
    0 for allowed and -100 for cross-region pairs."""
    img_mask = np.zeros((1, hh, ww, 1), np.float32)
    cnt = 0
    for h_sl in (
        slice(0, -window),
        slice(-window, -shift),
        slice(-shift, None),
    ):
        for w_sl in (
            slice(0, -window),
            slice(-window, -shift),
            slice(-shift, None),
        ):
            img_mask[:, h_sl, w_sl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, hh // window, window, ww // window, window, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(
    p, x, heads, window, shift_mask: Optional[np.ndarray],
    table_window: Optional[int] = None,
):
    """x: (B_windows, w*w, c)."""
    bw, n, c = x.shape
    hd = c // heads
    qkv = linear(p["qkv"], x).reshape(bw, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = hd**-0.5
    logits = (
        jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    idx = _relative_position_index(window, table_window)
    bias = p["rel_bias"][jnp.asarray(idx.reshape(-1))].reshape(n, n, heads)
    logits = logits + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if shift_mask is not None:
        nW = shift_mask.shape[0]
        m = jnp.asarray(shift_mask)  # (nW, n, n)
        logits = logits.reshape(bw // nW, nW, heads, n, n) + m[None, :, None]
        logits = logits.reshape(bw, heads, n, n)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return linear(p["proj"], out.reshape(bw, n, c))


def _block(p, x, hh, ww, heads, window, shift, eps):
    b, L, c = x.shape
    # HF parity for non-window-divisible maps (e.g. GroundingDINO at
    # 800px -> 200x200 patches, window 7): shrink the window when it
    # exceeds the resolution, right/bottom zero-pad to a window
    # multiple, attend, crop back (transformers SwinLayer.maybe_pad).
    cfg_window = window
    if min(hh, ww) <= window:
        window, shift = min(hh, ww), 0
    pad_b, pad_r = -hh % window, -ww % window
    hp, wp = hh + pad_b, ww + pad_r
    shortcut = x
    x = layer_norm(p["ln1"], x, eps)
    x = x.reshape(b, hh, ww, c)
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(hp, wp, window, shift)
    else:
        mask = None
    wins = _window_partition(x, window)
    wins = _window_attention(p, wins, heads, window, mask,
                             table_window=cfg_window)
    x = _window_reverse(wins, window, hp, wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :hh, :ww]
    x = shortcut + x.reshape(b, L, c)
    h = layer_norm(p["ln2"], x, eps)
    x = x + linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))
    return x


def _patch_merge(p, x, hh, ww, eps):
    """(b, h*w, c) -> (b, ceil(h/2)*ceil(w/2), 2c), HF ordering
    (x0 x1 x2 x3 = [0::2,0::2], [1::2,0::2], [0::2,1::2], [1::2,1::2]);
    odd dims zero-pad first (transformers SwinPatchMerging.maybe_pad)."""
    b, L, c = x.shape
    x = x.reshape(b, hh, ww, c)
    if hh % 2 or ww % 2:
        x = jnp.pad(x, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = x.reshape(b, x.shape[1] * x.shape[2], 4 * c)
    x = layer_norm(p["norm"], x, eps)
    return linear(p["reduction"], x)


def forward_features(
    params, pixels: jax.Array, cfg: SwinConfig
) -> List[jax.Array]:
    """pixels: (b, H, W, 3) -> list of per-stage feature maps
    [(b, H_s, W_s, C_s)] (multi-scale, as GroundingDINO consumes)."""
    b, H, W, _ = pixels.shape
    ps = cfg.patch_size
    x = pixels.reshape(b, H // ps, ps, W // ps, ps, pixels.shape[-1])
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (H // ps) * (W // ps), -1)
    # Activations follow the PARAMETER dtype (not the pixel dtype):
    # bf16 checkpoints fed f32-normalized pixels otherwise propagate
    # f32 activations into downstream convs (GroundingDINO extra-level
    # projections) that require matching operand dtypes.
    pdtype = params["patch_embed"]["kernel"].dtype
    x = jnp.dot(
        x, params["patch_embed"]["kernel"], preferred_element_type=jnp.float32
    ).astype(pdtype) + params["patch_embed"]["bias"]
    x = layer_norm(params["patch_norm"], x, cfg.layer_norm_eps)

    hh, ww = H // ps, W // ps
    dim = cfg.embed_dim
    outputs = []
    for s, stage in enumerate(params["stages"]):
        for i, blk in enumerate(stage["blocks"]):
            shift = 0 if i % 2 == 0 else cfg.window_size // 2
            x = _block(
                blk, x, hh, ww, cfg.num_heads[s], cfg.window_size, shift,
                cfg.layer_norm_eps,
            )
        outputs.append(x.reshape(b, hh, ww, dim))
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, hh, ww, cfg.layer_norm_eps)
            hh, ww, dim = (hh + 1) // 2, (ww + 1) // 2, dim * 2
    return outputs


def forward_pooled(params, pixels: jax.Array, cfg: SwinConfig) -> jax.Array:
    """Final-stage features, LN'd and mean-pooled: (b, num_features)
    (HF SwinModel pooler_output equivalent)."""
    feats = forward_features(params, pixels, cfg)[-1]
    b, hh, ww, c = feats.shape
    x = layer_norm(params["final_norm"], feats.reshape(b, hh * ww, c),
                   cfg.layer_norm_eps)
    return jnp.mean(x, axis=1)


# -- HF conversion ---------------------------------------------------------------


def convert_hf_swin(sd, cfg: SwinConfig, dtype=jnp.float32, prefix: str = ""):
    """transformers.SwinModel state dict -> our params."""

    def t(w):
        return np.ascontiguousarray(w.T)

    g = lambda k: sd[prefix + k]
    conv = g("embeddings.patch_embeddings.projection.weight")  # (C,3,P,P)
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)
    params = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": g("embeddings.patch_embeddings.projection.bias"),
        },
        "patch_norm": {
            "scale": g("embeddings.norm.weight"),
            "bias": g("embeddings.norm.bias"),
        },
        "stages": [],
        # SwinBackbone (used by GroundingDINO) has no final layernorm.
        "final_norm": {
            "scale": g("layernorm.weight"),
            "bias": g("layernorm.bias"),
        }
        if prefix + "layernorm.weight" in sd
        else {
            "scale": np.ones((cfg.num_features,), np.float32),
            "bias": np.zeros((cfg.num_features,), np.float32),
        },
    }
    for s in range(cfg.num_stages):
        blocks = []
        for i in range(cfg.depths[s]):
            p = f"encoder.layers.{s}.blocks.{i}."
            q_w = g(p + "attention.self.query.weight")
            k_w = g(p + "attention.self.key.weight")
            v_w = g(p + "attention.self.value.weight")
            q_b = g(p + "attention.self.query.bias")
            k_b = g(p + "attention.self.key.bias")
            v_b = g(p + "attention.self.value.bias")
            blocks.append(
                {
                    "ln1": {
                        "scale": g(p + "layernorm_before.weight"),
                        "bias": g(p + "layernorm_before.bias"),
                    },
                    "qkv": {
                        "kernel": np.concatenate([t(q_w), t(k_w), t(v_w)], axis=1),
                        "bias": np.concatenate([q_b, k_b, v_b]),
                    },
                    "proj": {
                        "kernel": t(g(p + "attention.output.dense.weight")),
                        "bias": g(p + "attention.output.dense.bias"),
                    },
                    "rel_bias": g(
                        p + "attention.self.relative_position_bias_table"
                    ),
                    "ln2": {
                        "scale": g(p + "layernorm_after.weight"),
                        "bias": g(p + "layernorm_after.bias"),
                    },
                    "fc1": {
                        "kernel": t(g(p + "intermediate.dense.weight")),
                        "bias": g(p + "intermediate.dense.bias"),
                    },
                    "fc2": {
                        "kernel": t(g(p + "output.dense.weight")),
                        "bias": g(p + "output.dense.bias"),
                    },
                }
            )
        stage = {"blocks": blocks}
        dkey = f"encoder.layers.{s}.downsample."
        if prefix + dkey + "reduction.weight" in sd:
            stage["downsample"] = {
                "norm": {
                    "scale": g(dkey + "norm.weight"),
                    "bias": g(dkey + "norm.bias"),
                },
                "reduction": {"kernel": t(g(dkey + "reduction.weight"))},
            }
        params["stages"].append(stage)
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def convert_timm_swin(sd, cfg: SwinConfig, dtype=jnp.float32, prefix: str = ""):
    """timm-style Swin state dict -> our params.

    This is the layout of the reference stack's non-HF checkpoints:
    RAM's vendored visual_encoder and GroundingDINO's backbone both use
    timm key names (patch_embed.proj, layers.{s}.blocks.{i}.attn.qkv,
    downsample.reduction, ...) with the qkv projection already fused.
    """

    def t(w):
        return np.ascontiguousarray(np.asarray(w).T)

    g = lambda k: np.asarray(sd[prefix + k])
    conv = g("patch_embed.proj.weight")  # (C, 3, P, P)
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)
    params = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": g("patch_embed.proj.bias"),
        },
        "patch_norm": {
            "scale": g("patch_embed.norm.weight"),
            "bias": g("patch_embed.norm.bias"),
        },
        "stages": [],
        "final_norm": {
            "scale": g("norm.weight"),
            "bias": g("norm.bias"),
        }
        if prefix + "norm.weight" in sd
        else {
            "scale": np.ones((cfg.num_features,), np.float32),
            "bias": np.zeros((cfg.num_features,), np.float32),
        },
    }
    for s in range(cfg.num_stages):
        blocks = []
        for i in range(cfg.depths[s]):
            p = f"layers.{s}.blocks.{i}."
            blocks.append(
                {
                    "ln1": {"scale": g(p + "norm1.weight"),
                            "bias": g(p + "norm1.bias")},
                    "qkv": {"kernel": t(g(p + "attn.qkv.weight")),
                            "bias": g(p + "attn.qkv.bias")},
                    "proj": {"kernel": t(g(p + "attn.proj.weight")),
                             "bias": g(p + "attn.proj.bias")},
                    "rel_bias": g(p + "attn.relative_position_bias_table"),
                    "ln2": {"scale": g(p + "norm2.weight"),
                            "bias": g(p + "norm2.bias")},
                    "fc1": {"kernel": t(g(p + "mlp.fc1.weight")),
                            "bias": g(p + "mlp.fc1.bias")},
                    "fc2": {"kernel": t(g(p + "mlp.fc2.weight")),
                            "bias": g(p + "mlp.fc2.bias")},
                }
            )
        stage = {"blocks": blocks}
        dkey = f"layers.{s}.downsample."
        if prefix + dkey + "reduction.weight" in sd:
            stage["downsample"] = {
                "norm": {"scale": g(dkey + "norm.weight"),
                         "bias": g(dkey + "norm.bias")},
                "reduction": {"kernel": t(g(dkey + "reduction.weight"))},
            }
        params["stages"].append(stage)
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

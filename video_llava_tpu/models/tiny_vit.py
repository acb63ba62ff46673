"""TinyViT image encoder (MobileSAM) in pure-functional JAX.

The reference's grounding stack runs MobileSAM as its LIVE default
segmenter (grounding_evaluation/grounding_new_api.py:104 sets
`cfg['sam_variant'] = 'mobile'`, checkpoint at :71) — SAM ViT-H is the
commented-out alternative. TinyViT-5M is the MobileSAM image encoder:
a conv stem + one MBConv stage + three window-attention stages with
trained attention biases, ~10x cheaper than SAM ViT-B at 1024px.

TPU design notes:
  * NHWC everywhere; 1x1 convs are matmuls (MXU), 3x3s go through
    lax.conv_general_dilated (XLA tiles them onto the MXU), depthwise
    convs use feature_group_count.
  * Conv+BatchNorm pairs are FOLDED into conv weight+bias at
    conversion time (inference semantics are identical); params hold
    only folded kernels, so the forward has no BN ops at all.
  * Attention biases are expanded to dense (heads, N, N) tables at
    conversion (N = window**2 <= 196: trivially VMEM-resident), so the
    per-window attention is one fused matmul+bias+softmax chain.
  * The MobileSAM variant keeps the FINAL patch-merge at stride 1
    (out_dim 320/448/576 rule in the official tiny_vit_sam.py), so a
    1024px input yields the 64x64 embedding grid SAM's mask decoder
    expects.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class TinyViTConfig:
    image_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)  # TinyViT-5M
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand: float = 4.0
    local_conv_size: int = 3
    output_channels: int = 256
    layer_norm_eps: float = 1e-5

    @property
    def grid(self) -> int:
        # stem /4, two stride-2 merges, final merge stride 1
        return self.image_size // 16

    def merge_stride(self, i: int) -> int:
        """Patch-merge i feeds stage i+1; MobileSAM keeps the final
        merge at stride 1 so the grid stays image_size/16."""
        return 1 if i == len(self.embed_dims) - 2 else 2

    def stage_resolution(self, i: int) -> int:
        """Token-map side length at stage i (0 = MBConv stage)."""
        r = self.image_size // 4
        for j in range(i):
            r = -(-r // self.merge_stride(j))
        return r

    @classmethod
    def tiny_test(cls):
        return cls(
            image_size=64,
            embed_dims=(8, 12, 16, 20),
            depths=(1, 1, 2, 1),
            num_heads=(2, 2, 2, 2),
            window_sizes=(2, 2, 2, 2),
            output_channels=16,
        )


# -- ops -----------------------------------------------------------------------


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv1x1(p, x):
    """(b, h, w, ci) @ (ci, co) + bias."""
    return (
        jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32).astype(
            x.dtype
        )
        + p["bias"]
    )


def _conv2d(p, x, stride: int):
    """Full conv, kernel HWIO, SAME-style pad = k//2 (TinyViT uses
    pad = ks // 2 everywhere)."""
    k = p["kernel"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _dwconv(p, x, stride: int = 1):
    """Depthwise conv, kernel (kh, kw, 1, C)."""
    k = p["kernel"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    return y + p["bias"]


def _mbconv(p, x):
    """MBConv (tiny_vit.MBConv): 1x1 expand -> GELU -> 3x3 depthwise ->
    GELU -> 1x1 project -> +residual -> GELU."""
    h = _gelu(_conv1x1(p["conv1"], x))
    h = _gelu(_dwconv(p["conv2"], h))
    h = _conv1x1(p["conv3"], h)
    return _gelu(x + h)


def _patch_merge(p, x, stride: int):
    """PatchMerging: 1x1 -> GELU -> 3x3 depthwise (stride) -> GELU ->
    1x1. Returns NHWC at the merged resolution."""
    x = _gelu(_conv1x1(p["conv1"], x))
    x = _gelu(_dwconv(p["conv2"], x, stride=stride))
    return _conv1x1(p["conv3"], x)


def _window_attention(p, x, num_heads: int, eps: float):
    """LeViT-style attention over windows with trained biases.

    x: (nwin, N, C). p["bias"] is the dense (heads, N, N) table
    (expanded from the checkpoint's (heads, n_offsets) at conversion).
    attn_ratio=1 in TinyViT blocks: q/k/v all have head_dim = C//heads.
    """
    nw, n, c = x.shape
    hd = c // num_heads
    h = layer_norm(p["norm"], x, eps)
    qkv = linear(p["qkv"], h).reshape(nw, n, num_heads, 3, hd)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    logits = (
        jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        * (hd**-0.5)
        + p["bias"].astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return linear(p["proj"], out.reshape(nw, n, c))


def _block(p, x, window: int, num_heads: int, eps: float):
    """TinyViTBlock: windowed attention (+residual), depthwise local
    conv, MLP (+residual). x: (b, H, W, C) -> same."""
    b, hh, ww, c = x.shape
    res = x
    if hh == window and ww == window:
        a = _window_attention(
            p["attn"], x.reshape(b, hh * ww, c), num_heads, eps
        ).reshape(b, hh, ww, c)
    else:
        ph = (window - hh % window) % window
        pw = (window - ww % window) % window
        h = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if ph or pw else x
        hp, wp = hh + ph, ww + pw
        wins = h.reshape(
            b, hp // window, window, wp // window, window, c
        ).transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
        wins = _window_attention(p["attn"], wins, num_heads, eps)
        h = wins.reshape(
            b, hp // window, wp // window, window, window, c
        ).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        a = h[:, :hh, :ww]
    x = res + a
    x = _dwconv(p["local_conv"], x)
    t = x.reshape(b, hh * ww, c)
    h = layer_norm(p["mlp"]["norm"], t, eps)
    h = linear(p["mlp"]["fc2"], _gelu(linear(p["mlp"]["fc1"], h)))
    return (t + h).reshape(b, hh, ww, c)


def encoder(params, pixels: jax.Array, cfg: TinyViTConfig) -> jax.Array:
    """(b, S, S, 3) normalized pixels -> (b, grid, grid, out_c) image
    embeddings (TinyViT.forward_features + SAM neck)."""
    eps = cfg.layer_norm_eps
    x = pixels.astype(params["patch_embed"]["conv1"]["kernel"].dtype)
    x = _gelu(_conv2d(params["patch_embed"]["conv1"], x, stride=2))
    x = _conv2d(params["patch_embed"]["conv2"], x, stride=2)

    for bp in params["stage0"]:
        x = _mbconv(bp, x)
    x = _patch_merge(params["merges"][0], x, cfg.merge_stride(0))

    for si, stage in enumerate(params["stages"]):
        i = si + 1  # stage index in cfg arrays
        for bp in stage:
            x = _block(bp, x, cfg.window_sizes[i], cfg.num_heads[i], eps)
        if si < len(params["merges"]) - 1:
            x = _patch_merge(
                params["merges"][si + 1], x, cfg.merge_stride(si + 1)
            )

    # SAM neck: 1x1 conv (no bias) -> LN -> 3x3 conv (no bias) -> LN
    x = jnp.dot(
        x, params["neck"]["conv1"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    x = layer_norm(params["neck"]["ln1"], x, 1e-6)
    x = jax.lax.conv_general_dilated(
        x, params["neck"]["conv2"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return layer_norm(params["neck"]["ln2"], x, 1e-6)


# -- attention bias index ---------------------------------------------------------


def attention_bias_index(window: int) -> Tuple[np.ndarray, int]:
    """(N, N) offset-class index + class count, exactly the official
    TinyViT construction (itertools.product order)."""
    pts = [(i, j) for i in range(window) for j in range(window)]
    offsets: dict = {}
    idxs = []
    for p1 in pts:
        for p2 in pts:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(pts)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


# -- init --------------------------------------------------------------------------


def init_params(key, cfg: TinyViTConfig, dtype=jnp.float32):
    """Random params in the BN-folded layout (weights-free fallback)."""
    keys = iter(jax.random.split(key, 256))

    def conv(ci, co, k=1):
        kern = (
            jax.random.normal(next(keys), (k, k, ci, co), dtype)
            * (0.4 / np.sqrt(k * k * ci))
            if k > 1
            else jax.random.normal(next(keys), (ci, co), dtype)
            / np.sqrt(ci)
        )
        return {"kernel": kern, "bias": jnp.zeros((co,), dtype)}

    def dw(c, k=3):
        return {
            "kernel": jax.random.normal(next(keys), (k, k, 1, c), dtype)
            * (0.4 / k),
            "bias": jnp.zeros((c,), dtype),
        }

    def lin(ci, co):
        return {
            "kernel": jax.random.normal(next(keys), (ci, co), dtype)
            / np.sqrt(ci),
            "bias": jnp.zeros((co,), dtype),
        }

    def ln(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    dims = cfg.embed_dims
    params = {
        "patch_embed": {
            "conv1": conv(3, dims[0] // 2, 3),
            "conv2": conv(dims[0] // 2, dims[0], 3),
        },
        "stage0": [
            {
                "conv1": conv(dims[0], int(dims[0] * cfg.mbconv_expand)),
                "conv2": dw(int(dims[0] * cfg.mbconv_expand)),
                "conv3": conv(int(dims[0] * cfg.mbconv_expand), dims[0]),
            }
            for _ in range(cfg.depths[0])
        ],
        "merges": [
            {
                "conv1": conv(dims[i], dims[i + 1]),
                "conv2": dw(dims[i + 1]),
                "conv3": conv(dims[i + 1], dims[i + 1]),
            }
            for i in range(len(dims) - 1)
        ],
        "stages": [],
        "neck": {
            "conv1": jax.random.normal(
                next(keys), (dims[-1], cfg.output_channels), dtype
            ) / np.sqrt(dims[-1]),
            "ln1": ln(cfg.output_channels),
            "conv2": jax.random.normal(
                next(keys), (3, 3, cfg.output_channels, cfg.output_channels),
                dtype,
            ) * (0.1 / np.sqrt(9 * cfg.output_channels)),
            "ln2": ln(cfg.output_channels),
        },
    }
    for i in range(1, len(dims)):
        d, nh, ws = dims[i], cfg.num_heads[i], cfg.window_sizes[i]
        idx, n_off = attention_bias_index(ws)
        blocks = []
        for _ in range(cfg.depths[i]):
            table = (
                jax.random.normal(next(keys), (nh, n_off), dtype) * 0.02
            )
            blocks.append(
                {
                    "attn": {
                        "norm": ln(d),
                        "qkv": lin(d, 3 * d),
                        "proj": lin(d, d),
                        "bias": jnp.asarray(np.asarray(table)[:, idx]),
                    },
                    "local_conv": dw(d, cfg.local_conv_size),
                    "mlp": {
                        "norm": ln(d),
                        "fc1": lin(d, int(d * cfg.mlp_ratio)),
                        "fc2": lin(int(d * cfg.mlp_ratio), d),
                    },
                }
            )
        params["stages"].append(blocks)
    return params


# -- checkpoint conversion ----------------------------------------------------------


def _fold_bn(sd, prefix: str, eps: float = 1e-5):
    """Conv2d_BN -> folded (conv kernel OIHW, bias)."""
    w = np.asarray(sd[prefix + "c.weight"], np.float32)
    g = np.asarray(sd[prefix + "bn.weight"], np.float32)
    b = np.asarray(sd[prefix + "bn.bias"], np.float32)
    mean = np.asarray(sd[prefix + "bn.running_mean"], np.float32)
    var = np.asarray(sd[prefix + "bn.running_var"], np.float32)
    scale = g / np.sqrt(var + eps)
    return w * scale[:, None, None, None], b - mean * scale


def _folded_conv(sd, prefix: str):
    """-> {'kernel','bias'}: (ci, co) for 1x1, HWIO otherwise,
    (kh, kw, 1, co) for depthwise."""
    w, b = _fold_bn(sd, prefix)
    o, i, kh, kw = w.shape
    if kh == kw == 1:
        return {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T), "bias": b}
    # depthwise (groups == out channels) comes through with i == 1
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": b}


def convert_tiny_vit(sd, cfg: TinyViTConfig, prefix: str = "image_encoder.",
                     dtype=jnp.float32):
    """Official MobileSAM `mobile_sam.pt` image_encoder.* keys -> params.

    Layout (tiny_vit_sam.py): patch_embed.seq.{0,2} Conv2d_BN;
    layers.0 ConvLayer of MBConv blocks; layers.{1,2,3} BasicLayers of
    TinyViTBlocks (attn.norm/qkv/proj/attention_biases, local_conv,
    mlp.norm/fc1/fc2); layers.{0,1,2}.downsample PatchMerging;
    neck.{0..3} = conv1x1 / LayerNorm2d / conv3x3 / LayerNorm2d.
    BatchNorms are folded (inference-exact)."""

    def t(w):
        return np.ascontiguousarray(np.asarray(w, np.float32).T)

    def lin(p):
        return {"kernel": t(sd[p + ".weight"]), "bias": np.asarray(
            sd[p + ".bias"], np.float32)}

    def ln(p):
        return {"scale": np.asarray(sd[p + ".weight"], np.float32),
                "bias": np.asarray(sd[p + ".bias"], np.float32)}

    dims = cfg.embed_dims
    params = {
        "patch_embed": {
            "conv1": _folded_conv(sd, prefix + "patch_embed.seq.0."),
            "conv2": _folded_conv(sd, prefix + "patch_embed.seq.2."),
        },
        "stage0": [
            {
                "conv1": _folded_conv(sd, f"{prefix}layers.0.blocks.{j}.conv1."),
                "conv2": _folded_conv(sd, f"{prefix}layers.0.blocks.{j}.conv2."),
                "conv3": _folded_conv(sd, f"{prefix}layers.0.blocks.{j}.conv3."),
            }
            for j in range(cfg.depths[0])
        ],
        "merges": [
            {
                "conv1": _folded_conv(sd, f"{prefix}layers.{i}.downsample.conv1."),
                "conv2": _folded_conv(sd, f"{prefix}layers.{i}.downsample.conv2."),
                "conv3": _folded_conv(sd, f"{prefix}layers.{i}.downsample.conv3."),
            }
            for i in range(len(dims) - 1)
        ],
        "stages": [],
        "neck": {
            "conv1": t(
                np.asarray(sd[prefix + "neck.0.weight"], np.float32)[:, :, 0, 0]
            ),
            "ln1": ln(prefix + "neck.1"),
            "conv2": np.asarray(
                sd[prefix + "neck.2.weight"], np.float32
            ).transpose(2, 3, 1, 0),
            "ln2": ln(prefix + "neck.3"),
        },
    }
    for i in range(1, len(dims)):
        nh, ws = cfg.num_heads[i], cfg.window_sizes[i]
        blocks = []
        for j in range(cfg.depths[i]):
            p = f"{prefix}layers.{i}.blocks.{j}."
            table = np.asarray(sd[p + "attn.attention_biases"], np.float32)
            if p + "attn.attention_bias_idxs" in sd:
                idx = np.asarray(sd[p + "attn.attention_bias_idxs"], np.int64)
            else:
                idx, _ = attention_bias_index(ws)
            blocks.append(
                {
                    "attn": {
                        "norm": ln(p + "attn.norm"),
                        "qkv": lin(p + "attn.qkv"),
                        "proj": lin(p + "attn.proj"),
                        "bias": np.ascontiguousarray(table[:, idx]),
                    },
                    "local_conv": _folded_conv(sd, p + "local_conv."),
                    "mlp": {
                        "norm": ln(p + "mlp.norm"),
                        "fc1": lin(p + "mlp.fc1"),
                        "fc2": lin(p + "mlp.fc2"),
                    },
                }
            )
        params["stages"].append(blocks)
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

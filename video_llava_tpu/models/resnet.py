"""NHWC ResNet trunks (inference-mode BN) for the XMem/DEVA propagation
encoders.

The reference's DEVA tracker (grounding_evaluation/grounding_new_api.py
:20-24, :285-286) wraps trained torch encoders: a ResNet-50 key encoder
and a ResNet-18 value encoder (XMem lineage). These trunks are the
TPU-native equivalents: channels-last layout (TPU conv native), folded
inference BatchNorm, stages unrolled at trace time (<= 6 blocks each, so
compile cost is trivial), features returned at strides 4/8/16.

Converter helpers map torch state_dicts (torchvision ResNet naming, the
layout XMem/DEVA checkpoints use for their encoder submodules).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetTrunkConfig:
    """A 3-stage trunk (conv1 + layer1..layer3, no layer4/fc)."""

    block: str  # 'basic' (resnet18) | 'bottleneck' (resnet50)
    stage_sizes: Tuple[int, int, int]  # blocks per layer
    in_channels: int = 3

    @classmethod
    def resnet50(cls, in_channels: int = 3):
        return cls("bottleneck", (3, 4, 6), in_channels)

    @classmethod
    def resnet18(cls, in_channels: int = 3):
        return cls("basic", (2, 2, 2), in_channels)

    @property
    def widths(self) -> Tuple[int, int, int]:
        return (64, 128, 256)

    @property
    def out_channels(self) -> Tuple[int, int, int]:
        mult = 4 if self.block == "bottleneck" else 1
        return tuple(w * mult for w in self.widths)


def conv2d(p, x, stride: int = 1, padding=None):
    """x: (..., H, W, C) with leading dims folded into batch.

    Default padding is torch-style symmetric k//2 per side — NOT XLA
    'SAME', which pads asymmetrically for stride > 1 and would break
    parity with torch checkpoints."""
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    k = p["kernel"]
    if padding is None:
        padding = [(k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2]
    elif isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.reshape(lead + y.shape[1:])


def batch_norm(p, x, eps: float = 1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        p["bias"].astype(jnp.float32)
        - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + shift


def max_pool_3x3s2(x):
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return y.reshape(lead + y.shape[1:])


def _conv_init(key, kh, kw, cin, cout, dtype, use_bias=False):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * np.sqrt(
        2.0 / fan_in
    )
    p = {"kernel": w}
    if use_bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _bn_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def _block_init(key, block, cin, width, stride, dtype):
    ks = jax.random.split(key, 4)
    if block == "bottleneck":
        cout = width * 4
        p = {
            "conv1": _conv_init(ks[0], 1, 1, cin, width, dtype),
            "bn1": _bn_init(width, dtype),
            "conv2": _conv_init(ks[1], 3, 3, width, width, dtype),
            "bn2": _bn_init(width, dtype),
            "conv3": _conv_init(ks[2], 1, 1, width, cout, dtype),
            "bn3": _bn_init(cout, dtype),
        }
    else:
        cout = width
        p = {
            "conv1": _conv_init(ks[0], 3, 3, cin, width, dtype),
            "bn1": _bn_init(width, dtype),
            "conv2": _conv_init(ks[1], 3, 3, width, width, dtype),
            "bn2": _bn_init(width, dtype),
        }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(ks[3], 1, 1, cin, cout, dtype),
            "bn": _bn_init(cout, dtype),
        }
    return p, cout


def init_trunk_params(key, cfg: ResNetTrunkConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    params = {
        "conv1": _conv_init(ks[0], 7, 7, cfg.in_channels, 64, dtype),
        "bn1": _bn_init(64, dtype),
    }
    cin = 64
    for li, (n, width) in enumerate(zip(cfg.stage_sizes, cfg.widths)):
        blocks = []
        bks = jax.random.split(ks[li + 1], n)
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            bp, cin = _block_init(
                bks[bi], cfg.block, cin, width, stride, dtype
            )
            blocks.append(bp)
        params[f"layer{li + 1}"] = blocks
    return params


def _block_forward(p, x, block, stride):
    identity = x
    if block == "bottleneck":
        y = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x)))
        y = jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], y, stride)))
        y = batch_norm(p["bn3"], conv2d(p["conv3"], y))
    else:
        y = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, stride)))
        y = batch_norm(p["bn2"], conv2d(p["conv2"], y))
    if "downsample" in p:
        identity = batch_norm(
            p["downsample"]["bn"], conv2d(p["downsample"]["conv"], x, stride)
        )
    return jax.nn.relu(y + identity)


def trunk_forward(params, x, cfg: ResNetTrunkConfig):
    """x: (..., H, W, C) -> (f4, f8, f16) at strides 4/8/16 (the
    layer1/2/3 outputs XMem taps for its skip connections)."""
    y = jax.nn.relu(batch_norm(params["bn1"], conv2d(params["conv1"], x, 2)))
    y = max_pool_3x3s2(y)
    feats = []
    for li, n in enumerate(cfg.stage_sizes):
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            y = _block_forward(
                params[f"layer{li + 1}"][bi], y, cfg.block, stride
            )
        feats.append(y)
    return tuple(feats)


# -- torch conversion ---------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def torch_conv(sd, name, dtype):
    p = {"kernel": jnp.asarray(_t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
                               dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{name}.bias"]), dtype)
    return p


def torch_bn(sd, name, dtype):
    return {
        "scale": jnp.asarray(_t(sd[f"{name}.weight"]), dtype),
        "bias": jnp.asarray(_t(sd[f"{name}.bias"]), dtype),
        "mean": jnp.asarray(_t(sd[f"{name}.running_mean"]), dtype),
        "var": jnp.asarray(_t(sd[f"{name}.running_var"]), dtype),
    }


def convert_torch_trunk(sd, cfg: ResNetTrunkConfig, prefix: str = "",
                        dtype=jnp.float32):
    """torchvision-style ResNet state_dict (as embedded in XMem/DEVA
    checkpoints under e.g. 'key_encoder.') -> trunk params."""
    params = {
        "conv1": torch_conv(sd, f"{prefix}conv1", dtype),
        "bn1": torch_bn(sd, f"{prefix}bn1", dtype),
    }
    n_convs = 3 if cfg.block == "bottleneck" else 2
    for li, n in enumerate(cfg.stage_sizes):
        blocks = []
        for bi in range(n):
            b = f"{prefix}layer{li + 1}.{bi}"
            p = {}
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = torch_conv(sd, f"{b}.conv{ci}", dtype)
                p[f"bn{ci}"] = torch_bn(sd, f"{b}.bn{ci}", dtype)
            if f"{b}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": torch_conv(sd, f"{b}.downsample.0", dtype),
                    "bn": torch_bn(sd, f"{b}.downsample.1", dtype),
                }
            blocks.append(p)
        params[f"layer{li + 1}"] = blocks
    return params

"""wav2vec2-style CTC acoustic model (JAX) for forced alignment.

TPU-native replacement for the wav2vec2 phoneme/char CTC model that
whisperX uses for word-level alignment (reference
video_chatgpt/audio_transcript/transcribe.py:43-44 loads whisperx's
`load_align_model`). The encoder is one jitted program: conv feature
extractor (20 ms frames at 16 kHz) -> conv positional embedding ->
transformer stack -> CTC log-probs over a character vocabulary.

Weight layout converts from HF `Wav2Vec2ForCTC` (base, post-LN variant,
e.g. wav2vec2-base-960h) via :func:`convert_hf_wav2vec2`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_tpu.models import layers


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    blank_id: int = 0  # CTC blank == HF <pad>
    sample_rate: int = 16_000

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def tiny_test(cls):
        # conv strides multiply to the REAL 320-sample frame stride:
        # the old (5, 2) = stride 10 produced ~48k frames for a 30 s
        # segment, and the 2-layer transformer's 48k x 48k attention
        # took minutes to compile/run on CPU (found when the bench
        # aligner was first wired: align_segments 411 s at tiny size).
        return cls(
            vocab_size=12, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
            conv_stride=(16, 20), pos_conv_kernel=8, pos_conv_groups=4,
        )

    @property
    def frame_stride(self) -> int:
        """Input samples per output frame (320 for base = 20 ms)."""
        s = 1
        for st in self.conv_stride:
            s *= st
        return s

    def num_frames(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def _conv1d(x, w, b=None, stride=1, groups=1, padding="VALID"):
    """x: (t, cin), w: (k, cin/groups, cout) -> (t', cout)."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride,), padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )[0]
    if b is not None:
        y = y + b
    return y


def init_params(key, cfg: Wav2Vec2Config, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64 + 8 * cfg.num_layers))

    def conv_w(k, kern, cin, cout, groups=1):
        fan_in = kern * cin // groups
        return (jax.random.normal(k, (kern, cin // groups, cout), dtype)
                / np.sqrt(fan_in))

    convs = []
    cin = 1
    for i, (dim, kern) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"w": conv_w(next(keys), kern, cin, dim)}
        if i == 0:
            layer["gn_scale"] = jnp.ones((dim,), dtype)
            layer["gn_bias"] = jnp.zeros((dim,), dtype)
        convs.append(layer)
        cin = dim

    d = cfg.hidden_size

    def enc_layer():
        return {
            "q": layers.linear_init(next(keys), d, d, dtype=dtype),
            "k": layers.linear_init(next(keys), d, d, dtype=dtype),
            "v": layers.linear_init(next(keys), d, d, dtype=dtype),
            "o": layers.linear_init(next(keys), d, d, dtype=dtype),
            "ln1": layers.layer_norm_init(d, dtype),
            "fc1": layers.linear_init(next(keys), d, cfg.intermediate_size,
                                      dtype=dtype),
            "fc2": layers.linear_init(next(keys), cfg.intermediate_size, d,
                                      dtype=dtype),
            "ln2": layers.layer_norm_init(d, dtype),
        }

    return {
        "convs": convs,
        "proj_ln": layers.layer_norm_init(cfg.conv_dim[-1], dtype),
        "proj": layers.linear_init(next(keys), cfg.conv_dim[-1], d,
                                   dtype=dtype),
        "pos_conv_w": conv_w(next(keys), cfg.pos_conv_kernel, d, d,
                             cfg.pos_conv_groups),
        "pos_conv_b": jnp.zeros((d,), dtype),
        "enc_ln": layers.layer_norm_init(d, dtype),
        "layers": [enc_layer() for _ in range(cfg.num_layers)],
        "lm_head": layers.linear_init(next(keys), d, cfg.vocab_size,
                                      dtype=dtype),
    }


def _group_norm(x, scale, bias, groups=None, eps=1e-5):
    """Per-channel group norm over time (HF uses num_groups == channels:
    normalize each channel over the time axis)."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def _encoder_layer(p, x, num_heads):
    t, d = x.shape
    hd = d // num_heads

    def split(h):
        return h.reshape(t, num_heads, hd).transpose(1, 0, 2)

    q = split(layers.linear(p["q"], x)) / np.sqrt(hd)
    k = split(layers.linear(p["k"], x))
    v = split(layers.linear(p["v"], x))
    a = jax.nn.softmax(
        jnp.einsum("hqd,hkd->hqk", q, k).astype(jnp.float32), axis=-1
    ).astype(x.dtype)
    o = jnp.einsum("hqk,hkd->hqd", a, v).transpose(1, 0, 2).reshape(t, d)
    x = layers.layer_norm(p["ln1"], x + layers.linear(p["o"], o))
    h = jax.nn.gelu(layers.linear(p["fc1"], x), approximate=False)
    return layers.layer_norm(p["ln2"], x + layers.linear(p["fc2"], h))


def forward(params, audio: jax.Array, cfg: Wav2Vec2Config) -> jax.Array:
    """(num_samples,) float32 PCM @16 kHz -> (frames, vocab) log-probs."""
    x = audio[:, None]  # (t, 1)
    for i, layer in enumerate(params["convs"]):
        x = _conv1d(x, layer["w"], stride=cfg.conv_stride[i])
        if "gn_scale" in layer:
            x = _group_norm(x, layer["gn_scale"], layer["gn_bias"])
        x = jax.nn.gelu(x, approximate=False)

    x = layers.layer_norm(params["proj_ln"], x)
    x = layers.linear(params["proj"], x)

    # Conv positional embedding: SAME-ish padding (k//2 both sides, drop
    # one trailing column for even kernels), then post-LN encoder stack.
    k = cfg.pos_conv_kernel
    xp = jnp.pad(x, ((k // 2, k // 2), (0, 0)))
    pos = _conv1d(xp, params["pos_conv_w"], params["pos_conv_b"],
                  groups=cfg.pos_conv_groups)
    if k % 2 == 0:
        pos = pos[:-1]
    x = x + jax.nn.gelu(pos[: x.shape[0]], approximate=False)
    x = layers.layer_norm(params["enc_ln"], x)
    for lp in params["layers"]:
        x = _encoder_layer(lp, x, cfg.num_heads)

    logits = layers.linear(params["lm_head"], x)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def convert_hf_wav2vec2(sd, cfg: Wav2Vec2Config, dtype=jnp.float32):
    """HF Wav2Vec2ForCTC state dict -> our param tree.

    Handles the weight-norm parametrization of the positional conv
    (weight_g/weight_v) and both `wav2vec2.`-prefixed and bare keys.
    """
    sd = {k.removeprefix("wav2vec2."): np.asarray(v) for k, v in sd.items()}

    def t(name):
        return jnp.asarray(sd[name], dtype)

    def lin(prefix):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T, dtype)}
        if f"{prefix}.bias" in sd:
            p["bias"] = t(f"{prefix}.bias")
        return p

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    convs = []
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        layer = {"w": jnp.asarray(w.transpose(2, 1, 0), dtype)}  # (k,cin,cout)
        gn = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if gn in sd:
            layer["gn_scale"] = t(gn)
            layer["gn_bias"] = t(
                f"feature_extractor.conv_layers.{i}.layer_norm.bias"
            )
        convs.append(layer)

    g = sd["encoder.pos_conv_embed.conv.weight_g"]
    v = sd["encoder.pos_conv_embed.conv.weight_v"]
    # weight-norm: w = g * v / ||v||, norm over (in, kernel) per out-channel
    # (torch conv1d weight layout is (out, in/groups, kernel))
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    w = (g * v / norm).transpose(2, 1, 0)  # torch (out,in/g,k) -> (k,in/g,out)

    enc_layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        enc_layers.append({
            "q": lin(f"{pre}.attention.q_proj"),
            "k": lin(f"{pre}.attention.k_proj"),
            "v": lin(f"{pre}.attention.v_proj"),
            "o": lin(f"{pre}.attention.out_proj"),
            "ln1": ln(f"{pre}.layer_norm"),
            "fc1": lin(f"{pre}.feed_forward.intermediate_dense"),
            "fc2": lin(f"{pre}.feed_forward.output_dense"),
            "ln2": ln(f"{pre}.final_layer_norm"),
        })

    return {
        "convs": convs,
        "proj_ln": ln("feature_projection.layer_norm"),
        "proj": lin("feature_projection.projection"),
        "pos_conv_w": jnp.asarray(w, dtype),
        "pos_conv_b": t("encoder.pos_conv_embed.conv.bias"),
        "enc_ln": ln("encoder.layer_norm"),
        "layers": enc_layers,
        "lm_head": lin("lm_head"),
    }

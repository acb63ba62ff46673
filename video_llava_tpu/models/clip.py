"""CLIP (ViT-L/14) vision + text towers in pure-functional JAX.

Replaces the reference's HF CLIPVisionModel usage
(video_chatgpt/inference.py:92-94, chat.py:139-144,
scripts/save_spatio_temporal_clip_features.py:116-121): per-frame
forward, select the penultimate hidden state, drop the CLS token.

TPU-first design choices:
  * patch embedding is a patchify-reshape + one big matmul on the MXU
    (not a conv) — identical math to the stride-14 conv;
  * the 24 encoder layers are parameter-stacked and driven by
    `lax.scan`, so the tower compiles as one layer program;
  * attention runs through ops.attention (Pallas flash kernel on TPU);
  * frames are just batch: 100 frames encode as a single (100, 257, d)
    batched program, embarrassingly shardable over the mesh data axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.models.layers import (
    ACTIVATIONS,
    embed,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from video_llava_tpu.ops.attention import (
    flash_attention_bhsd,
    multi_head_attention,
)
from video_llava_tpu.ops.quant import quantize_rows_int8 as _quantize_rows


# -- encoder layer (shared by vision and text towers) ------------------------


def _encoder_layer_init(key, hidden: int, intermediate: int, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": layer_norm_init(hidden, dtype),
        "q": linear_init(ks[0], hidden, hidden, dtype=dtype),
        "k": linear_init(ks[1], hidden, hidden, dtype=dtype),
        "v": linear_init(ks[2], hidden, hidden, dtype=dtype),
        "o": linear_init(ks[3], hidden, hidden, dtype=dtype),
        "ln2": layer_norm_init(hidden, dtype),
        "fc1": linear_init(ks[4], hidden, intermediate, dtype=dtype),
        "fc2": linear_init(ks[5], intermediate, hidden, dtype=dtype),
    }


def _encoder_layer(p, x, *, num_heads: int, act, eps: float, causal: bool):
    b, s, d = x.shape
    hd = d // num_heads
    h = layer_norm(p["ln1"], x, eps)
    q = linear(p["q"], h).reshape(b, s, num_heads, hd)
    k = linear(p["k"], h).reshape(b, s, num_heads, hd)
    v = linear(p["v"], h).reshape(b, s, num_heads, hd)
    attn = multi_head_attention(q, k, v, causal=causal)
    x = x + linear(p["o"], attn.reshape(b, s, d))
    h = layer_norm(p["ln2"], x, eps)
    x = x + linear(p["fc2"], act(linear(p["fc1"], h)))
    return x


def _f32_accum_operands(*arrs):
    """CPU's DotThunk can't execute bf16 x bf16 -> f32 dots; upcast the
    operands on non-TPU backends (XLA folds the converts into the dot
    read on TPU anyway, so this is gated to keep the TPU program
    bf16-in)."""
    if jax.default_backend() != "tpu":
        return tuple(a.astype(jnp.float32) for a in arrs)
    return arrs


def _proj_heads(pp, x, h: int):
    """Head-major projection: x (b, s, K) -> (b, h, s, hd).

    The head transpose rides the matmul's output permutation (einsum
    'bsk,khf->bhsf') instead of a separate transpose op — a transpose
    feeding the flash kernel's custom call must otherwise materialize
    (profiled: ~48 ms of the 181 ms CLIP 100-frame encode across
    q/k/v/out copies + pads). Handles raw, weights-only-int8 and W8A8
    kernel layouts."""
    kern = pp["kernel"]
    if isinstance(kern, dict) and "qvalues_a8" in kern:
        # int8 path: a PLAIN-layout int8 dot (the permuted-output int8
        # einsum falls off XLA's native int8 matmul and compiles for
        # minutes), then scale/bias/transpose as one elementwise+copy
        # fusion into the head-major flash input.
        b, s, kdim = x.shape
        w8 = kern["qvalues_a8"]
        f = w8.shape[-1]
        hd = f // h
        xq, sx = _quantize_rows(x)
        y = jnp.dot(
            xq.reshape(b * s, kdim), w8, preferred_element_type=jnp.int32
        ).astype(jnp.float32).reshape(b, s, h, hd)
        y = y * sx[..., None] * kern["scales"].reshape(1, 1, h, hd)
        if "bias" in pp:
            y = y + pp["bias"].astype(jnp.float32).reshape(1, 1, h, hd)
        return y.astype(x.dtype).transpose(0, 2, 1, 3)
    else:
        if isinstance(kern, dict):  # weights-only int8: dequant fuses
            w = kern["qvalues"].astype(jnp.float32) * kern["scales"]
            w = w.astype(x.dtype)
        else:
            w = kern
        f = w.shape[-1]
        hd = f // h
        xe, we = _f32_accum_operands(x, w)
        y = jnp.einsum(
            "bsk,khf->bhsf", xe, we.reshape(we.shape[0], h, hd),
            preferred_element_type=jnp.float32,
        )
    if "bias" in pp:
        y = y + pp["bias"].astype(jnp.float32).reshape(1, h, 1, hd)
    return y.astype(x.dtype)


def _unproj_heads(pp, attn, dm: int):
    """Output projection from head-major attn (b, h, s, hd) ->
    (b, s, dm), the transpose again fused into the matmul."""
    kern = pp["kernel"]
    b, h, s, hd = attn.shape
    if isinstance(kern, dict) and "qvalues_a8" in kern:
        # head-minor restore (one copy), then the plain-layout int8 dot
        x = attn.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        xq, sx = _quantize_rows(x)
        y = jnp.dot(
            xq.reshape(b * s, h * hd), kern["qvalues_a8"],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32).reshape(b, s, dm)
        y = y * sx * kern["scales"].astype(jnp.float32)[0]
    else:
        if isinstance(kern, dict):
            w = kern["qvalues"].astype(jnp.float32) * kern["scales"]
            w = w.astype(attn.dtype)
        else:
            w = kern
        ae, we = _f32_accum_operands(attn, w)
        y = jnp.einsum(
            "bhsf,hfk->bsk", ae, we.reshape(h, hd, dm),
            preferred_element_type=jnp.float32,
        )
    if "bias" in pp:
        y = y + pp["bias"].astype(jnp.float32)
    return y.astype(attn.dtype)


def _encoder_layer_bhsd(p, x, *, num_heads: int, act, eps: float,
                        seq_valid: int):
    """Non-causal encoder layer over a once-padded sequence: q/k/v are
    produced head-major straight out of the projection einsums and feed
    ops.attention.flash_attention_bhsd with zero layout work; the pad
    tail (rows >= seq_valid) is masked out of the attention keys and
    sliced off after the final layer."""
    b, s, d = x.shape
    h = layer_norm(p["ln1"], x, eps)
    q = _proj_heads(p["q"], h, num_heads)
    k = _proj_heads(p["k"], h, num_heads)
    v = _proj_heads(p["v"], h, num_heads)
    attn = flash_attention_bhsd(q, k, v, kv_len=seq_valid)
    x = x + _unproj_heads(p["o"], attn, d)
    h = layer_norm(p["ln2"], x, eps)
    x = x + linear(p["fc2"], act(linear(p["fc1"], h)))
    return x


def _run_encoder(stacked_layers, x, num_layers: int, *, seq_valid=None,
                 **kw):
    """Scan `num_layers` of the parameter-stacked encoder. With
    seq_valid set (non-causal towers), x is padded along the sequence
    and the bhsd layer variant runs."""
    sliced = jax.tree.map(lambda a: a[:num_layers], stacked_layers)

    if seq_valid is not None:
        kw.pop("causal", None)

        def body(h, layer_params):
            return (
                _encoder_layer_bhsd(
                    layer_params, h, seq_valid=seq_valid, **kw
                ),
                None,
            )
    else:

        def body(h, layer_params):
            return _encoder_layer(layer_params, h, **kw), None

    out, _ = jax.lax.scan(body, x, sliced)
    return out


# -- vision tower -------------------------------------------------------------


def init_vision_params(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    layer_keys = jax.random.split(ks[3], cfg.num_layers)
    layers = jax.vmap(
        lambda k: _encoder_layer_init(k, cfg.hidden_size, cfg.intermediate_size, dtype)
    )(layer_keys)
    return {
        "class_embedding": jax.random.normal(ks[0], (cfg.hidden_size,), dtype) * 0.02,
        # (P*P*3, hidden): patchify-matmul form of the stride-P conv.
        "patch_embedding": jax.random.normal(
            ks[1], (patch_dim, cfg.hidden_size), dtype
        )
        * patch_dim**-0.5,
        "position_embedding": jax.random.normal(
            ks[2], (cfg.num_positions, cfg.hidden_size), dtype
        )
        * 0.02,
        "pre_layernorm": layer_norm_init(cfg.hidden_size, dtype),
        "post_layernorm": layer_norm_init(cfg.hidden_size, dtype),
        "layers": layers,
    }


def patchify(pixels: jax.Array, patch_size: int) -> jax.Array:
    """(b, H, W, 3) -> (b, num_patches, P*P*3), row-major patch order
    matching a stride-P conv + flatten."""
    b, hh, ww, c = pixels.shape
    gh, gw = hh // patch_size, ww // patch_size
    x = pixels.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, gh, gw, P, P, c)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def vision_embeddings(params, pixels: jax.Array, cfg: CLIPVisionConfig):
    """pixels: (b, H, W, 3) normalized -> (b, 1+num_patches, hidden)."""
    patches = patchify(pixels, cfg.patch_size)
    pe, ke = _f32_accum_operands(patches, params["patch_embedding"])
    x = jnp.dot(
        pe, ke, preferred_element_type=jnp.float32
    ).astype(params["patch_embedding"].dtype)
    cls = jnp.broadcast_to(
        params["class_embedding"], (x.shape[0], 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    return x + params["position_embedding"].astype(x.dtype)


def vision_forward(
    params,
    pixels: jax.Array,
    cfg: CLIPVisionConfig,
    *,
    num_layers: Optional[int] = None,
) -> jax.Array:
    """Run embeddings + pre-LN + `num_layers` encoder layers.

    Returns raw hidden states (no post-LN), i.e. HF hidden_states
    semantics: num_layers = cfg.num_layers - 1 gives hidden_states[-2].
    """
    num_layers = cfg.num_layers if num_layers is None else num_layers
    x = vision_embeddings(params, pixels, cfg)
    x = layer_norm(params["pre_layernorm"], x, cfg.layer_norm_eps)
    act = ACTIVATIONS[cfg.hidden_act]
    # Pad the sequence ONCE to a 16-sublane multiple and run the whole
    # stack at the padded length (pad keys masked in attention, junk
    # pad rows sliced off here) — per-layer padding materialized 3
    # pads + copies per layer around the flash kernel.
    s = x.shape[1]
    # <=512 runs as ONE flash block (tightest pad wins); longer
    # sequences (336px: 577 tokens) pad to a 128 multiple so the
    # kernel can pick a big divisor block (16-multiples of 592 = 16*37
    # would force 16-row blocks)
    s_pad = -(-s // 16) * 16
    if s_pad > 512:
        s_pad = -(-s // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    out = _run_encoder(
        params["layers"],
        x,
        num_layers,
        num_heads=cfg.num_heads,
        act=act,
        eps=cfg.layer_norm_eps,
        seq_valid=s,
    )
    return out[:, :s]


def vision_penultimate_patches(params, pixels, cfg: CLIPVisionConfig):
    """The exact feature the reference feeds to pooling:
    hidden_states[-2][:, 1:] — penultimate layer output, CLS dropped
    (video_chatgpt/inference.py:92-94)."""
    h = vision_forward(params, pixels, cfg, num_layers=cfg.num_layers - 1)
    return h[:, 1:, :]


def vision_pooled_embedding(params, pixels, cfg: CLIPVisionConfig):
    """Full tower: CLS token after post-LN (used with a projection by
    the grounding stack's zero-shot crop filter)."""
    h = vision_forward(params, pixels, cfg)
    return layer_norm(params["post_layernorm"], h[:, 0], cfg.layer_norm_eps)


# -- text tower ---------------------------------------------------------------


def init_text_params(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    layer_keys = jax.random.split(ks[2], cfg.num_layers)
    layers = jax.vmap(
        lambda k: _encoder_layer_init(k, cfg.hidden_size, cfg.intermediate_size, dtype)
    )(layer_keys)
    return {
        "token_embedding": embedding_init(ks[0], cfg.vocab_size, cfg.hidden_size, dtype),
        "position_embedding": jax.random.normal(
            ks[1], (cfg.max_position_embeddings, cfg.hidden_size), dtype
        )
        * 0.02,
        "final_layernorm": layer_norm_init(cfg.hidden_size, dtype),
        "text_projection": linear_init(
            ks[3], cfg.hidden_size, cfg.projection_dim, use_bias=False, dtype=dtype
        ),
        "layers": layers,
    }


def text_forward(params, token_ids: jax.Array, cfg: CLIPTextConfig,
                 eot_token_id: Optional[int] = None):
    """token_ids: (b, 77) -> pooled, projected text embedding (b, proj).

    Pooling: features at the EOT token — the first `eot_token_id`
    occurrence when given (HF eos_token_id semantics), else the highest
    token id (OpenAI CLIP convention, where EOT is the max vocab id).
    """
    x = embed(params["token_embedding"], token_ids)
    x = x + params["position_embedding"][: x.shape[1]].astype(x.dtype)
    x = _run_encoder(
        params["layers"],
        x,
        cfg.num_layers,
        num_heads=cfg.num_heads,
        act=ACTIVATIONS[cfg.hidden_act],
        eps=cfg.layer_norm_eps,
        causal=True,
    )
    x = layer_norm(params["final_layernorm"], x, cfg.layer_norm_eps)
    if eot_token_id is not None:
        eot = jnp.argmax((token_ids == eot_token_id).astype(jnp.int32), axis=-1)
    else:
        eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return linear(params["text_projection"], pooled)


# -- batched frame encoding ---------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "frame_batch"))
def encode_frames(params, pixels: jax.Array, cfg: CLIPVisionConfig,
                  frame_batch: int = 0) -> jax.Array:
    """Encode (t, H, W, 3) normalized frames -> (t, num_patches, hidden)
    penultimate patch features. `frame_batch` > 0 chunks frames through
    a scan to bound activation memory on small chips."""
    if frame_batch and pixels.shape[0] % frame_batch == 0 and (
        pixels.shape[0] > frame_batch
    ):
        t = pixels.shape[0]
        chunks = pixels.reshape(t // frame_batch, frame_batch, *pixels.shape[1:])

        def body(_, chunk):
            return None, vision_penultimate_patches(params, chunk, cfg)

        _, feats = jax.lax.scan(body, None, chunks)
        return feats.reshape(t, cfg.num_patches, cfg.hidden_size)
    return vision_penultimate_patches(params, pixels, cfg)

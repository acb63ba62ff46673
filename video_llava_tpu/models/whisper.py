"""Whisper encoder/decoder in pure-functional JAX.

Replaces whisperX + whisper-at (reference video_chatgpt/audio_transcript/
transcribe.py:22-49, ctranslate2/CUDA) with a TPU-native model:
parameter-stacked layers under lax.scan, KV-cached decoding, and a
cross-attention cache computed once per 30 s chunk. The audio-tagging
head (whisper-at style, time-pooled encoder features -> sigmoid tags)
shares the encoder.

Weight layout converts from HF WhisperModel state dicts.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import (
    embed,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from video_llava_tpu.ops.attention import attention_reference, multi_head_attention


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    vocab_size: int = 51865
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    num_audio_tags: int = 527  # AudioSet ontology (whisper-at)

    @classmethod
    def tiny_test(cls):
        return cls(
            n_mels=80, vocab_size=256, d_model=64, encoder_layers=2,
            decoder_layers=2, num_heads=4, ffn_dim=128,
            max_source_positions=1500, max_target_positions=64,
            num_audio_tags=16,
        )

    @classmethod
    def base(cls):
        return cls(d_model=512, encoder_layers=6, decoder_layers=6,
                   num_heads=8, ffn_dim=2048)

    @classmethod
    def large_v2(cls):
        return cls(d_model=1280, encoder_layers=32, decoder_layers=32,
                   num_heads=20, ffn_dim=5120)


def _sinusoids(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    import numpy as np

    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(t), np.cos(t)], axis=1), jnp.float32
    )


def _attn_init(key, d, dtype, k_bias=False):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], d, d, dtype=dtype),
        "k": linear_init(ks[1], d, d, use_bias=k_bias, dtype=dtype),
        "v": linear_init(ks[2], d, d, dtype=dtype),
        "o": linear_init(ks[3], d, d, dtype=dtype),
    }


def _enc_layer_init(key, cfg: WhisperConfig, dtype):
    ks = jax.random.split(key, 3)
    return {
        "ln1": layer_norm_init(cfg.d_model, dtype),
        "attn": _attn_init(ks[0], cfg.d_model, dtype),
        "ln2": layer_norm_init(cfg.d_model, dtype),
        "fc1": linear_init(ks[1], cfg.d_model, cfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[2], cfg.ffn_dim, cfg.d_model, dtype=dtype),
    }


def _dec_layer_init(key, cfg: WhisperConfig, dtype):
    ks = jax.random.split(key, 4)
    return {
        "ln1": layer_norm_init(cfg.d_model, dtype),
        "self_attn": _attn_init(ks[0], cfg.d_model, dtype),
        "ln2": layer_norm_init(cfg.d_model, dtype),
        "cross_attn": _attn_init(ks[1], cfg.d_model, dtype),
        "ln3": layer_norm_init(cfg.d_model, dtype),
        "fc1": linear_init(ks[2], cfg.d_model, cfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[3], cfg.ffn_dim, cfg.d_model, dtype=dtype),
    }


def init_params(key, cfg: WhisperConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    enc_layers = jax.vmap(lambda k: _enc_layer_init(k, cfg, dtype))(
        jax.random.split(ks[2], cfg.encoder_layers)
    )
    dec_layers = jax.vmap(lambda k: _dec_layer_init(k, cfg, dtype))(
        jax.random.split(ks[3], cfg.decoder_layers)
    )
    return {
        "encoder": {
            # conv kernels stored (width, in, out) for lax.conv_general_dilated
            "conv1": {
                "kernel": jax.random.normal(ks[0], (3, cfg.n_mels, cfg.d_model), dtype)
                * 0.02,
                "bias": jnp.zeros((cfg.d_model,), dtype),
            },
            "conv2": {
                "kernel": jax.random.normal(ks[1], (3, cfg.d_model, cfg.d_model), dtype)
                * 0.02,
                "bias": jnp.zeros((cfg.d_model,), dtype),
            },
            "layers": enc_layers,
            "ln_post": layer_norm_init(cfg.d_model, dtype),
        },
        "decoder": {
            "token_embedding": embedding_init(ks[4], cfg.vocab_size, cfg.d_model, dtype),
            "position_embedding": jax.random.normal(
                ks[5], (cfg.max_target_positions, cfg.d_model), dtype
            )
            * 0.02,
            "layers": dec_layers,
            "ln_post": layer_norm_init(cfg.d_model, dtype),
        },
        "at_head": {  # whisper-at style tagging head
            "proj": linear_init(ks[6], cfg.d_model, cfg.num_audio_tags, dtype=dtype),
        },
    }


def _mha(p, x, kv, num_heads, causal=False, scale_q=True):
    b, s, d = x.shape
    hd = d // num_heads
    skv = kv.shape[1]
    q = linear(p["q"], x).reshape(b, s, num_heads, hd)
    k = linear(p["k"], kv).reshape(b, skv, num_heads, hd)
    v = linear(p["v"], kv).reshape(b, skv, num_heads, hd)
    out = multi_head_attention(q, k, v, causal=causal)
    return linear(p["o"], out.reshape(b, s, d))


def encode(params, mel: jax.Array, cfg: WhisperConfig) -> jax.Array:
    """mel: (b, n_mels, n_frames) -> encoder states (b, frames//2, d)."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # (b, frames, mels) NWC
    dn = ("NWC", "WIO", "NWC")
    # Explicit (1,1) padding matches torch Conv1d(padding=1) exactly,
    # including the stride-2 case where XLA's SAME pads asymmetrically.
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["kernel"], (1,), [(1, 1)], dimension_numbers=dn
    ) + enc["conv1"]["bias"]
    x = jax.nn.gelu(x)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["kernel"], (2,), [(1, 1)], dimension_numbers=dn
    ) + enc["conv2"]["bias"]
    x = jax.nn.gelu(x)
    x = x + _sinusoids(x.shape[1], cfg.d_model).astype(x.dtype)

    def body(h, lp):
        hn = layer_norm(lp["ln1"], h)
        h = h + _mha(lp["attn"], hn, hn, cfg.num_heads)
        h = h + linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"],
                                                     layer_norm(lp["ln2"], h))))
        return h, None

    x, _ = jax.lax.scan(body, x, enc["layers"])
    return layer_norm(enc["ln_post"], x)


class DecoderCache(NamedTuple):
    k: jax.Array  # (L, b, max_len, h, hd) self-attn keys
    v: jax.Array
    xk: jax.Array  # (L, b, src, h, hd) cross-attn keys (precomputed)
    xv: jax.Array
    length: jax.Array


def precompute_cross_kv(params, enc_states: jax.Array, cfg: WhisperConfig):
    """Cross-attention K/V depend only on encoder output: compute once
    per chunk (the reference recomputes per ctranslate2 internals)."""
    b, src, d = enc_states.shape
    hd = d // cfg.num_heads

    def per_layer(lp):
        k = linear(lp["cross_attn"]["k"], enc_states).reshape(
            b, src, cfg.num_heads, hd
        )
        v = linear(lp["cross_attn"]["v"], enc_states).reshape(
            b, src, cfg.num_heads, hd
        )
        return k, v

    ks, vs = jax.vmap(per_layer)(params["decoder"]["layers"])
    return ks, vs


def decoder_forward(
    params,
    tokens: jax.Array,
    enc_states: jax.Array,
    cfg: WhisperConfig,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Teacher-forced decode (training/scoring): (b, s) -> logits."""
    dec = params["decoder"]
    b, s = tokens.shape
    x = embed(dec["token_embedding"], tokens)
    pos = positions if positions is not None else jnp.arange(s)
    x = x + dec["position_embedding"][pos].astype(x.dtype)

    def body(h, lp):
        hn = layer_norm(lp["ln1"], h)
        h = h + _mha(lp["self_attn"], hn, hn, cfg.num_heads, causal=True)
        h = h + _mha(
            lp["cross_attn"], layer_norm(lp["ln2"], h), enc_states, cfg.num_heads
        )
        h = h + linear(
            lp["fc2"], jax.nn.gelu(linear(lp["fc1"], layer_norm(lp["ln3"], h)))
        )
        return h, None

    x, _ = jax.lax.scan(body, x, dec["layers"])
    x = layer_norm(dec["ln_post"], x)
    logits = jnp.einsum(
        "bsd,vd->bsv", x, dec["token_embedding"]["weight"],
        preferred_element_type=jnp.float32,
    )
    return logits


def audio_tag_logits(params, enc_states: jax.Array) -> jax.Array:
    """whisper-at-style tagging: time-pooled encoder states -> tag
    logits (b, num_tags)."""
    pooled = jnp.mean(enc_states, axis=1)
    return linear(params["at_head"]["proj"], pooled)


def _decoder_step_cached(
    params,
    tokens: jax.Array,  # (b, s) chunk to process
    positions: jax.Array,  # (b, s)
    cache: DecoderCache,
    cfg: WhisperConfig,
) -> Tuple[jax.Array, DecoderCache]:
    """Decoder forward over a token chunk with self-attn KV caching and
    precomputed cross-attn K/V. Returns (logits (b, s, vocab), cache)."""
    from video_llava_tpu.ops.attention import (
        attention_reference,
        decode_attention,
    )

    dec = params["decoder"]
    b, s = tokens.shape
    d = cfg.d_model
    hd = d // cfg.num_heads
    x = embed(dec["token_embedding"], tokens)
    x = x + jnp.take(dec["position_embedding"], positions, axis=0).astype(
        x.dtype
    )

    new_k, new_v = [], []
    for li in range(cfg.decoder_layers):
        lp = jax.tree.map(lambda a: a[li], dec["layers"])
        hn = layer_norm(lp["ln1"], x)
        q = linear(lp["self_attn"]["q"], hn).reshape(b, s, cfg.num_heads, hd)
        k = linear(lp["self_attn"]["k"], hn).reshape(b, s, cfg.num_heads, hd)
        v = linear(lp["self_attn"]["v"], hn).reshape(b, s, cfg.num_heads, hd)
        lk = jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(c, n, (p, 0, 0))
        )(cache.k[li], k.astype(cache.k.dtype), cache.length)
        lv = jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(c, n, (p, 0, 0))
        )(cache.v[li], v.astype(cache.v.dtype), cache.length)
        new_k.append(lk)
        new_v.append(lv)
        attn = attention_reference(
            q, lk, lv, causal=True, kv_valid_len=cache.length + s,
            q_offset=cache.length,
        )
        x = x + linear(lp["self_attn"]["o"], attn.reshape(b, s, d))
        # cross attention against precomputed encoder K/V
        hn = layer_norm(lp["ln2"], x)
        q = linear(lp["cross_attn"]["q"], hn).reshape(b, s, cfg.num_heads, hd)
        attn = attention_reference(q, cache.xk[li], cache.xv[li])
        x = x + linear(lp["cross_attn"]["o"], attn.reshape(b, s, d))
        x = x + linear(
            lp["fc2"], jax.nn.gelu(linear(lp["fc1"], layer_norm(lp["ln3"], x)))
        )

    x = layer_norm(dec["ln_post"], x)
    logits = jnp.einsum(
        "bsd,vd->bsv", x, dec["token_embedding"]["weight"],
        preferred_element_type=jnp.float32,
    )
    new_cache = DecoderCache(
        k=jnp.stack(new_k), v=jnp.stack(new_v), xk=cache.xk, xv=cache.xv,
        length=cache.length + s,
    )
    return logits, new_cache


def greedy_decode_cached(
    params,
    enc_states: jax.Array,
    cfg: WhisperConfig,
    start_tokens: jax.Array,
    max_new_tokens: int,
    eot_token: int,
) -> Tuple[jax.Array, jax.Array]:
    """KV-cached greedy decode: prefill the start tokens, then one
    jitted while_loop step per token (O(n) instead of the re-forward
    loop's O(n^2))."""
    b, s0 = start_tokens.shape
    total = s0 + max_new_tokens
    hd = cfg.d_model // cfg.num_heads
    xk, xv = precompute_cross_kv(params, enc_states, cfg)
    cache = DecoderCache(
        k=jnp.zeros((cfg.decoder_layers, b, total, cfg.num_heads, hd)),
        v=jnp.zeros((cfg.decoder_layers, b, total, cfg.num_heads, hd)),
        xk=xk,
        xv=xv,
        length=jnp.zeros((b,), jnp.int32),
    )
    positions = jnp.broadcast_to(jnp.arange(s0), (b, s0))
    logits, cache = _decoder_step_cached(
        params, start_tokens, positions, cache, cfg
    )
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    buf0 = jnp.full((b, max_new_tokens), eot_token, jnp.int32)
    buf0 = buf0.at[:, 0].set(tok0)
    done0 = tok0 == eot_token

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, buf, cache, done, tok = state
        logits, cache = _decoder_step_cached(
            params, tok[:, None], cache.length[:, None], cache, cfg
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eot_token, nxt)
        buf = jax.lax.dynamic_update_slice(buf, nxt[:, None], (0, i))
        done = done | (nxt == eot_token)
        return i + 1, buf, cache, done, nxt

    _, buf, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), buf0, cache, done0, tok0)
    )
    lengths = jnp.sum(buf != eot_token, axis=1)
    return buf, lengths


def greedy_decode(
    params,
    enc_states: jax.Array,
    cfg: WhisperConfig,
    start_tokens: jax.Array,
    max_new_tokens: int,
    eot_token: int,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decoding via repeated teacher-forced forward on a fixed
    buffer (reference oracle for greedy_decode_cached).
    Returns (tokens (b, max_new), lengths)."""
    b, s0 = start_tokens.shape
    total = s0 + max_new_tokens
    buf = jnp.full((b, total), eot_token, jnp.int32)
    buf = buf.at[:, :s0].set(start_tokens)

    def body(state):
        i, buf, done = state
        logits = decoder_forward(params, buf, enc_states, cfg)
        nxt = jnp.argmax(logits[:, i - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eot_token, nxt)
        buf = buf.at[:, i].set(nxt)
        done = done | (nxt == eot_token)
        return i + 1, buf, done

    def cond(state):
        i, _, done = state
        return (i < total) & ~jnp.all(done)

    _, buf, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(s0), buf, jnp.zeros((b,), bool))
    )
    return buf[:, s0:], jnp.sum(buf[:, s0:] != eot_token, axis=1)


# -- HF weight conversion -----------------------------------------------------


def convert_hf_whisper(sd, cfg: WhisperConfig, dtype=jnp.float32):
    """transformers.WhisperModel state dict -> our params pytree."""
    import numpy as np

    def t(w):
        return np.ascontiguousarray(w.T)

    def attn(prefix, k_bias=False):
        out = {
            "q": {"kernel": t(sd[prefix + "q_proj.weight"]),
                  "bias": sd[prefix + "q_proj.bias"]},
            "k": {"kernel": t(sd[prefix + "k_proj.weight"])},
            "v": {"kernel": t(sd[prefix + "v_proj.weight"]),
                  "bias": sd[prefix + "v_proj.bias"]},
            "o": {"kernel": t(sd[prefix + "out_proj.weight"]),
                  "bias": sd[prefix + "out_proj.bias"]},
        }
        if prefix + "k_proj.bias" in sd:
            out["k"]["bias"] = sd[prefix + "k_proj.bias"]
        return out

    def ln(prefix):
        return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}."
        enc_layers.append(
            {
                "ln1": ln(p + "self_attn_layer_norm."),
                "attn": attn(p + "self_attn."),
                "ln2": ln(p + "final_layer_norm."),
                "fc1": {"kernel": t(sd[p + "fc1.weight"]), "bias": sd[p + "fc1.bias"]},
                "fc2": {"kernel": t(sd[p + "fc2.weight"]), "bias": sd[p + "fc2.bias"]},
            }
        )
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}."
        dec_layers.append(
            {
                "ln1": ln(p + "self_attn_layer_norm."),
                "self_attn": attn(p + "self_attn."),
                "ln2": ln(p + "encoder_attn_layer_norm."),
                "cross_attn": attn(p + "encoder_attn."),
                "ln3": ln(p + "final_layer_norm."),
                "fc1": {"kernel": t(sd[p + "fc1.weight"]), "bias": sd[p + "fc1.bias"]},
                "fc2": {"kernel": t(sd[p + "fc2.weight"]), "bias": sd[p + "fc2.bias"]},
            }
        )

    import jax as _jax

    def stack(ds):
        return _jax.tree.map(lambda *xs: np.stack(xs), *ds)

    params = {
        "encoder": {
            # HF conv weight (out, in, width) -> (width, in, out)
            "conv1": {
                "kernel": sd["encoder.conv1.weight"].transpose(2, 1, 0),
                "bias": sd["encoder.conv1.bias"],
            },
            "conv2": {
                "kernel": sd["encoder.conv2.weight"].transpose(2, 1, 0),
                "bias": sd["encoder.conv2.bias"],
            },
            "layers": stack(enc_layers),
            "ln_post": ln("encoder.layer_norm."),
        },
        "decoder": {
            "token_embedding": {"weight": sd["decoder.embed_tokens.weight"]},
            "position_embedding": sd["decoder.embed_positions.weight"],
            "layers": stack(dec_layers),
            "ln_post": ln("decoder.layer_norm."),
        },
        "at_head": {
            "proj": {
                "kernel": np.zeros((cfg.d_model, cfg.num_audio_tags), np.float32),
                "bias": np.zeros((cfg.num_audio_tags,), np.float32),
            }
        },
    }
    return _jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

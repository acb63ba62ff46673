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
import functools
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


def encode(params, mel: jax.Array, cfg: WhisperConfig,
           return_layer_states: bool = False):
    """mel: (b, n_mels, n_frames) -> encoder states (b, frames//2, d);
    with return_layer_states also the per-layer states (L, b, T, d)."""
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
        return h, h

    x, layer_states = jax.lax.scan(body, x, enc["layers"])
    out = layer_norm(enc["ln_post"], x)
    if return_layer_states:
        # (L, b, T, d) post-block representations — what whisper-at's
        # TL-TR head consumes (one tap per encoder layer).
        return out, layer_states
    return out


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
    """Legacy linear tagging probe: time-pooled last-layer encoder
    states -> tag logits (b, num_tags). Superseded by the TL-TR head
    (audio_tag_logits_tltr) for real whisper-at checkpoints."""
    pooled = jnp.mean(enc_states, axis=1)
    return linear(params["at_head"]["proj"], pooled)


# -- whisper-at TL-TR tagging head --------------------------------------------


@dataclasses.dataclass(frozen=True)
class WhisperATConfig:
    """whisper-at's time-and-layer transformer (TL-TR) head (Gong et
    al., Interspeech 2023; the reference's tagging dependency,
    audio_transcript/transcribe.py:3,:49,:70-77): per encoder layer,
    time-pooled representations pass a time transformer and mean-pool;
    the per-layer tokens then pass a layer transformer, mean-pool, and a
    LayerNorm+Linear AudioSet classifier."""

    n_class: int = 527  # AudioSet ontology
    rep_dim: int = 1280  # whisper encoder d_model (large)
    att_dim: int = 512  # low-dim projection variant (tl_down_tr_512)
    num_heads: int = 4
    time_blocks: int = 1
    layer_blocks: int = 1
    pool_stride: int = 20  # 1500 encoder frames -> 75 tokens (0.4 s each)

    @classmethod
    def tiny_test(cls, rep_dim=64):
        return cls(n_class=16, rep_dim=rep_dim, att_dim=32, num_heads=2)


def _tr_block_init(key, d, ffn, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm1": layer_norm_init(d, dtype),
        "qkv": linear_init(ks[0], d, 3 * d, dtype=dtype),
        "proj": linear_init(ks[1], d, d, dtype=dtype),
        "norm2": layer_norm_init(d, dtype),
        "fc1": linear_init(ks[2], d, ffn, dtype=dtype),
        "fc2": linear_init(ks[3], ffn, d, dtype=dtype),
    }


def _tr_block(p, x, num_heads):
    """Pre-LN ViT/timm-style block (the AST/whisper-at Block): fused-qkv
    MHA + 4x-GELU MLP, residuals."""
    b, s, d = x.shape
    hd = d // num_heads
    hn = layer_norm(p["norm1"], x)
    qkv = linear(p["qkv"], hn).reshape(b, s, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = multi_head_attention(q, k, v, causal=False)
    x = x + linear(p["proj"], attn.reshape(b, s, d))
    hn = layer_norm(p["norm2"], x)
    # exact (erf) GELU: timm/torch nn.GELU default, unlike whisper's
    # tanh approximation.
    return x + linear(
        p["fc2"], jax.nn.gelu(linear(p["fc1"], hn), approximate=False)
    )


def init_at_head_tltr(key, atcfg: WhisperATConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    d = atcfg.att_dim
    head = {
        "time_tr": [
            _tr_block_init(jax.random.fold_in(ks[0], i), d, 4 * d, dtype)
            for i in range(atcfg.time_blocks)
        ],
        "layer_tr": [
            _tr_block_init(jax.random.fold_in(ks[1], i), d, 4 * d, dtype)
            for i in range(atcfg.layer_blocks)
        ],
        "ln": layer_norm_init(d, dtype),
        "head": linear_init(ks[2], d, atcfg.n_class, dtype=dtype),
    }
    if atcfg.att_dim != atcfg.rep_dim:
        head["down"] = linear_init(
            ks[3], atcfg.rep_dim, atcfg.att_dim, dtype=dtype
        )
    return head


def audio_tag_logits_tltr(
    at_params,
    layer_states: jax.Array,  # (L, b, T, rep_dim) from encode(...)
    atcfg: WhisperATConfig,
    window_tokens: int = 0,
) -> jax.Array:
    """TL-TR forward -> (b, n_class), or (b, n_windows, n_class) when
    window_tokens > 0 (whisper-at's at_time_res: tag fixed windows of
    pooled tokens; 25 tokens = 10 s at the default pool_stride)."""
    L, b, T, D = layer_states.shape
    p = atcfg.pool_stride
    tp = T // p
    x = layer_states[:, :, : tp * p].reshape(L, b, tp, p, D).mean(axis=3)
    if "down" in at_params:
        x = linear(at_params["down"], x)
    d = x.shape[-1]
    if window_tokens:
        nw = tp // window_tokens
        x = x[:, :, : nw * window_tokens].reshape(
            L, b * nw, window_tokens, d
        )
    else:
        nw = 1
        x = x.reshape(L, b, tp, d)
    # Time transformer: layers fold into the batch dim.
    t = x.reshape(L * b * nw, x.shape[2], d)
    for blk in at_params["time_tr"]:
        t = _tr_block(blk, t, atcfg.num_heads)
    tokens = t.mean(axis=1).reshape(L, b * nw, d).transpose(1, 0, 2)
    for blk in at_params["layer_tr"]:
        tokens = _tr_block(blk, tokens, atcfg.num_heads)
    pooled = tokens.mean(axis=1)
    logits = linear(at_params["head"], layer_norm(at_params["ln"], pooled))
    if window_tokens:
        return logits.reshape(b, nw, atcfg.n_class)
    return logits


def convert_whisper_at(sd, atcfg: WhisperATConfig, dtype=jnp.float32):
    """whisper-at TL-TR checkpoint (torch state_dict) -> at_head pytree.

    Expected layout (timm-Block naming, the AST/whisper-at lineage):
      [mlp_down.weight]                      optional rep->att projection
      time_tr.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
      layer_tr.{i}.{...}
      mlp_head.0 (LayerNorm), mlp_head.1 (Linear)
    Raises KeyError on a missing tensor so a layout drift in a released
    checkpoint is loud; random-weight parity vs the torch formulation is
    tested in tests/test_whisper_at.py."""
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in sd.items()}

    def lin(name):
        p = {"kernel": jnp.asarray(sd[f"{name}.weight"].T, dtype)}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def ln(name):
        return {
            "scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype),
        }

    def block(prefix):
        return {
            "norm1": ln(f"{prefix}.norm1"),
            "qkv": lin(f"{prefix}.attn.qkv"),
            "proj": lin(f"{prefix}.attn.proj"),
            "norm2": ln(f"{prefix}.norm2"),
            "fc1": lin(f"{prefix}.mlp.fc1"),
            "fc2": lin(f"{prefix}.mlp.fc2"),
        }

    head = {
        "time_tr": [block(f"time_tr.{i}") for i in range(atcfg.time_blocks)],
        "layer_tr": [
            block(f"layer_tr.{i}") for i in range(atcfg.layer_blocks)
        ],
        "ln": ln("mlp_head.0"),
        "head": lin("mlp_head.1"),
    }
    if "mlp_down.weight" in sd:
        head["down"] = lin("mlp_down")
    return head


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


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "eot_token")
)
def greedy_decode_cached(
    params,
    enc_states: jax.Array,
    cfg: WhisperConfig,
    start_tokens: jax.Array,
    max_new_tokens: int,
    eot_token: int,
) -> Tuple[jax.Array, jax.Array]:
    """KV-cached greedy decode: prefill the start tokens, then one
    while_loop step per token (O(n) instead of the re-forward loop's
    O(n^2)). Jitted WHOLE (cross-KV precompute + prefill + loop): the
    unjitted form dispatched the 32-layer prefill + cross-KV eagerly —
    hundreds of per-op round trips on the tunneled TPU (measured:
    47.3 s asr_s for a 60 s wav in bench BENCH_WITH_AUDIO, dominated
    by dispatch, vs ~100x-realtime device work)."""
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


def convert_hf_whisper(sd, cfg: WhisperConfig, dtype=jnp.float32,
                       at_sd=None, at_cfg: "WhisperATConfig" = None):
    """transformers.WhisperModel state dict -> our params pytree.

    at_sd/at_cfg: optional whisper-at TL-TR head checkpoint (separate
    release from the ASR weights) -> converted via convert_whisper_at
    and attached as params['at_head']. Without it the params carry NO
    at_head: the transcript speech/music filter then keeps every
    segment instead of silently running an untrained probe (a zero
    head's 0-0 logit gap would DROP all speech)."""
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
    }
    params = _jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    if at_sd is not None:
        params["at_head"] = convert_whisper_at(
            at_sd, at_cfg or WhisperATConfig(rep_dim=cfg.d_model), dtype
        )
    return params

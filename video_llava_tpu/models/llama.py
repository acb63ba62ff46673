"""LLaMA / Vicuna decoder in pure-functional JAX.

Replaces the reference's HF LlamaModel/LlamaForCausalLM backbone
(video_chatgpt/model/video_chatgpt.py:37-251) with a TPU-first design:

  * parameter-stacked layers driven by `lax.scan` (single compiled layer
    body, fast compile at 32/40 layers);
  * static-shape KV cache carried through the scan — (L, b, max_len,
    h_kv, hd) — updated with dynamic_update_slice, no host syncs;
  * attention via ops.attention (Pallas flash for prefill, masked
    reference for decode);
  * RoPE computed from explicit position ids (fp32);
  * tensor-parallel friendly: head and ffn dims shard on the mesh
    'model' axis (see parallel/sharding.py).

Two entry points: `forward` (prefill / training: full sequences, writes
cache) and `decode_step` (one token per sequence against the cache).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.models.layers import (
    apply_rope,
    embed,
    embedding_init,
    linear,
    linear_init,
    rms_norm,
    rms_norm_init,
    rope_cos_sin,
)
from video_llava_tpu.ops.attention import (
    decode_attention,
    decode_attention_paged,
    decode_attention_stacked,
    multi_head_attention,
)


class KVCache(NamedTuple):
    """Static-shape per-layer-stacked KV cache.

    k, v: (num_layers, batch, max_len, num_kv_heads, head_dim)
    length: (batch,) int32 — number of valid entries per sequence.
    With dtype=jnp.int8 the cache stores symmetric per-(position, head)
    quantized values plus fp32 scales — decode is HBM-bound and the
    cache read halves. Scales are stored 4D (no trailing unit dim) so
    the head axis rides the TPU lane dimension: a (bl, h, 1) Pallas
    block is a 1-lane DMA and measurably stalls the decode kernel's
    pipeline (~2.4 ms/step at a 2048 cache).
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None  # (L, b, max_len, h_kv) f32
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(
        cls, cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        if dtype == jnp.int8:
            sshape = shape[:-1]
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((batch,), jnp.int32),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )


class PagedKVCache(NamedTuple):
    """Block-pooled KV cache for continuous-batching serving.

    The slot cache (KVCache) provisions batch x max_len for every row;
    requests with short prompts/outputs strand most of that HBM. Here
    k/v live in a SHARED pool of fixed-size blocks and each row maps
    logical positions to pool blocks through its block table — vLLM's
    paged attention, reshaped for the TPU: static shapes throughout,
    the table rides scalar prefetch into the decode kernel, and block
    granularity keeps every DMA a full (block_size, heads, head_dim)
    tile. No reference equivalent (the reference serves requests
    one-at-a-time through FastChat; quantitative_evaluation/README.md).

    k, v: (num_layers, num_blocks, block_size, num_kv_heads, head_dim)
    length: (batch,) int32 — valid tokens per row.
    table: (batch, max_blocks_per_row) int32 — pool block ids; entries
      past a row's allocation must still be valid ids (0 convention):
      the kernel masks their contribution but may prefetch them.
    k_scale/v_scale: (num_layers, num_blocks, block_size, num_kv_heads)
      f32 when int8.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array
    table: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @classmethod
    def create(
        cls,
        cfg: LlamaConfig,
        batch: int,
        num_blocks: int,
        block_size: int,
        max_blocks_per_row: int,
        dtype=jnp.bfloat16,
    ) -> "PagedKVCache":
        shape = (
            cfg.num_layers, num_blocks, block_size, cfg.num_kv_heads,
            cfg.head_dim,
        )
        table = jnp.zeros((batch, max_blocks_per_row), jnp.int32)
        length = jnp.zeros((batch,), jnp.int32)
        if dtype == jnp.int8:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                length=length,
                table=table,
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=length,
            table=table,
        )


def _quantize_kv(x: jax.Array):
    """(b, s, h_kv, hd) -> (int8 values, (b, s, h_kv) f32 scales).
    Rounds to nearest-EVEN (the hardware conversion — jnp.round's
    half-away-from-zero tie-break compiles and runs pathologically on
    TPU; see ops.quant.quantized_matmul_a8)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jax.lax.round(
            x.astype(jnp.float32) / scale,
            jax.lax.RoundingMethod.TO_NEAREST_EVEN,
        ),
        -127, 127,
    )
    return q.astype(jnp.int8), scale[..., 0]


def _dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """q (..., h, hd) x scale (..., h) -> dequantized values."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _layer_init(key, cfg: LlamaConfig, dtype):
    ks = jax.random.split(key, 7)
    d, hd = cfg.hidden_size, cfg.head_dim
    return {
        "input_norm": rms_norm_init(d, dtype),
        "wq": linear_init(ks[0], d, cfg.num_heads * hd, use_bias=False, dtype=dtype),
        "wk": linear_init(ks[1], d, cfg.num_kv_heads * hd, use_bias=False, dtype=dtype),
        "wv": linear_init(ks[2], d, cfg.num_kv_heads * hd, use_bias=False, dtype=dtype),
        "wo": linear_init(ks[3], cfg.num_heads * hd, d, use_bias=False, dtype=dtype),
        "post_norm": rms_norm_init(d, dtype),
        "gate": linear_init(ks[4], d, cfg.intermediate_size, use_bias=False, dtype=dtype),
        "up": linear_init(ks[5], d, cfg.intermediate_size, use_bias=False, dtype=dtype),
        "down": linear_init(ks[6], cfg.intermediate_size, d, use_bias=False, dtype=dtype),
    }


def init_params(key, cfg: LlamaConfig, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    layer_keys = jax.random.split(ks[1], cfg.num_layers)
    layers = jax.vmap(lambda k: _layer_init(k, cfg, dtype))(layer_keys)
    return {
        "embed_tokens": embedding_init(ks[0], cfg.vocab_size, cfg.hidden_size, dtype),
        "layers": layers,
        "final_norm": rms_norm_init(cfg.hidden_size, dtype),
        "lm_head": linear_init(
            ks[2], cfg.hidden_size, cfg.vocab_size, use_bias=False, dtype=dtype
        ),
    }


def _write_full_cache(full, new, pos, li):
    """Write new (b, s, h, hd) into the scan-carried full cache
    (NL, b, ML, h, hd) at (layer=li, row i, position pos_i).

    A static Python loop over the batch dim chains plain
    dynamic_update_slice ops, which XLA performs IN PLACE on a loop
    carry. (A vmap-of-dus over the batch axis lowers to a scatter that
    copies the whole cache — measured 6-13x slower per decode step.)
    Handles both the 5D value cache and the 4D scale cache."""
    zero = jnp.int32(0)
    trail = (zero,) * (full.ndim - 3)
    for i in range(new.shape[0]):
        full = jax.lax.dynamic_update_slice(
            full,
            new[i][None, None].astype(full.dtype),
            (li, jnp.int32(i), pos[i]) + trail,
        )
    return full


def _write_paged_cache(full, new, pos, li, table):
    """Write new (b, s, ...) into the shared block pool
    (NL, NB, BS, ...) at layer li, row i's logical positions
    [pos_i, pos_i + s) mapped through its block table.

    Two regimes, both static loops of in-place dynamic_update_slice
    (same XLA in-place property as _write_full_cache):
      * s a multiple of BS (chunked prefill): pos must be
        block-aligned (the engine prefills in fixed windows that BS
        divides), writes go whole-block-at-a-time;
      * small s (decode s=1, speculative verify s=k+1): token-at-a-
        time, any alignment.

    Writes at logical positions past the table (MAXB*BS) go to pad
    block 0: a clamped table lookup would land on the row's LAST entry
    instead, which is a REAL block when the row is fully allocated —
    an overshooting prefill window would overwrite the row's own valid
    prompt tail (caught by adversarial review of the padded-window
    overshoot path).
    """
    bs = full.shape[2]
    maxb = table.shape[1]
    b, s = new.shape[:2]
    zero = jnp.int32(0)
    trail = (zero,) * (full.ndim - 3)

    def blk_at(i, blk_idx):
        return jnp.where(
            blk_idx < maxb,
            table[i, jnp.minimum(blk_idx, maxb - 1)],
            0,
        )

    if s % bs == 0:
        for i in range(b):
            base_blk = pos[i] // bs
            for j in range(s // bs):
                full = jax.lax.dynamic_update_slice(
                    full,
                    new[i, j * bs : (j + 1) * bs][None, None].astype(
                        full.dtype
                    ),
                    (li, blk_at(i, base_blk + j), zero) + trail,
                )
    else:
        for i in range(b):
            for t in range(s):
                p_it = pos[i] + t
                full = jax.lax.dynamic_update_slice(
                    full,
                    new[i, t][None, None, None].astype(full.dtype),
                    (li, blk_at(i, p_it // bs), p_it % bs) + trail,
                )
    return full


def _paged_layer_dense(a, li, table):
    """Gather row block lists of layer li into a logically-contiguous
    dense view: (NL, NB, BS, ...) -> (b, MAXB*BS, ...). XLA fallback /
    s>1 read path — the decode hot path reads blocks in place via the
    scalar-prefetch paged kernel instead (ops.attention
    decode_attention_paged)."""
    layer = jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
    g = layer[table]  # (b, MAXB, BS, ...)
    return g.reshape((table.shape[0], -1) + layer.shape[2:])


def _attention_block(
    p,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: LlamaConfig,
    cache_k: Optional[jax.Array],  # (NL, b, ML, h_kv, hd) full cache
    cache_v: Optional[jax.Array],
    cache_len: Optional[jax.Array],
    write_pos: Optional[jax.Array],
    li: Optional[jax.Array] = None,  # () int32 layer index
    cache_k_scale: Optional[jax.Array] = None,
    cache_v_scale: Optional[jax.Array] = None,
    cache_table: Optional[jax.Array] = None,  # (b, MAXB): paged cache
):
    """Self-attention with optional KV-cache read/write.

    Returns (output, new_k, new_v, new_k_scale, new_v_scale) where the
    new_* are the FULL stacked cache arrays updated at layer li. The
    cache stays whole through the layer scan (carry, not xs/ys):
    scan-slicing it cost a materialized per-layer copy into the Pallas
    decode kernel plus xs/ys roll copies at the loop boundary — the
    carry + indexed-update form keeps every update in place, and the
    decode read selects the layer block via scalar prefetch
    (ops.attention.decode_attention_stacked). New keys are written at
    write_pos (per-batch offsets) and attention runs over the cache
    masked to cache_len. int8 caches quantize on write (per
    position/head) and dequantize fused into the attention reads.
    """
    b, s, d = x.shape
    h, h_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "wqkv" in p:  # fused decode layout (see fuse_layer_kernels)
        qkv = linear(p["wqkv"], x)
        q, k, v = jnp.split(qkv, [h * hd, (h + h_kv) * hd], axis=-1)
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, h_kv, hd)
        v = v.reshape(b, s, h_kv, hd)
    else:
        q = linear(p["wq"], x).reshape(b, s, h, hd)
        k = linear(p["wk"], x).reshape(b, s, h_kv, hd)
        v = linear(p["wv"], x).reshape(b, s, h_kv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_k = new_v = new_ks = new_vs = None
    if cache_k is None:
        out = multi_head_attention(q, k, v, causal=True)
    else:
        if cache_table is None:
            write = lambda full, new: _write_full_cache(
                full, new, write_pos, li
            )
            layer_of = lambda a: jax.lax.dynamic_index_in_dim(
                a, li, 0, keepdims=False
            )
            decode_read = functools.partial(
                decode_attention_stacked, layer=li, cache_len=cache_len
            )
        else:
            write = lambda full, new: _write_paged_cache(
                full, new, write_pos, li, cache_table
            )
            layer_of = lambda a: _paged_layer_dense(a, li, cache_table)
            decode_read = functools.partial(
                decode_attention_paged, layer=li, table=cache_table,
                cache_len=cache_len,
            )
        if cache_k_scale is not None:  # int8 cache
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            new_k = write(cache_k, kq)
            new_v = write(cache_v, vq)
            new_ks = write(cache_k_scale, ks)
            new_vs = write(cache_v_scale, vs)
            if s == 1:
                out = linear(p["wo"], decode_read(
                    q, new_k, new_v, k_scale=new_ks, v_scale=new_vs,
                ).reshape(b, s, h * hd))
                return out, new_k, new_v, new_ks, new_vs
            # Not a materialized copy: the s>1 cached path below goes
            # through multi_head_attention's XLA-reference dispatch
            # (kv_valid_len/q_offset force it off Pallas), and XLA
            # fuses the layer slice + elementwise dequant into the
            # einsum operand read. Measured: the 9-token speculative
            # verify forward costs 11.04 ms vs 10.82 ms for an s=1
            # step. (The paged dense view IS a gather copy — chunked
            # prefill amortizes it over the window's tokens.)
            k_read = _dequantize_kv(layer_of(new_k), layer_of(new_ks),
                                    q.dtype)
            v_read = _dequantize_kv(layer_of(new_v), layer_of(new_vs),
                                    q.dtype)
        else:
            new_k = write(cache_k, k.astype(cache_k.dtype))
            new_v = write(cache_v, v.astype(cache_v.dtype))
            if s == 1:
                out = linear(p["wo"], decode_read(
                    q, new_k, new_v,
                ).reshape(b, s, h * hd))
                return out, new_k, new_v, new_ks, new_vs
            k_read, v_read = layer_of(new_k), layer_of(new_v)
        # (Chunked) prefill: row b's queries occupy cache positions
        # [write_pos_b, write_pos_b + s).
        out = multi_head_attention(
            q, k_read, v_read, causal=True, kv_valid_len=cache_len,
            q_offset=write_pos,
        )
    out = linear(p["wo"], out.reshape(b, s, h * hd))
    return out, new_k, new_v, new_ks, new_vs


def _mlp_block(p, x):
    if "gate_up" in p:  # fused decode layout (see fuse_layer_kernels)
        gu = linear(p["gate_up"], x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return linear(p["down"], jax.nn.silu(gate) * up)
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


def _same_layout(kernels) -> bool:
    """True iff all kernels share a fusable layout: all raw arrays, or
    all quant dicts with identical key sets (int8 vs int4 packing must
    not mix — qvalues/qvalues_packed concatenate differently)."""
    k0 = kernels[0]
    if isinstance(k0, dict):
        return all(
            isinstance(k, dict) and set(k) == set(k0) for k in kernels
        )
    return not any(isinstance(k, dict) for k in kernels)


def _cat_kernels(kernels):
    """Concatenate kernel leaves (raw arrays or int8/int4 quant dicts)
    along the output axis. Caller must check _same_layout first."""
    k0 = kernels[0]
    if isinstance(k0, dict):
        return {
            key: jnp.concatenate([k[key] for k in kernels], axis=-1)
            for key in k0
        }
    return jnp.concatenate(kernels, axis=-1)


def fuse_layer_kernels(params):
    """Single-chip decode layout: merge wq/wk/wv -> wqkv and gate/up ->
    gate_up (one matmul dispatch each per scanned layer instead of
    three/two). Works on bf16 kernels and on int8/int4 quantized dicts
    (qvalues and per-output-channel scales both concatenate along the
    output axis; int4 nibble packing is along the contraction axis, so
    it is unaffected). NOTE: the fused names are not covered by the TP
    sharding rules — fuse only for single-chip serving, after
    quantization. Checkpoints always store unfused names."""
    layers = dict(params["layers"])
    # A group only fuses when every member shares the same layout —
    # quantize_params_int4 can leave individual kernels int8 (shape
    # fallbacks), and mixing packings in one concat would corrupt
    # weights. Unfusable groups are simply left as-is.
    if "wq" in layers and _same_layout(
        [layers[n]["kernel"] for n in ("wq", "wk", "wv")]
    ):
        layers["wqkv"] = {
            "kernel": _cat_kernels(
                [layers.pop(n)["kernel"] for n in ("wq", "wk", "wv")]
            )
        }
    if "gate" in layers and _same_layout(
        [layers[n]["kernel"] for n in ("gate", "up")]
    ):
        layers["gate_up"] = {
            "kernel": _cat_kernels(
                [layers.pop(n)["kernel"] for n in ("gate", "up")]
            )
        }
    return {**params, "layers": layers}


def pad_vocab(params, multiple: int):
    """Pad the vocab dim of embed_tokens (rows) and lm_head (output
    channels) with zeros to a multiple — required for TP vocab sharding
    when vocab_size (e.g. 32006 after special tokens) doesn't divide the
    mesh 'model' axis. `forward` masks the padded logit columns to -inf
    whenever the lm_head output exceeds cfg.vocab_size, so generation
    never samples a padded id. Works on raw and int8-quantized leaves
    (int4 lm_head stays contraction-packed on the hidden dim, so row/col
    padding along vocab is safe there too, but packed tables are rare —
    only raw/int8 are handled)."""
    p = dict(params)

    def padded(x, axis, pad):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    emb = p["embed_tokens"]["weight"]
    rows = emb["qvalues"].shape[0] if isinstance(emb, dict) else emb.shape[0]
    target = -(-rows // multiple) * multiple
    pad = target - rows
    if pad == 0:
        return p
    if isinstance(emb, dict):
        p["embed_tokens"] = {
            "weight": {
                "qvalues": padded(emb["qvalues"], 0, pad),
                # scales divide, never multiply zero rows by 0: pad with 1s
                "scales": jnp.pad(
                    emb["scales"], [(0, pad), (0, 0)], constant_values=1.0
                ),
            }
        }
    else:
        p["embed_tokens"] = {"weight": padded(emb, 0, pad)}
    lm = p["lm_head"]["kernel"]
    if isinstance(lm, dict) and "qvalues" in lm:
        p["lm_head"] = {
            "kernel": {
                "qvalues": padded(lm["qvalues"], -1, pad),
                "scales": jnp.pad(
                    lm["scales"], [(0, 0), (0, pad)], constant_values=1.0
                ),
            }
        }
    elif not isinstance(lm, dict):
        p["lm_head"] = {"kernel": padded(lm, -1, pad)}
    else:
        raise ValueError("pad_vocab: unsupported quantized lm_head layout")
    return p


def split_stacked_int4(layers):
    """Partition scan-stacked layer params into (scanned, stacked_int4).

    int4-packed kernels feed Pallas kernels — opaque custom calls a
    scan-sliced operand cannot fuse into, so XLA materializes every
    layer's 25-45 MB weight slice as a copy each decode step (~3x the
    int4 weight traffic; profiled on chip). The fix: keep those kernels
    OUT of the scan xs, close over the whole stacked array, and let
    int4_matmul_stacked select the layer block inside the kernel via
    scalar prefetch. Returns the scanned remainder plus
    {name: (packed (L,Dh,F), scales (L,G,F))}.
    """
    scanned, stacked = {}, {}
    for name, p in layers.items():
        kernel = p.get("kernel") if isinstance(p, dict) else None
        if isinstance(kernel, dict) and "qvalues_packed" in kernel:
            stacked[name] = (kernel["qvalues_packed"], kernel["scales"])
            rest = {k: v for k, v in p.items() if k != "kernel"}
            if rest:
                scanned[name] = rest
        else:
            scanned[name] = p
    return scanned, stacked


def _inject_stacked_int4(layer_params, stacked, li):
    """Rebuild a per-layer param dict inside the scan body: each
    stacked-int4 kernel becomes a marker dict layers.linear dispatches
    on (whole stacked arrays are scan-invariant closures)."""
    if not stacked:
        return layer_params
    out = dict(layer_params)
    for name, (packed, scales) in stacked.items():
        entry = dict(out.get(name, {}))
        entry["kernel"] = {
            "stacked_packed": packed,
            "stacked_scales": scales,
            "layer": li,
        }
        out[name] = entry
    return out


def forward_hidden(
    params,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    cfg: LlamaConfig,
    cache: Optional[KVCache] = None,
    new_length: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Core decoder: embeds (b, s, d) + positions (b, s) -> hidden (b, s, d).

    With a cache, writes k/v at positions `cache.length` onward and
    returns the updated cache with length = new_length.
    remat=True rematerializes each layer in the backward pass (training:
    O(layers) activation memory instead of O(layers * seq * ffn)).
    """
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    scanned_layers, stacked_int4 = split_stacked_int4(params["layers"])
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    x = inputs_embeds
    if cache is None:

        def body_no_cache(h, layer_in):
            li, layer_params = layer_in
            layer_params = _inject_stacked_int4(
                layer_params, stacked_int4, li
            )
            attn, *_ = _attention_block(
                layer_params,
                rms_norm(layer_params["input_norm"], h, cfg.rms_norm_eps),
                cos,
                sin,
                cfg,
                None,
                None,
                None,
                None,
            )
            h = h + attn
            h = h + _mlp_block(
                layer_params, rms_norm(layer_params["post_norm"], h, cfg.rms_norm_eps)
            )
            return h, None

        if remat:
            body_no_cache = jax.checkpoint(
                body_no_cache,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        x, _ = jax.lax.scan(body_no_cache, x, (layer_ids, scanned_layers))
        new_cache = None
    else:
        write_pos = cache.length
        cache_len = new_length if new_length is not None else (
            cache.length + inputs_embeds.shape[1]
        )
        # Paged caches carry their (scan-invariant) block table; dense
        # slot caches don't have one.
        cache_table = getattr(cache, "table", None)

        def body(carry, layer_in):
            h, ck, cv, cks, cvs = carry
            li, layer_params = layer_in
            layer_params = _inject_stacked_int4(
                layer_params, stacked_int4, li
            )
            attn, ck, cv, cks, cvs = _attention_block(
                layer_params,
                rms_norm(layer_params["input_norm"], h, cfg.rms_norm_eps),
                cos,
                sin,
                cfg,
                ck,
                cv,
                cache_len,
                write_pos,
                li,
                cks,
                cvs,
                cache_table=cache_table,
            )
            h = h + attn
            h = h + _mlp_block(
                layer_params, rms_norm(layer_params["post_norm"], h, cfg.rms_norm_eps)
            )
            return (h, ck, cv, cks, cvs), None

        # The cache rides the CARRY (updated in place at layer li), not
        # the scan xs/ys: the xs/ys form paid a read+write roll of the
        # whole cache every step plus a materialized per-layer slice
        # into the Pallas decode kernel.
        (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
            body,
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            (layer_ids, scanned_layers),
        )
        # _replace keeps the cache's own type (KVCache or PagedKVCache,
        # whose table rides through unchanged).
        new_cache = cache._replace(
            k=new_k, v=new_v, length=cache_len, k_scale=new_ks,
            v_scale=new_vs,
        )

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
    return x, new_cache


def forward(
    params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    new_length: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Full LM forward -> (logits (b, s, vocab) fp32, updated cache)."""
    if inputs_embeds is None:
        inputs_embeds = embed(params["embed_tokens"], input_ids)
    b, s = inputs_embeds.shape[:2]
    if positions is None:
        base = cache.length[:, None] if cache is not None else 0
        positions = jnp.arange(s, dtype=jnp.int32)[None, :] + base
        positions = jnp.broadcast_to(positions, (b, s))
    hidden, new_cache = forward_hidden(
        params, inputs_embeds, positions, cfg, cache, new_length, remat
    )
    kernel = params["lm_head"]["kernel"]
    if isinstance(kernel, dict) and "qvalues_packed" in kernel:
        from video_llava_tpu.ops.quant4 import int4_matmul

        logits = int4_matmul(hidden, kernel["qvalues_packed"], kernel["scales"])
    elif isinstance(kernel, dict) and "qvalues" in kernel:
        from video_llava_tpu.ops.quant import quantized_matmul

        logits = quantized_matmul(
            hidden, kernel["qvalues"], kernel["scales"]
        ).astype(jnp.float32)
    else:
        logits = jnp.dot(hidden, kernel, preferred_element_type=jnp.float32)
    if logits.shape[-1] > cfg.vocab_size:
        # pad_vocab-extended lm_head (TP vocab sharding): padded columns
        # must never win sampling / contribute to log-probs.
        col = jnp.arange(logits.shape[-1]) >= cfg.vocab_size
        logits = jnp.where(col, -jnp.inf, logits)
    return logits, new_cache


def decode_step(
    params,
    cfg: LlamaConfig,
    token: jax.Array,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """One decode step. token: (b,) int32 -> (logits (b, vocab), cache)."""
    embeds = embed(params["embed_tokens"], token[:, None])
    positions = cache.length[:, None]
    logits, new_cache = forward(
        params,
        cfg,
        inputs_embeds=embeds,
        positions=positions,
        cache=cache,
        new_length=cache.length + 1,
    )
    return logits[:, 0], new_cache

"""Slot-based continuous batching for serving.

The windowed batcher (serving/server.py BatchingChatModel) holds every
request in a window to the same decode horizon: a long generation
stalls short ones, and new arrivals wait for the whole window. This
engine decodes a FIXED batch of B cache slots forever and admits /
retires requests between chunks — the TPU-native shape of vLLM-style
continuous batching (static shapes; per-slot lengths drive the masked
decode attention that already powers chunked prefill):

  * one persistent KVCache of B rows lives on device; a request is
    admitted by prefilling into a free row (sliced out, filled b=1,
    donated back in place) and retired by just marking the row free —
    stale cells past a new prefill's length are masked by cache.length;
  * decode runs `chunk` steps for all B rows in one jitted lax.scan
    (inactive rows keep their length; their lane costs nothing extra —
    the weight stream is shared, which is the whole point of batching);
  * per-row temperature/top-p sampling is vectorized in the chunk, so
    greedy judge traffic and sampled QA traffic share a batch;
  * token chunks arrive host-side as ONE (B, chunk) transfer per chunk
    (the tunneled-TPU rule: never fetch token-at-a-time); stop ids,
    max_tokens and substring stops are host concerns.

The reference serves its judge through FastChat's request-at-a-time
worker (quantitative_evaluation/README.md:5-16); this replaces that AND
the round-1 "serialize everything behind one lock" note — concurrent
judge + QA workloads now interleave at chunk granularity.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import heapq
import logging
import threading
from collections import OrderedDict
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import VideoLLaVAConfig
from video_llava_tpu.models import llama, video_llava
from video_llava_tpu.models.llama import KVCache


# -- device programs ----------------------------------------------------------


def _slice_row(cache: KVCache, slot) -> KVCache:
    """View row `slot` of the stacked (NL, B, ML, ...) cache as a b=1
    cache (dynamic_slice; XLA keeps it a copy of one row, not the
    whole cache).

    For a paged cache the k/v pool is SHARED — the "row view" is the
    whole pool plus the row's table/length; writes land in the pool
    through the table, so nothing row-shaped is copied."""
    row = lambda a, axis: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis)
    if getattr(cache, "table", None) is not None:
        return cache._replace(
            length=row(cache.length, 0), table=row(cache.table, 0)
        )
    return KVCache(
        k=row(cache.k, 1),
        v=row(cache.v, 1),
        length=row(cache.length, 0),
        k_scale=None if cache.k_scale is None else row(cache.k_scale, 1),
        v_scale=None if cache.v_scale is None else row(cache.v_scale, 1),
    )


def _insert_row(cache: KVCache, rowc: KVCache, slot) -> KVCache:
    ins = lambda a, r, axis: jax.lax.dynamic_update_slice_in_dim(
        a, r, slot, axis
    )
    if getattr(cache, "table", None) is not None:
        # paged: the pool mutations already happened in rowc's buffers;
        # only the row's length needs inserting (tables don't change
        # inside device programs)
        return cache._replace(
            k=rowc.k,
            v=rowc.v,
            k_scale=rowc.k_scale,
            v_scale=rowc.v_scale,
            length=ins(cache.length, rowc.length, 0),
        )
    return KVCache(
        k=ins(cache.k, rowc.k, 1),
        v=ins(cache.v, rowc.v, 1),
        length=ins(cache.length, rowc.length, 0),
        k_scale=(
            None
            if cache.k_scale is None
            else ins(cache.k_scale, rowc.k_scale, 1)
        ),
        v_scale=(
            None
            if cache.v_scale is None
            else ins(cache.v_scale, rowc.v_scale, 1)
        ),
    )


def _sample_rows(logits, keys, temps, top_ps):
    """Per-row sampling: temps <= 0 rows take argmax; others sample
    from temperature-scaled, per-row top-p-masked logits with that
    ROW'S OWN key — a request's sampled output replays from its seed
    regardless of what shares the batch. logits: (B, V) f32; keys:
    (B, 2) uint32; temps/top_ps: (B,) f32. The vocab sort only
    executes when some row actually samples (lax.cond) — all-greedy
    judge batches pay argmax only."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(_):
        scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum((cum - probs) < top_ps[:, None], axis=-1) - 1
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1
        )
        masked = jnp.where(scaled < cutoff, -jnp.inf, scaled)
        s = jax.vmap(
            lambda k, row: jax.random.categorical(k, row)
        )(keys, masked).astype(jnp.int32)
        return jnp.where(temps <= 0.0, greedy, s)

    return jax.lax.cond(
        jnp.any(temps > 0.0), sampled, lambda _: greedy, None
    )


def _pin(cache: KVCache, mesh) -> KVCache:
    if mesh is None:
        return cache
    from video_llava_tpu.parallel.sharding import constrain_kv_cache

    return constrain_kv_cache(cache, mesh)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,)
)
def _prefill_slot(
    params,
    cache: KVCache,
    slot: jax.Array,  # () int32
    input_ids: jax.Array,  # (1, s_pad)
    seq_len: jax.Array,  # (1,) int32
    video_features: Optional[jax.Array],  # (1, n_vid, mm) or None
    rng: jax.Array,
    temp: jax.Array,  # () f32
    top_p: jax.Array,  # () f32
    cfg: VideoLLaVAConfig,
    mesh=None,
):
    """Prefill one request into cache row `slot` (in place via donation)
    and sample its first output token. -> (token () int32, cache).

    mesh: optional ('data','model') Mesh — pins the persistent cache to
    the TP inference layout (serving meshes use data=1; a data-sharded
    slot axis would make the row slice a cross-shard gather)."""
    s = input_ids.shape[1]
    rowc = _slice_row(cache, slot)
    rowc = rowc._replace(length=jnp.zeros((1,), jnp.int32))
    embeds = video_llava.build_inputs_embeds(
        params, input_ids, video_features, cfg
    )
    logits, rowc = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        positions=jnp.arange(s, dtype=jnp.int32)[None],
        cache=rowc,
        new_length=seq_len,
    )
    last = jnp.take_along_axis(
        logits, (seq_len - 1)[:, None, None], axis=1
    )[0, 0]
    tok = _sample_rows(
        last[None], rng[None], temp[None], top_p[None]
    )[0]
    return tok, _pin(_insert_row(cache, rowc, slot), mesh)


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk", "mesh"), donate_argnums=(1,)
)
def _decode_chunk(
    params,
    cache: KVCache,
    tokens: jax.Array,  # (B,) int32 last token per slot
    active: jax.Array,  # (B,) bool
    temps: jax.Array,  # (B,) f32
    top_ps: jax.Array,  # (B,) f32
    keys: jax.Array,  # (B, 2) uint32 per-slot PRNG chains
    cfg: VideoLLaVAConfig,
    chunk: int,
    mesh=None,
):
    """`chunk` decode steps over all slots -> ((B, chunk) tokens, cache,
    keys). Inactive rows don't advance their cache length; their
    outputs are garbage and ignored host-side. Each row splits its OWN
    key once per step, so a seeded request's sampled continuation is
    independent of what shares the batch."""

    def body(carry, _):
        cache, tok, keys = carry
        logits, cache2 = llama.decode_step(
            params["llm"], cfg.llm, tok, cache
        )
        split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
        keys2, subs = split[:, 0], split[:, 1]
        nxt = _sample_rows(logits, subs, temps, top_ps)
        cache2 = _pin(
            cache2._replace(
                length=jnp.where(active, cache2.length, cache.length)
            ),
            mesh,
        )
        return (cache2, jnp.where(active, nxt, tok), keys2), nxt

    (cache, _, keys), toks = jax.lax.scan(
        body, (cache, tokens, keys), None, length=chunk
    )
    return toks.T, cache, keys  # (B, chunk)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,)
)
def _prefill_chunk(
    params,
    cache: KVCache,
    slot: jax.Array,  # () int32
    ids_chunk: jax.Array,  # (1, P) — window [base, base+P) of the prompt
    base: jax.Array,  # (1,) int32 chunk start position
    seq_len: jax.Array,  # (1,) int32 full prompt length
    rng: jax.Array,
    temp: jax.Array,
    top_p: jax.Array,
    cfg: VideoLLaVAConfig,
    mesh=None,
):
    """One chunk of a chunked prefill into cache row `slot`.

    Text-only requests prefill in fixed (1, P) windows: ONE compiled
    program serves every prompt length (no per-bucket compiles over the
    tunnel), and long admissions interleave with decode chunks instead
    of stalling every slot. The cached s>1 attention path handles the
    base offset (q_offset chunked-prefill semantics). Returns (token —
    meaningful only on the final chunk, cache)."""
    p = ids_chunk.shape[1]
    rowc = _slice_row(cache, slot)._replace(length=base)
    embeds = video_llava.build_inputs_embeds(params, ids_chunk, None, cfg)
    positions = base[:, None] + jnp.arange(p, dtype=jnp.int32)[None]
    logits, rowc = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        positions=positions,
        cache=rowc,
        new_length=jnp.minimum(base + p, seq_len),
    )
    last_idx = jnp.clip(seq_len[0] - 1 - base[0], 0, p - 1)
    tok = _sample_rows(
        logits[0, last_idx][None], rng[None], temp[None], top_p[None]
    )[0]
    return tok, _pin(_insert_row(cache, rowc, slot), mesh)


@functools.partial(
    jax.jit, static_argnames=(), donate_argnums=(0,)
)
def _set_ctx_row(ctx, ctx_len, slot, padded_ids, seq_len, tok):
    """Reset context row `slot` to a freshly admitted prompt + its first
    sampled token (prompt-lookup state for the speculative chunks)."""
    b, cap = ctx.shape
    s = padded_ids.shape[1]
    row = jnp.zeros((1, cap), jnp.int32)
    row = jax.lax.dynamic_update_slice(row, padded_ids, (0, 0))
    row = jax.lax.dynamic_update_slice(
        row, tok.reshape(1, 1), (jnp.int32(0), seq_len[0])
    )
    ctx = jax.lax.dynamic_update_slice(ctx, row, (slot, jnp.int32(0)))
    ctx_len = jax.lax.dynamic_update_slice(
        ctx_len, seq_len + 1, (slot,)
    )
    return ctx, ctx_len


@functools.partial(jax.jit, donate_argnums=(0,))
def _ctx_write_chunk(ctx, slot, chunk, base):
    """Write a prefill chunk's ids into context row `slot` at `base`
    (fixed chunk width: one compile for all prompt lengths)."""
    return jax.lax.dynamic_update_slice(ctx, chunk, (slot, base))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _ctx_finish_prefill(ctx, ctx_len, slot, seq_len, tok):
    """Append the first sampled token at `seq_len` and set the row's
    context length (chunked-prefill completion)."""
    ctx = jax.lax.dynamic_update_slice(
        ctx, tok.reshape(1, 1), (slot, seq_len[0])
    )
    ctx_len = jax.lax.dynamic_update_slice(ctx_len, seq_len + 1, (slot,))
    return ctx, ctx_len


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_ctx(ctx, ctx_len, toks, active):
    """Append a plain chunk's tokens to the context rows (keeps the
    prompt-lookup state fresh across non-speculative chunks)."""
    chunk = toks.shape[1]
    write = jax.vmap(
        lambda row, val, pos: jax.lax.dynamic_update_slice(row, val, (pos,))
    )
    ctx = write(ctx, toks, ctx_len)
    return ctx, ctx_len + jnp.where(active, chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "iters", "k", "ngram", "mesh"),
    donate_argnums=(1, 2),
)
def _decode_chunk_pld(
    params,
    cache: KVCache,
    ctx: jax.Array,  # (B, cap) int32 prompt+emitted context
    ctx_len: jax.Array,  # (B,) int32
    tokens: jax.Array,  # (B,) int32 last token per slot
    active: jax.Array,  # (B,) bool
    cfg: VideoLLaVAConfig,
    iters: int,
    k: int,
    ngram: int,
    mesh=None,
):
    """`iters` greedy prompt-lookup speculative steps over all slots.

    Each iteration feeds (last token + k drafts) per row and keeps the
    accepted prefix (engine/speculative.py math, greedy accept only —
    the engine only routes chunks here when every active row is
    greedy). Returns (buf (B, iters*(k+1)) tokens packed from 0,
    counts (B,), cache, ctx, ctx_len, last_tok). The cache is written
    optimistically k+1 past `length` each iteration; admission must
    budget k+1 spare rows (ContinuousEngine.spec_margin)."""
    from video_llava_tpu.engine.speculative import find_draft

    b, cap = ctx.shape
    # logical cache positions per row (slot rows or paged table span)
    if getattr(cache, "table", None) is not None:
        row_cap = cache.table.shape[1] * cache.k.shape[2]
    else:
        row_cap = cache.k.shape[2]
    ar = jnp.arange(k + 1, dtype=jnp.int32)
    find_b = jax.vmap(lambda c, l: find_draft(c, l, ngram, k))
    write_row = jax.vmap(
        lambda row, val, pos: jax.lax.dynamic_update_slice(row, val, (pos,))
    )
    buf0 = jnp.zeros((b, iters * (k + 1)), jnp.int32)

    def body(carry, _):
        cache, ctx, ctx_len, tok, buf, n = carry
        draft, dlen = find_b(ctx, ctx_len)  # (b, k), (b,)
        fed = jnp.concatenate([tok[:, None], draft], axis=1)
        logits, new_cache = llama.forward(
            params["llm"], cfg.llm, input_ids=fed, cache=cache
        )
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (b, k+1)
        ok = (draft == g[:, :k]) & (ar[None, :k] < dlen[:, None])
        m = jnp.argmin(
            jnp.concatenate([ok, jnp.zeros((b, 1), bool)], axis=1), axis=1
        ).astype(jnp.int32)
        z = jnp.take_along_axis(g, m[:, None], axis=1)[:, 0]
        # Row-end clamp: never advance length past capacity - (k+1), so
        # the NEXT iteration's verify write [length, length+k+1) stays
        # in bounds (a clamped dynamic_update_slice would overwrite
        # live cells at the row end — caught by adversarial review).
        # Rows at the clamp keep rewriting their own garbage tail and
        # produce 0 tokens; the host exhaustion check retires them at
        # the chunk boundary. Admission guarantees the FIRST write fits
        # (prompt <= ML - reserve - 1).
        headroom = jnp.maximum(row_cap - (k + 1) - cache.length, 0)
        n_new = jnp.minimum(jnp.where(active, m + 1, 0), headroom)
        cand = jnp.where(
            ar[None] < m[:, None],
            jnp.take_along_axis(
                draft, jnp.minimum(ar, k - 1)[None].repeat(b, 0), axis=1
            ),
            jnp.where(ar[None] == m[:, None], z[:, None], 0),
        )
        cand = jnp.where(ar[None] < n_new[:, None], cand, 0)
        buf = write_row(buf, cand, n)
        ctx = write_row(ctx, cand, ctx_len)
        new_cache = _pin(
            new_cache._replace(length=cache.length + n_new), mesh
        )
        new_tok = jnp.where(
            n_new > 0,
            jnp.take_along_axis(
                cand, jnp.maximum(n_new - 1, 0)[:, None], axis=1
            )[:, 0],
            tok,
        )
        return (
            new_cache, ctx, ctx_len + n_new, new_tok, buf, n + n_new
        ), None

    (cache, ctx, ctx_len, tok, buf, n), _ = jax.lax.scan(
        body,
        (cache, ctx, ctx_len, tokens, buf0, jnp.zeros((b,), jnp.int32)),
        None,
        length=iters,
    )
    return buf, n, cache, ctx, ctx_len, tok


# -- host-side engine ---------------------------------------------------------


@dataclasses.dataclass
class SlotRequest:
    input_ids: Sequence[int]
    max_new_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    eos_token_id: int = 2
    stop_token_ids: Sequence[int] = ()
    video_features: Optional[np.ndarray] = None  # (n_vid, mm_hidden)
    on_token: Optional[Callable[[List[int]], None]] = None
    # Sampled requests replay exactly from this seed (per-slot PRNG
    # chain, batch-composition independent); None draws from the
    # engine's stream.
    seed: Optional[int] = None
    # Higher admits first when slots are contended (e.g. interactive
    # judge traffic over background QA sweeps); FIFO within a class.
    priority: int = 0


class RequestHandle:
    def __init__(self):
        self.tokens: List[int] = []
        self.error: Optional[str] = None
        self._done = threading.Event()
        self._cancelled = False

    def result(self, timeout: Optional[float] = None) -> List[int]:
        if not self._done.wait(timeout):
            raise TimeoutError("generation not finished")
        if self.error is not None:
            raise RuntimeError(self.error)
        return self.tokens

    @property
    def done(self) -> bool:
        return self._done.is_set()

    def cancel(self) -> None:
        """Stop generating for this request at the next chunk boundary
        (used by serving's host-side substring-stop check). Tokens
        already delivered stay in `tokens`."""
        self._cancelled = True


class _Slot:
    __slots__ = ("req", "handle", "last_token", "generated", "prompt_len",
                 "ready", "base", "padded", "hashes")

    def __init__(self, req, handle, prompt_len, padded=None):
        self.req = req
        self.handle = handle
        self.prompt_len = prompt_len  # post-truncation length in cache
        self.padded = padded  # (1, W) np prompt for chunked prefill
        self.ready = padded is None  # full-prefill slots start ready
        self.base = 0  # chunked-prefill progress (prefix skip included)
        self.last_token = None
        self.generated = 0
        self.hashes = None  # block prefix hashes (prefix caching)


def _block_hashes(ids, block_size: int) -> List[str]:
    """Rolling prefix hash at every full block boundary: hash j covers
    tokens [0, (j+1)*block_size) — equal hashes mean equal prefix ids
    AND equal positions, so the block's K/V is reusable verbatim (RoPE
    is absolute from 0)."""
    h = hashlib.sha1()
    out = []
    for j in range(len(ids) // block_size):
        h.update(np.asarray(
            ids[j * block_size:(j + 1) * block_size], np.int32
        ).tobytes())
        out.append(h.hexdigest())
    return out


class _PrefixRegistry:
    """Automatic prefix caching over the paged pool: maps each prompt's
    rolling block hashes to the pool blocks holding that prefix's K/V.
    Blocks stay warm (refcount 0, LRU-ordered) after their last user
    retires and return to the allocator only under pool pressure, so
    repeated prefixes — the judge's few-shot preamble, a shared system
    prompt — skip their prefill entirely."""

    def __init__(self):
        self.block_of: dict = {}  # hash -> block id
        self.hash_of: dict = {}  # block id -> hash
        self.refs: dict = {}  # block id -> refcount
        self.lru: "OrderedDict" = OrderedDict()  # refcount-0 blocks

    def lookup(self, hashes: List[str]) -> List[int]:
        """Block ids of the longest cached prefix run (a ref is taken
        on each; hand surplus back with release())."""
        out = []
        for h in hashes:
            b = self.block_of.get(h)
            if b is None:
                break
            out.append(b)
        for b in out:
            self.refs[b] += 1
            self.lru.pop(b, None)
        return out

    def add(self, h: str, block: int) -> bool:
        """Register a freshly prefilled block (refcount 1 for its
        producer row). False if another row won the race for this
        prefix — the caller keeps its duplicate block private."""
        if h in self.block_of:
            return False
        self.block_of[h] = block
        self.hash_of[block] = h
        self.refs[block] = 1
        return True

    def release(self, blocks: List[int]) -> None:
        for b in blocks:
            self.refs[b] -= 1
            if self.refs[b] == 0:
                self.lru[b] = None

    def evict(self, n: int) -> List[int]:
        """Reclaim up to n cold (refcount-0) blocks for the allocator."""
        out = []
        while self.lru and len(out) < n:
            b, _ = self.lru.popitem(last=False)
            del self.block_of[self.hash_of.pop(b)]
            del self.refs[b]
            out.append(b)
        return out


class ImpossibleRequest(Exception):
    """The request needs more pool blocks than exist — waiting on the
    free list would hang it (and head-of-line-block everything behind
    it) forever."""


class _BlockAllocator:
    """Host-side free list over the shared paged pool. Block 0 is
    reserved as the pad block: table entries past a row's allocation
    point at it (the kernels mask its contribution but may prefetch
    it, and overshoot writes may scribble on it — never hand it out)."""

    def __init__(self, num_blocks: int):
        self.capacity = num_blocks - 1
        self.free = list(range(num_blocks - 1, 0, -1))

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self.free):
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks: List[int]) -> None:
        self.free.extend(blocks)


class ContinuousEngine:
    """Continuous batching over `num_slots` persistent cache rows.

    Drive with `step_once()` (deterministic; used by tests and by
    single-threaded callers) or `start()`/`stop()` for a background
    scheduler thread. `submit()` is thread-safe either way.

    paged=True swaps the slot cache (num_slots x max_cache_len rows,
    mostly stranded HBM for short requests) for a PagedKVCache: a
    shared pool of `num_blocks` blocks of `block_size` tokens, mapped
    per row by block tables. Admission allocates just the blocks a
    request can touch and releases them at retirement, so a smaller
    pool serves the same traffic; when the pool is empty, admission
    waits (block-level backpressure) instead of failing. vLLM's paged
    attention, TPU-shaped: static shapes, scalar-prefetch block-table
    kernels (ops/attention.py decode_attention_mxu_paged)."""

    def __init__(
        self,
        params,
        cfg: VideoLLaVAConfig,
        *,
        num_slots: int = 4,
        max_cache_len: int = 1024,
        cache_dtype=jnp.bfloat16,
        chunk: int = 8,
        prompt_pad: int = 64,
        prefill_chunk: int = 256,
        seed: int = 0,
        mesh=None,
        speculative: bool = True,
        spec_k: int = 8,
        spec_ngram: int = 3,
        paged: bool = False,
        block_size: int = 64,
        num_blocks: Optional[int] = None,
        prefix_cache: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_cache_len = max_cache_len
        self.chunk = chunk
        self.prompt_pad = prompt_pad
        # the fixed prefill window must fit the cache row
        self.prefill_chunk = min(prefill_chunk, max_cache_len)
        self.mesh = mesh
        # Prompt-lookup speculation applies to chunks whose active rows
        # are ALL greedy (the judge-serving shape); mixed/sampled chunks
        # fall back to the plain path, whose tokens still feed the
        # per-slot context so later speculative chunks draft well.
        self.speculative = speculative
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        self.spec_margin = spec_k + 1 if speculative else 0
        # Row-end write safety (caught by adversarial review: clamped
        # end-of-row writes overwrote live cells). Two guarantees keep
        # every cache write in bounds:
        #  * the PLD chunk clamps its own advance DEVICE-side so
        #    length + k+1 <= row capacity at every iteration (see the
        #    keep cap in _decode_chunk_pld);
        #  * plain chunks advance at most `chunk` rows, reserved here.
        # `reserve` is what admission + the exhaustion check keep free
        # past the prompt/generation.
        # spec engines still run PLAIN chunks for sampled/mixed batches
        self.reserve = max(spec_k + 1, chunk) if speculative else chunk
        self.paged = paged
        if paged:
            # window writes go whole-block-at-a-time and must stay
            # block-aligned (models.llama._write_paged_cache); the PLD
            # verify writes s = spec_k+1 tokens at arbitrary alignment
            # and must take the token-at-a-time path
            assert prompt_pad % block_size == 0, (prompt_pad, block_size)
            # align the window down instead of asserting: min(256, ML)
            # above can produce any value
            self.prefill_chunk = max(
                block_size,
                (self.prefill_chunk // block_size) * block_size,
            )
            assert not speculative or (spec_k + 1) % block_size != 0
            self.block_size = block_size
            self.max_blocks = -(-max_cache_len // block_size)
            if num_blocks is None:
                # drop-in default: capacity of the slot cache (+ pad
                # block); pass a smaller pool for the memory win
                num_blocks = num_slots * self.max_blocks + 1
            self.cache = llama.PagedKVCache.create(
                cfg.llm, num_slots, num_blocks, block_size,
                self.max_blocks, cache_dtype,
            )
            self.alloc = _BlockAllocator(num_blocks)
            # per-slot block ownership: `shared` blocks are registry-
            # refcounted prefix blocks, `owned` return to the allocator
            self.slot_shared: List[List[int]] = [[] for _ in range(num_slots)]
            self.slot_owned: List[List[int]] = [[] for _ in range(num_slots)]
            self.prefix = _PrefixRegistry() if prefix_cache else None
        else:
            assert not prefix_cache, "prefix_cache requires paged=True"
            self.cache = KVCache.create(
                cfg.llm, num_slots, max_cache_len, cache_dtype
            )
        if mesh is not None:
            from video_llava_tpu.parallel.sharding import shard_kv_cache

            # TP serving (model_init's make_mesh(1, m)): params must
            # already be sharded by the caller.
            self.cache = shard_kv_cache(self.cache, mesh)
        if speculative:
            # chunked prefill writes whole (base, base+P) windows into
            # the context row; size past the worst overshoot.
            cap = max_cache_len + self.spec_margin + max(
                chunk, prefill_chunk
            )
            self.ctx = jnp.zeros((num_slots, cap), jnp.int32)
            self.ctx_len = jnp.zeros((num_slots,), jnp.int32)
        self.stats = {"spec_chunks": 0, "plain_chunks": 0,
                      "spec_tokens": 0, "prefix_hit_tokens": 0}
        self.keys = jnp.zeros((num_slots, 2), jnp.uint32)
        self.slots: List[Optional[_Slot]] = [None] * num_slots
        # heap of (-priority, seq, req, handle): higher priority admits
        # first, FIFO within a class
        self.pending: list = []
        self._seq = 0
        self.lock = threading.Lock()
        self.work = threading.Condition(self.lock)
        self.rng = jax.random.PRNGKey(seed)
        self._thread = None
        self._stop = False
        self._dead = False

    # -- submission ----------------------------------------------------

    def submit(self, req: SlotRequest) -> RequestHandle:
        handle = RequestHandle()
        if self._dead:
            handle.error = "engine stopped after repeated step failures"
            handle._done.set()
            return handle
        with self.work:
            self._seq += 1
            heapq.heappush(
                self.pending, (-req.priority, self._seq, req, handle)
            )
            self.work.notify()
        return handle

    # -- scheduling ----------------------------------------------------

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _alloc_blocks(
        self, slot: int, ids, window: int, req, hashes=None,
    ) -> Optional[int]:
        """Paged admission: reserve every block a DELIVERED token can
        read — prompt + max_new + the verify/chunk reserve (the PLD
        iteration that crosses max_new writes k+1 past it). Accepted-
        then-discarded tokens beyond that may read/write the pad block;
        they never reach the client (_deliver caps at max_new) and
        never land in another row's blocks. With `hashes` (prefix
        caching), the
        longest registry run is mapped in as shared read-only blocks
        and its prefill skipped block-granularly — the (1, P) window
        grid simply starts at the skip offset (at least one token
        always prefills: the final window samples the first output).
        Window writes past the allocation (the padded tail of the last
        window, which may extend past the row cap) are safe by
        construction: they land in the pad block or the row's own
        not-yet-valid tail (table lookups clamp), and reads mask by
        length — so they cost no blocks. `window` (video whole-span
        prefill) still reserves its padded span; None for chunked
        prefill. Returns the skipped token count, or None (leave the
        request pending) when the pool can't cover it yet."""
        bs = self.block_size
        reserve = self.reserve
        shared: List[int] = []
        skip = 0
        if hashes and self.prefix is not None:
            run = self.prefix.lookup(hashes)
            k = min(len(run), (len(ids) - 1) // bs)
            self.prefix.release(run[k:])
            shared = run[:k]
            skip = k * bs
        need = max(
            window or 0,
            len(ids) + req.max_new_tokens + 1 + reserve,
        )
        n = min(-(-need // bs), self.max_blocks)
        n_fresh = n - len(shared)
        if n_fresh > self.alloc.capacity:
            # even an empty pool couldn't hold it: fail loudly instead
            # of re-queueing forever behind the free list
            if shared and self.prefix is not None:
                self.prefix.release(shared)
            raise ImpossibleRequest(
                f"request needs {n_fresh} pool blocks; the pool only "
                f"has {self.alloc.capacity} (raise num_blocks or lower "
                f"max_new_tokens)"
            )
        fresh = self.alloc.alloc(n_fresh)
        if fresh is None and self.prefix is not None:
            # reclaim cold prefix blocks under pool pressure
            self.alloc.release(
                self.prefix.evict(n_fresh - len(self.alloc.free))
            )
            fresh = self.alloc.alloc(n_fresh)
        if fresh is None:
            if shared and self.prefix is not None:
                self.prefix.release(shared)
            return None
        self.slot_shared[slot] = shared
        self.slot_owned[slot] = fresh
        row = np.zeros((self.max_blocks,), np.int32)
        row[: n] = shared + fresh
        self.cache = self.cache._replace(
            table=self.cache.table.at[slot].set(jnp.asarray(row))
        )
        return skip

    def _promote(self, slot: int, st: "_Slot") -> None:
        """Publish a finished prefill's full prompt blocks to the
        prefix registry (in order; stop at the first hash another row
        published first — lookups walk the chain from block 0, so a
        gap would never be reached anyway)."""
        shared, owned = self.slot_shared[slot], self.slot_owned[slot]
        full = min(len(st.hashes), st.prompt_len // self.block_size)
        j = len(shared)
        while j < full and owned:
            if not self.prefix.add(st.hashes[j], owned[0]):
                break
            shared.append(owned.pop(0))
            j += 1

    def _retire(self, slot: int) -> None:
        """Free a slot; paged mode releases its blocks back to the pool
        and points the table row at the pad block (the slot keeps
        riding decode chunks as an inactive row — its masked writes
        must not scribble on the blocks' next owner). Registry-shared
        blocks only drop a ref — they stay warm for the next request
        with this prefix."""
        self.slots[slot] = None
        # Zero the retired row's cache length: the decode-attention
        # kernels skip compute AND (via clamped fetch index maps) the
        # KV DMA for blocks past a row's length, so a freed slot rides
        # subsequent decode chunks at ~zero cost instead of paying its
        # stale length's reads every step until re-admission.
        self.cache = self.cache._replace(
            length=self.cache.length.at[slot].set(0)
        )
        if self.paged:
            if self.slot_shared[slot] and self.prefix is not None:
                self.prefix.release(self.slot_shared[slot])
            self.alloc.release(self.slot_owned[slot])
            self.slot_shared[slot] = []
            self.slot_owned[slot] = []
            self.cache = self.cache._replace(
                table=self.cache.table.at[slot].set(0)
            )

    def _admit(self):
        """Assign pending requests to free slots.

        Text-only requests enter chunked prefill (fixed (1, P) windows,
        one compiled program for every prompt length, interleaved with
        decode chunks by the scheduler). Video requests prefill whole —
        the feature splice needs the full <vid_patch> span in one
        window."""
        while self.pending and None in self.slots:
            with self.lock:
                if not self.pending:
                    break
                entry = heapq.heappop(self.pending)
            _, _, req, handle = entry
            slot = self.slots.index(None)
            ids = list(req.input_ids)
            budget = self.max_cache_len - self.reserve - 1
            if len(ids) + req.max_new_tokens > budget:
                if req.video_features is not None:
                    # trimming would cut the <vid_patch> span and
                    # silently break the feature splice — refuse
                    handle.error = (
                        f"video prompt of {len(ids)} tokens + "
                        f"{req.max_new_tokens} new exceeds the cache "
                        f"budget {budget}; raise max_cache_len"
                    )
                    handle._done.set()
                    continue
                # Trim the prompt head, keeping room to generate plus
                # the worst-case within-chunk write overshoot; mirrors
                # runtime/chat.py's truncation cutoffs.
                keep = max(1, budget - req.max_new_tokens)
                ids = ids[-keep:]

            key = (
                jax.random.PRNGKey(req.seed)
                if req.seed is not None
                else self._next_rng()
            )

            if req.video_features is None:
                p = self.prefill_chunk
                # every (base, base+P) window must fit the cache row:
                # cap the prompt at the largest P-aligned length <= ML.
                cap_aligned = (self.max_cache_len // p) * p
                if len(ids) > cap_aligned:
                    ids = ids[-cap_aligned:]
                skip = 0
                hashes = None
                if self.paged:
                    if self.prefix is not None:
                        hashes = _block_hashes(ids, self.block_size)
                    try:
                        skip = self._alloc_blocks(slot, ids, None, req,
                                                  hashes)
                    except ImpossibleRequest as e:
                        handle.error = str(e)
                        handle._done.set()
                        continue
                    if skip is None:
                        with self.lock:
                            heapq.heappush(self.pending, entry)
                        break
                # window grid starts at the prefix skip; padded width
                # covers whole (1, P) windows from there
                w = skip + -(-(len(ids) - skip) // p) * p
                padded = np.zeros((1, w), np.int32)
                padded[0, : len(ids)] = ids
                self.keys = self.keys.at[slot].set(key)
                st = _Slot(req, handle, len(ids), padded)
                st.base = skip
                st.hashes = hashes
                if skip:
                    self.stats["prefix_hit_tokens"] += skip
                    if self.speculative:
                        # context rows still need the skipped prompt
                        # windows (prompt-lookup drafts read them)
                        p_arr = jnp.asarray(slot, jnp.int32)
                        for b0 in range(0, skip, self.prefill_chunk):
                            self.ctx = _ctx_write_chunk(
                                self.ctx, p_arr,
                                jnp.asarray(
                                    padded[:, b0:b0 + self.prefill_chunk]
                                ),
                                jnp.asarray(b0, jnp.int32),
                            )
                self.slots[slot] = st
                continue

            s_pad = -(-len(ids) // self.prompt_pad) * self.prompt_pad
            if self.paged:
                try:
                    got = self._alloc_blocks(slot, ids, s_pad, req)
                except ImpossibleRequest as e:
                    handle.error = str(e)
                    handle._done.set()
                    continue
                if got is None:
                    with self.lock:
                        heapq.heappush(self.pending, entry)
                    break
            padded = np.zeros((1, s_pad), np.int32)
            padded[0, : len(ids)] = ids
            vf = jnp.asarray(req.video_features)[None]
            k_use, k_rest = jax.random.split(key)
            self.keys = self.keys.at[slot].set(k_rest)
            tok, self.cache = _prefill_slot(
                self.params,
                self.cache,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(padded),
                jnp.asarray([len(ids)], jnp.int32),
                vf,
                k_use,
                jnp.asarray(req.temperature, jnp.float32),
                jnp.asarray(req.top_p, jnp.float32),
                self.cfg,
                mesh=self.mesh,
            )
            if self.speculative:
                self.ctx, self.ctx_len = _set_ctx_row(
                    self.ctx, self.ctx_len, jnp.asarray(slot, jnp.int32),
                    jnp.asarray(padded), jnp.asarray([len(ids)], jnp.int32),
                    tok,
                )
            st = _Slot(req, handle, len(ids))
            st.last_token = int(np.asarray(tok))
            st.generated = 1
            self.slots[slot] = st
            if not self._deliver(st, [st.last_token]):
                # single-token request finished at prefill
                self._retire(slot)

    def _advance_prefill(self) -> bool:
        """Run ONE prefill chunk for the first not-yet-ready slot (so a
        long admission never stalls decode by more than one chunk).
        Returns True if a chunk ran."""
        for i, st in enumerate(self.slots):
            if st is None or st.ready:
                continue
            if st.handle._cancelled:
                st.handle._done.set()
                self._retire(i)
                continue
            p = self.prefill_chunk
            chunk = np.ascontiguousarray(st.padded[:, st.base : st.base + p])
            final = st.base + p >= st.prompt_len
            if final:
                # only the final window's sample is kept: consume one
                # split from the slot's chain for it
                k_use, k_rest = jax.random.split(self.keys[i])
                self.keys = self.keys.at[i].set(k_rest)
            else:
                k_use = jnp.zeros((2,), jnp.uint32)  # sample discarded
            tok, self.cache = _prefill_chunk(
                self.params,
                self.cache,
                jnp.asarray(i, jnp.int32),
                jnp.asarray(chunk),
                jnp.asarray([st.base], jnp.int32),
                jnp.asarray([st.prompt_len], jnp.int32),
                k_use,
                jnp.asarray(st.req.temperature, jnp.float32),
                jnp.asarray(st.req.top_p, jnp.float32),
                self.cfg,
                mesh=self.mesh,
            )
            if self.speculative:
                self.ctx = _ctx_write_chunk(
                    self.ctx, jnp.asarray(i, jnp.int32),
                    jnp.asarray(chunk), jnp.asarray(st.base, jnp.int32),
                )
            st.base += p
            if st.base >= st.prompt_len:
                if self.speculative:
                    self.ctx, self.ctx_len = _ctx_finish_prefill(
                        self.ctx, self.ctx_len, jnp.asarray(i, jnp.int32),
                        jnp.asarray([st.prompt_len], jnp.int32), tok,
                    )
                st.ready = True
                st.last_token = int(np.asarray(tok))
                st.generated = 1
                if self.paged and self.prefix is not None and st.hashes:
                    self._promote(i, st)
                if not self._deliver(st, [st.last_token]):
                    self._retire(i)
            return True
        return False

    def _deliver(self, st: _Slot, new_tokens: List[int]) -> bool:
        """Append tokens to the request, honoring stop conditions.
        Returns False when the request finished."""
        req = st.req
        if st.handle._cancelled:
            st.handle._done.set()
            return False
        stops = {req.eos_token_id, *req.stop_token_ids}
        emit: List[int] = []
        alive = True
        for t in new_tokens:
            if t in stops:
                alive = False
                break
            emit.append(t)
            if len(st.handle.tokens) + len(emit) >= req.max_new_tokens:
                alive = False
                break
        if emit:
            st.handle.tokens.extend(emit)
            if req.on_token is not None:
                try:
                    req.on_token(emit)
                except Exception:
                    # a broken streaming callback (e.g. client hung up
                    # mid-SSE) cancels ITS request; it must never kill
                    # the scheduler thread for everyone else
                    alive = False
        if (
            st.prompt_len + len(st.handle.tokens) + 1
            + self.reserve
            > self.max_cache_len
        ):
            alive = False  # another chunk could clamp at the row end
        if not alive:
            st.handle._done.set()
        return alive

    def step_once(self) -> bool:
        """One scheduler iteration: admit pending, run one decode chunk,
        deliver tokens. Returns True if any work was done."""
        self._admit()
        prefilled = self._advance_prefill()
        live = [
            i for i, s in enumerate(self.slots)
            if s is not None and s.ready
        ]
        if not live:
            return prefilled
        active = np.zeros((self.num_slots,), bool)
        tokens = np.zeros((self.num_slots,), np.int32)
        temps = np.zeros((self.num_slots,), np.float32)
        top_ps = np.ones((self.num_slots,), np.float32)
        for i in live:
            st = self.slots[i]
            active[i] = True
            tokens[i] = st.last_token
            temps[i] = st.req.temperature
            top_ps[i] = st.req.top_p

        if self.speculative and all(
            self.slots[i].req.temperature <= 0.0 for i in live
        ):
            buf, counts, self.cache, self.ctx, self.ctx_len, last = (
                _decode_chunk_pld(
                    self.params, self.cache, self.ctx, self.ctx_len,
                    jnp.asarray(tokens), jnp.asarray(active), self.cfg,
                    self.chunk, self.spec_k, self.spec_ngram,
                    mesh=self.mesh,
                )
            )
            buf = np.asarray(buf)  # ONE host transfer per chunk
            counts = np.asarray(counts)
            last = np.asarray(last)
            self.stats["spec_chunks"] += 1
            self.stats["spec_tokens"] += int(counts[active].sum())
            for i in live:
                st = self.slots[i]
                if self._deliver(st, buf[i, : counts[i]].tolist()):
                    st.last_token = int(last[i])
                    st.generated += int(counts[i])
                else:
                    self._retire(i)
            return True

        toks, self.cache, self.keys = _decode_chunk(
            self.params,
            self.cache,
            jnp.asarray(tokens),
            jnp.asarray(active),
            jnp.asarray(temps),
            jnp.asarray(top_ps),
            self.keys,
            self.cfg,
            self.chunk,
            mesh=self.mesh,
        )
        toks = np.asarray(toks)  # ONE host transfer per chunk
        if self.speculative:
            # keep the prompt-lookup context fresh for later spec chunks
            self.ctx, self.ctx_len = _append_ctx(
                self.ctx, self.ctx_len, jnp.asarray(toks),
                jnp.asarray(active),
            )
        self.stats["plain_chunks"] += 1
        for i in live:
            st = self.slots[i]
            if self._deliver(st, toks[i].tolist()):
                st.last_token = int(toks[i, -1])
                st.generated += self.chunk
            else:
                self._retire(i)
        return True

    # -- background thread --------------------------------------------

    def start(self):
        assert self._thread is None
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        with self.work:
            self._stop = True
            self.work.notify()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def _fail_all(self, msg: str) -> None:
        """Fail every in-flight and pending request loudly (scheduler
        backstop — a hung handle is worse than an errored one)."""
        for i, st in enumerate(self.slots):
            if st is not None:
                st.handle.error = msg
                st.handle._done.set()
                self._retire(i)
        with self.lock:
            while self.pending:
                *_, handle = heapq.heappop(self.pending)
                handle.error = msg
                handle._done.set()

    def _run(self):
        errors = 0
        while True:
            try:
                did = self.step_once()
                errors = 0
            except Exception as e:  # backstop: never die silently
                errors += 1
                logging.getLogger(__name__).exception(
                    "continuous engine step failed (%d consecutive)",
                    errors,
                )
                self._fail_all(f"engine step failed: {e!r}")
                if errors >= 3:
                    # persistent failure (bad weights, device gone):
                    # stop rather than spin; submit() fails fast once
                    # _dead is set
                    self._dead = True
                    self._stop = True
                    return
                did = True
            if not did:
                with self.work:
                    if self._stop:
                        return
                    if not self.pending and not any(self.slots):
                        self.work.wait(timeout=0.1)
            with self.lock:
                if self._stop and not any(self.slots) and not self.pending:
                    return

"""Autoregressive generation: prefill + jitted decode loop.

Replaces HF `model.generate` + KeywordsStoppingCriteria as used by the
reference (video_chatgpt/inference.py:105-112, model/utils.py:6-26) with
a TPU-native design:

  * the whole decode loop is ONE jitted `lax.while_loop` — no per-step
    host round trip;
  * sampling (temperature / top-p) happens on device with a threaded
    PRNG key;
  * stop-token-id checks run on device; decoded-substring keyword stops
    are checked host-side every `keyword_check_every` tokens by slicing
    the already-materialized output buffer (chunked generation), so a
    multi-token keyword costs at most one chunk of extra decode.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, VideoLLaVAConfig
from video_llava_tpu.models import llama, video_llava
from video_llava_tpu.models.llama import KVCache

# Whole-program jits of the model entry points. Calling the bare
# functions dispatches op-by-op, which on the tunneled TPU costs one
# host round trip per op — prefill must be ONE compiled program.
prefill_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "max_cache_len", "cache_dtype", "mesh")
)(video_llava.prefill)
# The cache is DONATED: without donation XLA defensively copies the
# whole KV cache on every step to preserve the (never reused) input
# buffer — profiled at 1.03 ms/step of the 7.8 ms int4 7B decode step
# (copy.19/copy.20 in scripts/profile_decode.py). Callers must treat
# the passed cache as consumed (every in-tree caller reassigns it).
decode_step_jit = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnums=(3,)
)(llama.decode_step)


def process_logits(logits: jax.Array, gen: GenerationConfig) -> jax.Array:
    """Temperature scaling + top-p masking. logits: (..., vocab) fp32 ->
    processed logits whose softmax is the sampling distribution."""
    scaled = logits / gen.temperature
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set with cumulative prob >= top_p.
        cutoff_idx = jnp.sum((cum - probs) < gen.top_p, axis=-1) - 1
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[..., None], axis=-1
        )
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return scaled


def sample_token(
    logits: jax.Array, rng: jax.Array, gen: GenerationConfig
) -> jax.Array:
    """logits: (b, vocab) fp32 -> (b,) int32."""
    if not gen.do_sample or gen.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = process_logits(logits, gen)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (b, max_new_tokens) int32, pad after stop
    lengths: jax.Array  # (b,) int32 — generated tokens incl. the stop token
    cache: KVCache


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen", "max_new_tokens", "mesh"),
    donate_argnums=(4,),  # cache: see decode_step_jit's donation note
)
def _decode_loop(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    first_logits: jax.Array,
    cache: KVCache,
    rng: jax.Array,
    max_new_tokens: int,
    mesh=None,
) -> GenerateResult:
    if mesh is not None:
        # Pin the loop carry to the inference layout: without this GSPMD
        # may re-propagate the cache into a different (e.g. head_dim-
        # sharded) layout across the while_loop, forcing a resharding of
        # the whole cache between prefill and decode.
        from video_llava_tpu.parallel.sharding import constrain_kv_cache

        cache = constrain_kv_cache(cache, mesh)
        _pin = lambda c: constrain_kv_cache(c, mesh)  # noqa: E731
    else:
        _pin = lambda c: c  # noqa: E731
    b = first_logits.shape[0]
    stop_ids = jnp.asarray(
        (gen.eos_token_id,) + tuple(gen.stop_token_ids), jnp.int32
    )

    rng, sub = jax.random.split(rng)
    tok0 = sample_token(first_logits, sub, gen)
    done0 = jnp.any(tok0[:, None] == stop_ids[None, :], axis=-1)
    buf0 = jnp.full((b, max_new_tokens), gen.pad_token_id, jnp.int32)
    buf0 = buf0.at[:, 0].set(tok0)
    len0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        step, _, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, buf, tok, cache, done, lens, rng = state
        logits, new_cache = llama.decode_step(params["llm"], cfg.llm, tok, cache)
        new_cache = _pin(new_cache)
        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, gen)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        hit_stop = jnp.any(nxt[:, None] == stop_ids[None, :], axis=-1)
        new_done = done | hit_stop
        buf = jax.lax.dynamic_update_slice(buf, nxt[:, None], (0, step))
        lens = lens + (~done).astype(jnp.int32)
        # Rows already done must not advance their cache length.
        new_cache = new_cache._replace(
            length=jnp.where(done, cache.length, new_cache.length)
        )
        return step + 1, buf, nxt, new_cache, new_done, lens, rng

    state = (jnp.int32(1), buf0, tok0, cache, done0, len0, rng)
    _, buf, _, cache, _, lens, _ = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=buf, lengths=lens, cache=cache)


def generate(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    video_features: Optional[jax.Array],
    rng: jax.Array,
    max_cache_len: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    mesh=None,
    speculative: bool = False,
    spec_ngram: int = 3,
    spec_k: int = 8,
) -> GenerateResult:
    """Prefill a right-padded batch and decode up to max_new_tokens.

    mesh: optional ('data', 'model') Mesh for TP/DP inference — params
    and inputs must already be device_put with their NamedShardings; the
    cache is pinned to cache_spec and the decode loop inherits it.

    speculative: batched prompt-lookup speculative decoding
    (engine/speculative.py — greedy-exact / distribution-exact, rows
    draft and advance independently). QA answers echo question/
    transcript spans, so the batched QA sweep is PLD's best regime.
    Ignored under a TP mesh (the spec loop does not pin sharded cache
    layouts).
    """
    b, s = input_ids.shape
    if mesh is not None:
        speculative = False
    slack = spec_k + 1 if speculative else 0
    if max_cache_len is None:
        max_cache_len = s + gen.max_new_tokens + slack
    elif speculative:
        # the optimistic verify write may run k past the last kept token
        max_cache_len = max(max_cache_len, s + gen.max_new_tokens + slack)
    res = prefill_jit(
        params, cfg, input_ids, seq_lens, video_features,
        max_cache_len=max_cache_len, cache_dtype=cache_dtype, mesh=mesh,
    )
    if speculative:
        from video_llava_tpu.engine.speculative import (
            _decode_loop_pld, _init_ctx,
        )

        ctx = _init_ctx(
            input_ids, s + gen.max_new_tokens + spec_k + 1,
            jnp.int32(gen.pad_token_id),
        )
        out, _, _ = _decode_loop_pld(
            params, cfg, gen, res.logits_last, res.cache, ctx,
            seq_lens.astype(jnp.int32), rng, gen.max_new_tokens,
            spec_ngram, spec_k,
        )
        return out
    return _decode_loop(
        params, cfg, gen, res.logits_last, res.cache, rng,
        gen.max_new_tokens, mesh=mesh,
    )


def generate_with_keywords(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    video_features: Optional[jax.Array],
    rng: jax.Array,
    decode_fn: Callable[[Sequence[int]], str],
    keywords: Sequence[str] = (),
    keyword_check_every: int = 64,
    max_cache_len: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    on_delta: Optional[Callable[[str], None]] = None,
    postprocess: Optional[Callable[[str], str]] = None,
    mesh=None,
    speculative: bool = False,
    spec_ngram: int = 3,
    spec_k: int = 8,
) -> Tuple[str, GenerateResult]:
    """Generation with reference keyword-stopping semantics
    (model/utils.py:6-26): stop when a decoded keyword substring appears.

    Decodes in device chunks of `keyword_check_every` tokens, checking
    the decoded text host-side between chunks; the final text has the
    keyword and anything after it stripped (inference.py:120-123).
    Batch size 1 (matches reference usage).

    speculative: run each chunk through the prompt-lookup speculative
    loop (engine/speculative.py) instead of plain decode — the chunked
    host checks already bound how far past a textual stop the device
    can run, so textual-stop templates get the same 1.5-3x echo-regime
    speedup as token-id stops (greedy output is identical; sampled
    output is distribution-exact). Ignored under a TP mesh (the spec
    loop does not pin sharded cache layouts).

    on_delta: streaming callback, called once per device chunk with the
    newly finalized text. To never retract emitted text, emission holds
    back max(len(keyword)) - 1 characters until the keyword check for a
    chunk has passed; the final delta flushes the remainder.

    postprocess: applied to the final text BEFORE the last delta and the
    return value, so the concatenated stream equals the returned text
    (defaults to str.strip). If it rewrites an already-emitted prefix
    (e.g. strips leading whitespace streamed in an earlier chunk), the
    raw remainder is flushed instead — emitted text is never retracted.
    """
    assert input_ids.shape[0] == 1, "keyword stopping is per-conversation"
    b, s = input_ids.shape
    if mesh is not None:
        speculative = False
    if max_cache_len is None:
        # The speculative verify writes optimistically up to k past the
        # last kept token; the cache needs that slack.
        max_cache_len = s + gen.max_new_tokens + (
            spec_k + 1 if speculative else 0
        )
    pre = prefill_jit(
        params, cfg, input_ids, seq_lens, video_features,
        max_cache_len=max_cache_len, cache_dtype=cache_dtype, mesh=mesh,
    )
    logits, cache = pre.logits_last, pre.cache
    ctx = ctx_len = None
    if speculative:
        from video_llava_tpu.engine.speculative import (
            _decode_loop_pld, _init_ctx,
        )

        ctx = _init_ctx(
            input_ids, s + gen.max_new_tokens + spec_k + 1,
            jnp.int32(gen.pad_token_id),
        )
        ctx_len = seq_lens.astype(jnp.int32)

    pieces: list = []
    text = ""
    emitted = 0
    holdback = max((len(k) for k in keywords if k), default=1) - 1

    def emit(current: str, final: bool) -> None:
        nonlocal emitted
        if on_delta is None:
            return
        upto = len(current) if final else max(len(current) - holdback, 0)
        if upto > emitted:
            on_delta(current[emitted:upto])
            emitted = upto

    remaining = gen.max_new_tokens
    while remaining > 0:
        chunk = min(keyword_check_every, remaining)
        rng, sub = jax.random.split(rng)
        if speculative:
            out, ctx, ctx_len = _decode_loop_pld(
                params, cfg, gen, logits, cache, ctx, ctx_len, sub,
                chunk, spec_ngram, spec_k,
            )
        else:
            out = _decode_loop(params, cfg, gen, logits, cache, sub, chunk,
                               mesh=mesh)
        # One device->host transfer per chunk (per-scalar fetches cost
        # a ~26 ms round trip each on the tunneled TPU).
        n = int(out.lengths[0])
        toks = np.asarray(out.tokens[0])[:n].tolist()
        pieces.extend(toks)
        remaining -= chunk
        text = decode_fn(pieces)
        stopped_by_id = n < chunk or (
            toks and toks[-1] in (gen.eos_token_id, *gen.stop_token_ids)
        )
        kw_hit = next((k for k in keywords if k and k in text), None)
        if kw_hit is not None:
            text = text.split(kw_hit)[0]
            break
        if stopped_by_id:
            break
        emit(text, final=False)
        # Continue from the last token.
        cache = out.cache
        last = out.tokens[:, n - 1]
        step_logits, cache = decode_step_jit(params["llm"], cfg.llm, last, cache)
        logits = step_logits

    final = (postprocess or str.strip)(text)
    if on_delta is not None:
        if final.startswith(text[:emitted]):
            if len(final) > emitted:
                on_delta(final[emitted:])
                emitted = len(final)
        else:
            emit(text, final=True)
    return final, GenerateResult(
        tokens=jnp.asarray([pieces], jnp.int32),
        lengths=jnp.asarray([len(pieces)], jnp.int32),
        cache=cache,
    )

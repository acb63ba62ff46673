"""Prompt-lookup speculative decoding (greedy-exact).

Decode is HBM-bandwidth bound: every step streams the full weight set
to produce ONE token. Speculative decoding amortizes that stream —
draft tokens are proposed for free and verified in a single multi-token
forward, so one weight stream can emit several tokens. This module
implements the draft-model-free "prompt lookup" variant (public
technique, a.k.a. assisted generation by n-gram matching): the draft
for the next k tokens is the continuation of the most recent earlier
occurrence of the trailing n-gram in the context. Video QA is a strong
fit — answers echo spans of the question, transcript, and prior turns.

Guarantee: greedy requests emit the vanilla greedy continuation (every
accepted token equals the model's own argmax given its prefix; the
first non-matching position emits the model's argmax directly).
Sampled requests (temperature / top-p) are distribution-exact via
speculative rejection sampling against the deterministic draft (see
accept_tokens). Speculation only changes speed, never the output law.
Caveat: the verify forward computes logits through the multi-token
cached path while plain decode uses the fused s=1 path; reduction
orders differ in the low bits, so an exact argmax TIE can break
differently (measured: 0/128 token mismatches vs plain greedy on the
7B bench model). This is the same class of wobble as re-running the
same prompt under a different batch size.

No reference equivalent (video_chatgpt/inference.py:105-112 decodes one
token per forward via HF generate); this is a TPU-native extension.

TPU design notes:
  * the whole loop is one jitted `lax.while_loop`; every iteration
    feeds a FIXED k+1 tokens (last accepted token + k drafts, junk-
    padded when the draft is short) so there is exactly one compiled
    verify program — no dynamic shapes;
  * n-gram matching is a handful of rolled vector compares over the
    fixed-size context buffer (VPU work, negligible vs the forward);
  * the KV cache is written optimistically for all k+1 fed positions
    and "rewound" by setting `length` back to the accepted prefix —
    stale entries past `length` are masked by the ragged attention
    reads and overwritten by the next iteration's write at `length`;
  * worst case (nothing ever matches) each iteration emits 1 token for
    one (k+1)-token forward — still one weight stream per iteration,
    so the overhead vs plain decode is the extra attention/activation
    FLOPs only, not k extra weight streams.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from video_llava_tpu.config import GenerationConfig, VideoLLaVAConfig
from video_llava_tpu.engine.generate import GenerateResult, process_logits
from video_llava_tpu.models import llama, video_llava
from video_llava_tpu.models.llama import KVCache


def find_draft(
    ctx: jax.Array, ctx_len: jax.Array, ngram: int, k: int
):
    """Most-recent-match prompt lookup.

    ctx: (C,) int32 context buffer (prompt + accepted tokens), valid in
    [0, ctx_len). Matches the trailing `ngram` tokens (ending at index
    ctx_len-1) against every earlier window; returns (draft (k,) int32,
    draft_len int32) — the continuation after the most recent match,
    clipped to known context. draft_len == 0 when there is no match or
    the context is shorter than ngram+1.
    """
    c = ctx.shape[0]
    # Trailing n-gram: ctx[ctx_len-ngram : ctx_len].
    tail = jax.lax.dynamic_slice(ctx, (jnp.maximum(ctx_len - ngram, 0),),
                                 (ngram,))
    # eq[j] == True iff ctx[j : j+ngram] == tail (positions past C wrap
    # via roll; masked out by the validity bound below).
    eq = jnp.ones((c,), bool)
    for i in range(ngram):
        eq &= jnp.roll(ctx, -i) == tail[i]
    idx = jnp.arange(c, dtype=jnp.int32)
    # Window must end before the trailing n-gram starts: j + ngram - 1
    # < ctx_len - ngram  <=>  j < ctx_len - 2*ngram + 1.
    valid = eq & (idx < ctx_len - 2 * ngram + 1)
    j = jnp.max(jnp.where(valid, idx, -1))
    has = (j >= 0) & (ctx_len >= ngram + 1)
    start = jnp.maximum(jnp.where(has, j + ngram, 0), 0)
    draft = jax.lax.dynamic_slice(ctx, (jnp.minimum(start, c - k),), (k,))
    # Continuation tokens must come from known context.
    draft_len = jnp.where(has, jnp.minimum(k, ctx_len - start), 0)
    return draft, draft_len.astype(jnp.int32)


def accept_tokens(
    logits: jax.Array,
    draft: jax.Array,
    draft_len: jax.Array,
    rng: jax.Array,
    gen: GenerationConfig,
):
    """Speculative acceptance for a deterministic (prompt-lookup) draft.

    logits: (k+1, vocab) raw model logits at the fed positions; draft:
    (k,) proposed tokens. Returns (m, z): the accepted prefix length of
    the draft and the token emitted at position m (the model's own
    sample at the first non-accepted position, or the bonus token when
    the whole draft is accepted).

    Greedy: accept while draft == argmax; z = argmax. Sampled: standard
    speculative rejection sampling against a delta draft distribution —
    accept d_i with prob p_i(d_i); on rejection resample from the
    residual norm((p_i - q_i)+), which for a one-hot q is p_i with the
    draft token masked out. Either way each emitted token is
    distributed exactly as ancestral decoding from the processed
    logits, so speculation changes speed, never the output law.
    """
    k = draft.shape[0]
    ar = jnp.arange(k, dtype=jnp.int32)
    if not gen.do_sample or gen.temperature <= 0.0:
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ok = (draft == g[:k]) & (ar < draft_len)
        m = jnp.argmin(
            jnp.concatenate([ok, jnp.zeros((1,), bool)])
        ).astype(jnp.int32)
        return m, g[m]
    proc = process_logits(logits, gen)  # (k+1, vocab)
    logp = jax.nn.log_softmax(proc[:k], axis=-1)
    p_draft = jnp.exp(
        jnp.take_along_axis(logp, draft[:, None], axis=-1)[:, 0]
    )
    rng_u, rng_z = jax.random.split(rng)
    u = jax.random.uniform(rng_u, (k,))
    ok = (u < p_draft) & (ar < draft_len)
    m = jnp.argmin(
        jnp.concatenate([ok, jnp.zeros((1,), bool)])
    ).astype(jnp.int32)
    rejected = m < draft_len
    row = proc[m]
    vocab = row.shape[0]
    mask = (jnp.arange(vocab) == draft[jnp.minimum(m, k - 1)]) & rejected
    row = jnp.where(mask, -jnp.inf, row)
    z = jax.random.categorical(rng_z, row).astype(jnp.int32)
    return m, z


@functools.partial(jax.jit, static_argnames=("cap",))
def _init_ctx(input_ids: jax.Array, cap: int, pad_token_id: jax.Array):
    """Context buffer (prompt + accepted tokens) for the n-gram lookup.
    One jitted program (eager buffer ops cost a host round trip each on
    the tunneled TPU). cap must cover prompt + all future emissions +
    the k+1 write overshoot."""
    b = input_ids.shape[0]
    ctx = jnp.full((b, cap), pad_token_id, jnp.int32)
    return jax.lax.dynamic_update_slice(
        ctx, input_ids.astype(jnp.int32), (0, 0)
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen", "max_new_tokens", "ngram", "k"),
    # cache + ctx are donated: chunk callers reassign both, and the
    # undonated form defensively copies the whole KV cache per chunk
    # (see engine/generate.decode_step_jit's donation note).
    donate_argnums=(4, 5),
)
def _decode_loop_pld(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    first_logits: jax.Array,
    cache: KVCache,
    ctx: jax.Array,
    ctx_len: jax.Array,
    rng: jax.Array,
    max_new_tokens: int,
    ngram: int,
    k: int,
):
    """Speculative decode loop (any batch size), greedy or sampled.

    Per-row state: rows draft, accept and advance independently (rows
    with longer accepted runs finish their budget in fewer iterations;
    a finished row keeps feeding pad tokens whose cache writes are
    rewound). The cache max length must cover cache.length +
    max_new_tokens + k + 1 positions (the optimistic write may run k
    past the last kept token).

    ctx/ctx_len: the lookup context from `_init_ctx`, threaded through
    so callers can resume the loop across host-side keyword checks
    (generate_with_keywords chunks). Returns (GenerateResult, ctx,
    ctx_len) with the emitted tokens appended to ctx.
    """
    from video_llava_tpu.engine.generate import sample_token

    b = first_logits.shape[0]
    ctx_len = ctx_len.astype(jnp.int32)
    stop_ids = jnp.asarray(
        (gen.eos_token_id,) + tuple(gen.stop_token_ids), jnp.int32
    )
    pad = jnp.int32(gen.pad_token_id)
    buf_cap = max_new_tokens + k + 1  # slack for the final overshoot
    ar = jnp.arange(k + 1, dtype=jnp.int32)

    find_draft_b = jax.vmap(lambda c, l: find_draft(c, l, ngram, k))
    accept_b = jax.vmap(
        lambda lo, d, dl, r: accept_tokens(lo, d, dl, r, gen)
    )
    write_row = jax.vmap(
        lambda row, val, pos: jax.lax.dynamic_update_slice(row, val, (pos,))
    )

    rng, sub = jax.random.split(rng)
    tok0 = sample_token(first_logits, sub, gen)  # (b,)
    done0 = jnp.any(tok0[:, None] == stop_ids[None, :], axis=-1)
    buf0 = jnp.full((b, buf_cap), pad, jnp.int32).at[:, 0].set(tok0)
    ctx0 = write_row(ctx, tok0[:, None], ctx_len)
    n0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        n, _, _, _, _, done, _, _ = state
        return ~jnp.all(done | (n >= max_new_tokens))

    def body(state):
        n, buf, tok, cache, ctx, done, ctx_len, rng = state
        draft, draft_len = find_draft_b(ctx, ctx_len)  # (b, k), (b,)
        fed = jnp.concatenate([tok[:, None], draft], axis=1)  # (b, k+1)
        logits, new_cache = llama.forward(
            params["llm"], cfg.llm, input_ids=fed, cache=cache
        )
        rng, sub = jax.random.split(rng)
        m, z = accept_b(
            logits, draft, draft_len, jax.random.split(sub, b)
        )  # (b,), (b,)
        # Candidate emissions per row: m accepted drafts then z (the
        # model's own token at the first non-accepted position / bonus).
        cand = jnp.where(
            ar[None] < m[:, None],
            jnp.take_along_axis(
                draft, jnp.minimum(ar, k - 1)[None].repeat(b, 0), axis=1
            ),
            jnp.where(ar[None] == m[:, None], z[:, None], pad),
        )
        is_stop = jnp.any(
            cand[:, :, None] == stop_ids[None, None, :], axis=-1
        ) & (ar[None] <= m[:, None])
        first_stop = jnp.argmax(
            jnp.concatenate([is_stop, jnp.ones((b, 1), bool)], axis=1),
            axis=1,
        ).astype(jnp.int32)
        hit = first_stop <= m
        n_new = jnp.where(hit, first_stop + 1, m + 1)
        # Finished rows emit nothing; cap every row at its budget.
        n_new = jnp.where(done, 0, jnp.minimum(n_new, max_new_tokens - n))
        cand = jnp.where(ar[None] < n_new[:, None], cand, pad)
        buf = write_row(buf, cand, n)
        ctx = write_row(ctx, cand, ctx_len)
        # Keep cache entries for tok + the accepted drafts only (rows
        # that emitted nothing rewind their whole write).
        keep = jnp.where(done, 0, jnp.minimum(1 + m, n_new))
        new_cache = new_cache._replace(length=cache.length + keep)
        new_tok = jnp.where(
            done, tok,
            jnp.take_along_axis(
                cand, jnp.maximum(n_new - 1, 0)[:, None], axis=1
            )[:, 0],
        )
        new_done = done | hit | (n + n_new >= max_new_tokens)
        return (n + n_new, buf, new_tok, new_cache, ctx, new_done,
                ctx_len + n_new, rng)

    state = (n0, buf0, tok0, cache, ctx0, done0,
             ctx_len + jnp.int32(1), rng)
    n, buf, _, cache, ctx, _, ctx_len, _ = jax.lax.while_loop(
        cond, body, state
    )
    n = jnp.minimum(n, max_new_tokens)
    out = jnp.where(
        jnp.arange(buf_cap)[None] < n[:, None], buf, pad
    )[:, :max_new_tokens]
    return GenerateResult(tokens=out, lengths=n, cache=cache), ctx, ctx_len


def generate_pld_text(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    input_ids,
    s_real: int,
    video_features,
    rng,
    tokenizer,
    stop_str: Optional[str],
    cache_dtype=jnp.bfloat16,
) -> str:
    """Speculative generation decoded to text with the reference's
    stop-string strip (shared by runtime.inference and serving)."""
    import numpy as np

    out = generate_pld(
        params,
        cfg,
        gen,
        jnp.asarray(input_ids),
        jnp.asarray([s_real], jnp.int32),
        video_features,
        rng=rng,
        cache_dtype=cache_dtype,
    )
    # One device->host transfer (per-scalar fetches cost a ~26 ms round
    # trip each on the tunneled TPU).
    toks = np.asarray(out.tokens[0])
    n = int(out.lengths[0])
    text = tokenizer.decode(toks[:n].tolist(), skip_special_tokens=True)
    text = text.strip()
    if stop_str and text.endswith(stop_str):
        text = text[: -len(stop_str)]
    return text.strip()


def generate_pld(
    params,
    cfg: VideoLLaVAConfig,
    gen: GenerationConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    video_features: Optional[jax.Array],
    rng: Optional[jax.Array] = None,
    ngram: int = 3,
    k: int = 8,
    max_cache_len: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
) -> GenerateResult:
    """Generation with prompt-lookup speculation (any batch size).

    Drop-in for `generate.generate`: greedy requests emit exactly the
    vanilla greedy continuation; sampled requests (do_sample, T>0,
    top-p) are distribution-exact via speculative rejection sampling
    (accept_tokens). Faster whenever answers reuse n-grams of the
    prompt/transcript/context. Rows draft and advance independently;
    an iteration costs one (b, k+1)-token forward (one weight stream).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, s = input_ids.shape
    if max_cache_len is None:
        max_cache_len = s + gen.max_new_tokens + k + 1
    from video_llava_tpu.engine.generate import prefill_jit

    res = prefill_jit(
        params, cfg, input_ids, seq_lens, video_features,
        max_cache_len=max_cache_len, cache_dtype=cache_dtype,
    )
    ctx = _init_ctx(
        input_ids, s + gen.max_new_tokens + k + 1,
        jnp.int32(gen.pad_token_id),
    )
    out, _, _ = _decode_loop_pld(
        params, cfg, gen, res.logits_last, res.cache, ctx,
        seq_lens.astype(jnp.int32), rng, gen.max_new_tokens, ngram, k,
    )
    return out

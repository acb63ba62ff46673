"""Continuous batching over the paged KV cache (shared block pool):
greedy/speculative/video parity with the one-shot generate path, block
allocator reuse, and pool-exhaustion backpressure.

No reference equivalent (the reference serves requests one at a time
through FastChat; quantitative_evaluation/README.md).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_llava_tpu.config import (
    GenerationConfig,
    LlamaConfig,
    VideoLLaVAConfig,
)
from video_llava_tpu.engine import generate as gen_mod
from video_llava_tpu.engine.continuous import ContinuousEngine, SlotRequest
from video_llava_tpu.models import video_llava
from video_llava_tpu.models.llama import PagedKVCache
from video_llava_tpu.runtime.tokenizer import ByteTokenizer


def _tiny_cfg():
    tok = ByteTokenizer()
    base = VideoLLaVAConfig.tiny()
    cfg = dataclasses.replace(
        base,
        llm=dataclasses.replace(
            LlamaConfig.tiny(vocab_size=512), num_layers=2, hidden_size=64,
            intermediate_size=128, num_heads=4, num_kv_heads=4, head_dim=16,
        ),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    return cfg, tok


@pytest.fixture(scope="module")
def tiny_model():
    cfg, tok = _tiny_cfg()
    params = video_llava.init_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32
    )
    return cfg, tok, params


def _reference_greedy(params, cfg, tok, ids, max_new):
    g = GenerationConfig(
        max_new_tokens=max_new, do_sample=False,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
    )
    arr = np.asarray(ids, np.int32)[None]
    r = gen_mod.generate(
        params, cfg, g, jnp.asarray(arr),
        jnp.asarray([arr.shape[1]], jnp.int32), None,
        jax.random.PRNGKey(0), cache_dtype=jnp.float32,
    )
    toks = np.asarray(r.tokens)[0].tolist()
    out = []
    for t in toks[: int(np.asarray(r.lengths)[0])]:
        if t == tok.eos_token_id:
            break
        out.append(t)
    return out


def _engine(cfg, params, **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("max_cache_len", 128)
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("chunk", 4)
    kw.setdefault("prompt_pad", 16)
    kw.setdefault("prefill_chunk", 16)
    kw.setdefault("paged", True)
    kw.setdefault("block_size", 16)
    return ContinuousEngine(params, cfg, **kw)


def _drain(eng, handles, max_iters=300):
    for _ in range(max_iters):
        if all(h.done for h in handles):
            return
        eng.step_once()
    raise AssertionError("engine did not finish")


def test_paged_greedy_parity(tiny_model):
    """Staggered greedy requests through a paged pool reproduce the
    one-shot generate() outputs token for token (chunked prefill +
    decode all ride the block tables)."""
    cfg, tok, params = tiny_model
    prompts = [
        [tok.bos_token_id] + list(b"hello world"),
        [tok.bos_token_id] + list(b"abc"),
        [tok.bos_token_id] + list(b"the quick brown fox"),
    ]
    expected = [
        _reference_greedy(params, cfg, tok, p, 12) for p in prompts
    ]
    eng = _engine(cfg, params, speculative=False)
    assert isinstance(eng.cache, PagedKVCache)
    h0 = eng.submit(SlotRequest(prompts[0], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    h1 = eng.submit(SlotRequest(prompts[1], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    eng.step_once()
    h2 = eng.submit(SlotRequest(prompts[2], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [h0, h1, h2])
    assert [h0.tokens, h1.tokens, h2.tokens] == expected


def test_paged_speculative_parity(tiny_model):
    """Prompt-lookup speculation over paged rows (the k+1 verify writes
    take the token-at-a-time block path) stays greedy-exact."""
    cfg, tok, params = tiny_model
    prompts = [
        [tok.bos_token_id] + list(b"echo echo echo echo"),
        [tok.bos_token_id] + list(b"zxcv"),
    ]
    expected = [
        _reference_greedy(params, cfg, tok, p, 10) for p in prompts
    ]
    eng = _engine(cfg, params, speculative=True, spec_k=4)
    handles = [
        eng.submit(SlotRequest(p, max_new_tokens=10,
                               eos_token_id=tok.eos_token_id))
        for p in prompts
    ]
    _drain(eng, handles)
    assert [h.tokens for h in handles] == expected
    assert eng.stats["spec_chunks"] > 0


def test_paged_video_request(tiny_model):
    """Whole-window video prefill writes through the block table."""
    cfg, tok, params = tiny_model
    rng = np.random.default_rng(3)
    n_vid = cfg.video_token_len
    feats = rng.standard_normal(
        (n_vid, cfg.vision.hidden_size)
    ).astype(np.float32)
    ids = (
        [tok.bos_token_id, tok.vid_start_token_id]
        + [tok.vid_patch_token_id] * n_vid
        + [tok.vid_end_token_id]
        + list(b" describe")
    )
    g = GenerationConfig(
        max_new_tokens=8, do_sample=False,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
    )
    arr = np.asarray(ids, np.int32)[None]
    ref = gen_mod.generate(
        params, cfg, g, jnp.asarray(arr),
        jnp.asarray([arr.shape[1]], jnp.int32),
        jnp.asarray(feats)[None], jax.random.PRNGKey(0),
        cache_dtype=jnp.float32,
    )
    exp = []
    for t in np.asarray(ref.tokens)[0][: int(np.asarray(ref.lengths)[0])]:
        if t == tok.eos_token_id:
            break
        exp.append(int(t))

    eng = _engine(cfg, params, max_cache_len=512, prompt_pad=64,
                  block_size=16)
    h = eng.submit(SlotRequest(
        ids, max_new_tokens=8, eos_token_id=tok.eos_token_id,
        video_features=feats,
    ))
    _drain(eng, [h])
    assert h.tokens == exp


def test_paged_pool_backpressure(tiny_model):
    """A pool too small for two concurrent requests serves them one at
    a time (admission waits on free blocks) and every block returns to
    the free list at the end."""
    cfg, tok, params = tiny_model
    prompts = [
        [tok.bos_token_id] + list(b"req %d padded out a bit" % i)
        for i in range(3)
    ]
    expected = [
        _reference_greedy(params, cfg, tok, p, 6) for p in prompts
    ]
    # need/request = max(w=32, 24+6+0+4) -> 34 tokens -> 3 blocks of 16;
    # 4 usable blocks => exactly one request in flight at a time
    eng = _engine(cfg, params, speculative=False, num_blocks=5)
    handles = [
        eng.submit(SlotRequest(p, max_new_tokens=6,
                               eos_token_id=tok.eos_token_id))
        for p in prompts
    ]
    saw_starved = False
    for _ in range(400):
        if all(h.done for h in handles):
            break
        eng.step_once()
        in_flight = sum(s is not None for s in eng.slots)
        if in_flight == 1 and eng.pending:
            saw_starved = True
        assert in_flight <= 1  # two never fit the pool
    assert all(h.done for h in handles)
    assert [h.tokens for h in handles] == expected
    assert saw_starved
    assert sorted(eng.alloc.free) == list(range(1, 5))
    np.testing.assert_array_equal(np.asarray(eng.cache.table), 0)


def test_paged_seeded_sampling_replay(tiny_model):
    """A seeded sampled request replays identically whether it runs in
    a paged or a slot-cache engine (same per-slot PRNG chains; logits
    parity makes the draws equal)."""
    cfg, tok, params = tiny_model
    ids = [tok.bos_token_id] + list(b"sample me")
    req = lambda: SlotRequest(  # noqa: E731
        ids, max_new_tokens=8, eos_token_id=tok.eos_token_id,
        temperature=0.9, top_p=0.9, seed=1234,
    )
    out = []
    for paged in (False, True):
        eng = _engine(cfg, params, speculative=False, paged=paged)
        h = eng.submit(req())
        _drain(eng, [h])
        out.append(h.tokens)
    assert out[0] == out[1] and out[0]


# -- automatic prefix caching --------------------------------------------------


def test_prefix_cache_skips_prefill_and_matches(tiny_model):
    """Second request sharing a long prompt prefix reuses the first's
    registry blocks (prefill skipped window-for-window) and still
    reproduces the one-shot generate output exactly."""
    cfg, tok, params = tiny_model
    prefix = list(b"shared system preamble with few-shot examples.. ")  # 48
    a = [tok.bos_token_id] + prefix + list(b"question one?")
    b = [tok.bos_token_id] + prefix + list(b"another ask")
    exp = [_reference_greedy(params, cfg, tok, p, 8) for p in (a, b)]

    eng = _engine(cfg, params, speculative=False, prefix_cache=True)
    ha = eng.submit(SlotRequest(a, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [ha])
    assert eng.stats["prefix_hit_tokens"] == 0
    hb = eng.submit(SlotRequest(b, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [hb])
    # shared prefix = 1 + 48 = 49 tokens -> 3 full 16-token blocks,
    # window-granular (P=16) -> 48 skipped
    assert eng.stats["prefix_hit_tokens"] == 48
    assert [ha.tokens, hb.tokens] == exp


def test_prefix_cache_speculative_ctx_complete(tiny_model):
    """Prefix-skipped windows still land in the prompt-lookup context
    rows — speculative decoding over a cached prefix stays exact."""
    cfg, tok, params = tiny_model
    prefix = list(b"repeat repeat repeat repeat repeat ")
    a = [tok.bos_token_id] + prefix + list(b"one")
    b = [tok.bos_token_id] + prefix + list(b"two")
    exp = [_reference_greedy(params, cfg, tok, p, 10) for p in (a, b)]
    eng = _engine(cfg, params, speculative=True, spec_k=4,
                  prefix_cache=True)
    ha = eng.submit(SlotRequest(a, max_new_tokens=10,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [ha])
    hb = eng.submit(SlotRequest(b, max_new_tokens=10,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [hb])
    assert eng.stats["prefix_hit_tokens"] > 0
    assert [ha.tokens, hb.tokens] == exp


def test_prefix_cache_eviction_under_pressure(tiny_model):
    """Cold registry blocks are reclaimed when the pool runs dry;
    distinct-prefix requests keep completing correctly and block
    accounting stays exact."""
    cfg, tok, params = tiny_model
    prompts = [
        [tok.bos_token_id] + list(b"distinct prefix %02d body text" % i)
        for i in range(4)
    ]
    exp = [_reference_greedy(params, cfg, tok, p, 6) for p in prompts]
    # tight pool: each request needs ~3 blocks; registry blocks from
    # retired requests must be evicted to admit later ones
    eng = _engine(cfg, params, speculative=False, prefix_cache=True,
                  num_blocks=8)
    out = []
    for p in prompts:
        h = eng.submit(SlotRequest(p, max_new_tokens=6,
                                   eos_token_id=tok.eos_token_id))
        _drain(eng, [h])
        out.append(h.tokens)
    assert out == exp
    # every block is either free or warm in the registry; none leaked
    in_registry = set(eng.prefix.refs)
    assert all(r == 0 for r in eng.prefix.refs.values())
    assert sorted(set(eng.alloc.free) | in_registry) == list(range(1, 8))
    assert not (set(eng.alloc.free) & in_registry)


def test_prefix_skip_window_overshoot_safe(tiny_model):
    """With a prefill window larger than the remaining prompt, the
    shifted window grid writes far past the row's allocation (pad-block
    / clamped-table territory). Those writes must never corrupt other
    rows or the row's own valid K/V: outputs stay exact while another
    request decodes concurrently."""
    cfg, tok, params = tiny_model
    prefix = list(b"sixteen byte pre")  # 16 bytes -> 1+16 tokens
    a = [tok.bos_token_id] + prefix + list(b"one")
    b = [tok.bos_token_id] + prefix + list(b"two")
    c = [tok.bos_token_id] + list(b"bystander request")
    exp = {
        "a": _reference_greedy(params, cfg, tok, a, 8),
        "b": _reference_greedy(params, cfg, tok, b, 8),
        "c": _reference_greedy(params, cfg, tok, c, 20),
    }
    # P=64 windows, 16-token blocks: request b skips 16 tokens and its
    # single window [16, 80) extends ~48 positions past its allocation
    eng = _engine(cfg, params, speculative=False, prefix_cache=True,
                  prefill_chunk=64, num_slots=2)
    ha = eng.submit(SlotRequest(a, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [ha])
    hc = eng.submit(SlotRequest(c, max_new_tokens=20,
                                eos_token_id=tok.eos_token_id))
    eng.step_once()  # c mid-decode when b's overshooting window runs
    hb = eng.submit(SlotRequest(b, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [hb, hc])
    assert eng.stats["prefix_hit_tokens"] == 16
    assert ha.tokens == exp["a"]
    assert hb.tokens == exp["b"]
    assert hc.tokens == exp["c"]


def test_full_allocation_overshoot_no_self_corruption(tiny_model):
    """Adversarial-review repro: a request whose allocation fills its
    ENTIRE table gets an overshooting prefix-skipped window; the
    out-of-range block index must go to the pad block, not clamp onto
    the row's own last (valid) block."""
    cfg, tok, params = tiny_model
    prefix = list(b"fifteen bytes..")  # [bos]+15 -> exactly block 0
    a = [tok.bos_token_id] + prefix + list(b"warm")
    body = (b"x" * 90)  # B: 1 + 15 + 90 = 106 tokens (under budget 123)
    b_ids = [tok.bos_token_id] + prefix + list(body)
    exp_a = _reference_greedy(params, cfg, tok, a, 4)
    exp_b = _reference_greedy(params, cfg, tok, b_ids, 2)

    # ML=128, bs=16 -> max_blocks=8; B needs 106+2+1+4=113 -> all 8:
    # its window [16, 144) hits block index 8 (out of range)
    eng = _engine(cfg, params, speculative=False, prefix_cache=True,
                  prefill_chunk=64)
    ha = eng.submit(SlotRequest(a, max_new_tokens=4,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [ha])
    hb = eng.submit(SlotRequest(b_ids, max_new_tokens=2,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [hb])
    assert eng.stats["prefix_hit_tokens"] == 16
    assert ha.tokens == exp_a
    assert hb.tokens == exp_b


def test_impossible_request_fails_fast(tiny_model):
    """A request that can never fit the pool errors its handle loudly
    instead of re-queueing forever, and traffic behind it proceeds."""
    cfg, tok, params = tiny_model
    # capacity 3 blocks of 16 = 48 positions; this request needs 5
    eng = _engine(cfg, params, speculative=False, num_blocks=4)
    big = eng.submit(SlotRequest(
        [tok.bos_token_id] + list(b"a" * 40), max_new_tokens=20,
        eos_token_id=tok.eos_token_id,
    ))
    small_ids = [tok.bos_token_id] + list(b"ok")
    small = eng.submit(SlotRequest(
        small_ids, max_new_tokens=4, eos_token_id=tok.eos_token_id,
    ))
    _drain(eng, [big, small])
    with pytest.raises(RuntimeError, match="pool"):
        big.result()
    assert small.tokens == _reference_greedy(
        params, cfg, tok, small_ids, 4
    )


def test_unaligned_prefill_chunk_rounds_down(tiny_model):
    """prefill_chunk values that aren't block multiples (e.g. the
    min(256, max_cache_len) clamp) align down instead of asserting."""
    cfg, tok, params = tiny_model
    ids = [tok.bos_token_id] + list(b"some prompt that spans windows")
    exp = _reference_greedy(params, cfg, tok, ids, 6)
    eng = _engine(cfg, params, speculative=False, prefill_chunk=24)
    assert eng.prefill_chunk == 16
    h = eng.submit(SlotRequest(ids, max_new_tokens=6,
                               eos_token_id=tok.eos_token_id))
    _drain(eng, [h])
    assert h.tokens == exp

"""Continuous batching engine (engine/continuous.py): greedy parity
with the one-shot generate path, slot reuse, per-row sampling params,
stop handling, and the background scheduler thread."""

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
    # small windows so ordinary test prompts exercise multi-chunk
    # prefill (positions offset + q_offset attention path)
    kw.setdefault("prefill_chunk", 16)
    return ContinuousEngine(params, cfg, **kw)


def _drain(eng, handles, max_iters=200):
    for _ in range(max_iters):
        if all(h.done for h in handles):
            return
        eng.step_once()
    raise AssertionError("engine did not finish")


def test_greedy_parity_interleaved(tiny_model):
    """Three staggered greedy requests through 2 slots must reproduce
    the one-shot generate() outputs token for token."""
    cfg, tok, params = tiny_model
    prompts = [
        [tok.bos_token_id] + list(b"hello world"),
        [tok.bos_token_id] + list(b"abc"),
        [tok.bos_token_id] + list(b"the quick brown fox"),
    ]
    expected = [
        _reference_greedy(params, cfg, tok, p, 12) for p in prompts
    ]

    eng = _engine(cfg, params)
    h0 = eng.submit(SlotRequest(prompts[0], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    h1 = eng.submit(SlotRequest(prompts[1], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    eng.step_once()  # both admitted; third arrives mid-flight
    h2 = eng.submit(SlotRequest(prompts[2], max_new_tokens=12,
                                eos_token_id=tok.eos_token_id))
    _drain(eng, [h0, h1, h2])
    assert [h0.tokens, h1.tokens, h2.tokens] == expected


def test_slot_reuse_many_requests(tiny_model):
    """More requests than slots: all complete, slots recycle."""
    cfg, tok, params = tiny_model
    eng = _engine(cfg, params)
    handles = [
        eng.submit(SlotRequest(
            [tok.bos_token_id] + list(b"req %d" % i), max_new_tokens=6,
            eos_token_id=tok.eos_token_id,
        ))
        for i in range(5)
    ]
    _drain(eng, handles)
    for i, h in enumerate(handles):
        exp = _reference_greedy(
            params, cfg, tok, [tok.bos_token_id] + list(b"req %d" % i), 6
        )
        assert h.tokens == exp, i


def test_streaming_callback_order(tiny_model):
    cfg, tok, params = tiny_model
    got = []
    eng = _engine(cfg, params)
    h = eng.submit(SlotRequest(
        [tok.bos_token_id] + list(b"stream"), max_new_tokens=10,
        eos_token_id=tok.eos_token_id, on_token=got.extend,
    ))
    _drain(eng, [h])
    assert got == h.tokens


def test_mixed_sampling_rows(tiny_model):
    """A greedy row and a sampled row share a batch; the greedy row
    still reproduces the reference."""
    cfg, tok, params = tiny_model
    p_greedy = [tok.bos_token_id] + list(b"deterministic")
    expected = _reference_greedy(params, cfg, tok, p_greedy, 8)
    eng = _engine(cfg, params)
    hg = eng.submit(SlotRequest(p_greedy, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    hs = eng.submit(SlotRequest(
        [tok.bos_token_id] + list(b"sampled"), max_new_tokens=8,
        temperature=1.0, eos_token_id=tok.eos_token_id,
    ))
    _drain(eng, [hg, hs])
    assert hg.tokens == expected
    assert len(hs.tokens) <= 8


def test_chunked_prefill_long_prompt_parity(tiny_model):
    """A prompt spanning many prefill windows (P=16, prompt ~90 tokens)
    matches the one-shot generate path; decode for an already-active
    slot keeps running while the second slot is still prefilling."""
    cfg, tok, params = tiny_model
    long_prompt = [tok.bos_token_id] + list(
        b"a fairly long prompt that spans several chunked prefill "
        b"windows of the continuous engine"
    )
    short_prompt = [tok.bos_token_id] + list(b"short")
    exp_long = _reference_greedy(params, cfg, tok, long_prompt, 10)
    exp_short = _reference_greedy(params, cfg, tok, short_prompt, 10)

    eng = _engine(cfg, params, max_cache_len=256)
    h_short = eng.submit(SlotRequest(
        short_prompt, max_new_tokens=10, eos_token_id=tok.eos_token_id,
    ))
    eng.step_once()  # short becomes ready/decoding
    h_long = eng.submit(SlotRequest(
        long_prompt, max_new_tokens=10, eos_token_id=tok.eos_token_id,
    ))
    _drain(eng, [h_short, h_long])
    assert h_short.tokens == exp_short
    assert h_long.tokens == exp_long


def test_speculative_chunks_used_and_exact(tiny_model):
    """Greedy requests route through the PLD chunk (stats prove it) and
    still match the plain-engine output; an echoing prompt accepts
    multi-token drafts (spec_tokens > chunk * spec_chunks would show
    >1 token/iteration on average for strong echo)."""
    cfg, tok, params = tiny_model
    pattern = list(b"one two three four ") * 4
    prompt = [tok.bos_token_id] + pattern
    plain = _engine(cfg, params, speculative=False)
    hp = plain.submit(SlotRequest(prompt, max_new_tokens=16,
                                  eos_token_id=tok.eos_token_id))
    _drain(plain, [hp])

    spec = _engine(cfg, params)  # speculative default on
    hs = spec.submit(SlotRequest(prompt, max_new_tokens=16,
                                 eos_token_id=tok.eos_token_id))
    _drain(spec, [hs])
    assert hs.tokens == hp.tokens
    assert spec.stats["spec_chunks"] > 0
    assert spec.stats["plain_chunks"] == 0
    assert spec.stats["spec_tokens"] >= len(hs.tokens)


def test_mixed_batch_falls_back_to_plain(tiny_model):
    """A sampled row in the batch routes chunks through the plain path
    (stats), and the greedy row stays reference-exact."""
    cfg, tok, params = tiny_model
    p_greedy = [tok.bos_token_id] + list(b"fallback check")
    expected = _reference_greedy(params, cfg, tok, p_greedy, 8)
    eng = _engine(cfg, params)
    hg = eng.submit(SlotRequest(p_greedy, max_new_tokens=8,
                                eos_token_id=tok.eos_token_id))
    hs = eng.submit(SlotRequest(
        [tok.bos_token_id] + list(b"sampled row"), max_new_tokens=8,
        temperature=0.8, eos_token_id=tok.eos_token_id,
    ))
    _drain(eng, [hg, hs])
    assert hg.tokens == expected
    assert eng.stats["plain_chunks"] > 0


def test_video_request_parity(tiny_model):
    """A request with video features (spliced at <vid_patch> positions)
    matches the one-shot generate path."""
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

    eng = _engine(cfg, params, max_cache_len=512, prompt_pad=64)
    h = eng.submit(SlotRequest(
        ids, max_new_tokens=8, eos_token_id=tok.eos_token_id,
        video_features=feats,
    ))
    _drain(eng, [h])
    assert h.tokens == exp


def test_priority_admission_order(tiny_model):
    """With one slot busy and several pending, the high-priority
    request admits before earlier low-priority arrivals."""
    cfg, tok, params = tiny_model
    eng = _engine(cfg, params, num_slots=1)
    mk = lambda tag, prio: SlotRequest(  # noqa: E731
        [tok.bos_token_id] + list(tag), max_new_tokens=4,
        eos_token_id=tok.eos_token_id, priority=prio,
    )
    h_busy = eng.submit(mk(b"busy", 0))
    eng.step_once()  # occupy the slot
    h_low = eng.submit(mk(b"low", 0))
    h_high = eng.submit(mk(b"high", 5))
    order = []
    for h, name in ((h_busy, "busy"), (h_low, "low"), (h_high, "high")):
        h.name = name  # type: ignore[attr-defined]
    for _ in range(200):
        for h, name in ((h_busy, "busy"), (h_low, "low"), (h_high, "high")):
            if h.done and name not in order:
                order.append(name)
        if len(order) == 3:
            break
        eng.step_once()
    assert order == ["busy", "high", "low"]


def test_seeded_sampling_replays_across_batches(tiny_model):
    """A seeded sampled request produces the same tokens whether it
    runs alone or alongside another request (per-slot PRNG chains)."""
    cfg, tok, params = tiny_model
    prompt = [tok.bos_token_id] + list(b"seeded run")

    def run(with_neighbor):
        eng = _engine(cfg, params)
        hs = eng.submit(SlotRequest(
            prompt, max_new_tokens=10, temperature=0.9,
            eos_token_id=tok.eos_token_id, seed=42,
        ))
        handles = [hs]
        if with_neighbor:
            handles.append(eng.submit(SlotRequest(
                [tok.bos_token_id] + list(b"other"), max_new_tokens=10,
                eos_token_id=tok.eos_token_id,
            )))
        _drain(eng, handles)
        return hs.tokens

    assert run(False) == run(True)


def test_background_thread(tiny_model):
    cfg, tok, params = tiny_model
    eng = _engine(cfg, params)
    eng.start()
    try:
        handles = [
            eng.submit(SlotRequest(
                [tok.bos_token_id] + list(b"bg %d" % i), max_new_tokens=5,
                eos_token_id=tok.eos_token_id,
            ))
            for i in range(3)
        ]
        for h in handles:
            h.result(timeout=120)
    finally:
        eng.stop()
    for i, h in enumerate(handles):
        exp = _reference_greedy(
            params, cfg, tok, [tok.bos_token_id] + list(b"bg %d" % i), 5
        )
        assert h.tokens == exp


def test_on_token_exception_cancels_only_that_request(tiny_model):
    """A streaming callback that raises (client hung up mid-SSE) must
    cancel its own request, not kill the scheduler for everyone."""
    cfg, tok, params = tiny_model

    def boom(_chunk):
        raise BrokenPipeError("client went away")

    eng = _engine(cfg, params)
    bad = eng.submit(SlotRequest(
        [tok.bos_token_id] + list(b"stream me"), max_new_tokens=10,
        eos_token_id=tok.eos_token_id, on_token=boom,
    ))
    good_ids = [tok.bos_token_id] + list(b"fine")
    good = eng.submit(SlotRequest(
        good_ids, max_new_tokens=6, eos_token_id=tok.eos_token_id,
    ))
    _drain(eng, [bad, good])
    assert bad.done
    assert good.tokens == _reference_greedy(params, cfg, tok, good_ids, 6)


def test_generation_reaches_max_new_near_cache_cap(tiny_model):
    """The admission budget reserves the within-chunk write overshoot,
    so a prompt trimmed to the budget still generates its full
    max_new_tokens with no end-of-row write clamping."""
    cfg, tok, params = tiny_model
    eng = _engine(cfg, params, max_cache_len=64, num_slots=1)
    budget = 64 - eng.reserve - 1
    long_ids = [tok.bos_token_id] + list(b"p" * 80)  # forces trimming
    h = eng.submit(SlotRequest(long_ids, max_new_tokens=8,
                               eos_token_id=tok.eos_token_id))
    _drain(eng, [h])
    trimmed = long_ids[-(budget - 8):]
    exp = _reference_greedy(params, cfg, tok, trimmed, 8)
    assert h.tokens == exp
    assert len(h.tokens) == 8  # not cut short by the exhaustion check

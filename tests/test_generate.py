"""Generation engine: determinism, stop handling, keyword stopping,
and the end-to-end tiny inference flow."""

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
from video_llava_tpu.models import video_llava
from video_llava_tpu.runtime.inference import InferenceEngine
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
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, tok, params


def _gen_cfg(tok, **kw):
    base = dict(
        max_new_tokens=8,
        do_sample=False,
        eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id,
    )
    base.update(kw)
    return GenerationConfig(**base)


def test_greedy_deterministic(tiny_model):
    cfg, tok, params = tiny_model
    ids = np.array([[tok.bos_token_id] + list(b"hello world")], np.int32)
    lens = jnp.asarray([ids.shape[1]], jnp.int32)
    g = _gen_cfg(tok)
    r1 = gen_mod.generate(
        params, cfg, g, jnp.asarray(ids), lens, None,
        jax.random.PRNGKey(1), cache_dtype=jnp.float32,
    )
    r2 = gen_mod.generate(
        params, cfg, g, jnp.asarray(ids), lens, None,
        jax.random.PRNGKey(2), cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    assert r1.tokens.shape == (1, 8)


def test_sampling_respects_rng(tiny_model):
    cfg, tok, params = tiny_model
    ids = np.array([[tok.bos_token_id, 65, 66]], np.int32)
    lens = jnp.asarray([3], jnp.int32)
    g = _gen_cfg(tok, do_sample=True, temperature=1.0, max_new_tokens=16)
    r1 = gen_mod.generate(
        params, cfg, g, jnp.asarray(ids), lens, None,
        jax.random.PRNGKey(1), cache_dtype=jnp.float32,
    )
    r1b = gen_mod.generate(
        params, cfg, g, jnp.asarray(ids), lens, None,
        jax.random.PRNGKey(1), cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r1b.tokens))


def test_stop_token_id_terminates():
    """A zeroed model emits argmax token 0 forever; making 0 a stop id
    must terminate generation at length 1."""
    cfg, tok = _tiny_cfg()
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = jax.tree.map(jnp.zeros_like, params)
    ids = np.array([[tok.bos_token_id, 65]], np.int32)
    g = _gen_cfg(tok, stop_token_ids=(0,), max_new_tokens=6)
    r = gen_mod.generate(
        params, cfg, g, jnp.asarray(ids), jnp.asarray([2], jnp.int32), None,
        jax.random.PRNGKey(0), cache_dtype=jnp.float32,
    )
    assert int(r.lengths[0]) == 1
    assert int(r.tokens[0, 0]) == 0
    # Everything after the stop is pad.
    assert (np.asarray(r.tokens[0, 1:]) == tok.pad_token_id).all()


def test_keyword_stop_truncates():
    """Zeroed model emits byte 0 repeatedly -> decoded '\\x00...'; the
    keyword '\\x00\\x00' must stop generation after the first chunk and
    strip the text."""
    cfg, tok = _tiny_cfg()
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = jax.tree.map(jnp.zeros_like, params)
    ids = np.array([[tok.bos_token_id, 65]], np.int32)
    g = _gen_cfg(tok, max_new_tokens=32)
    text, res = gen_mod.generate_with_keywords(
        params, cfg, g, jnp.asarray(ids), jnp.asarray([2], jnp.int32), None,
        jax.random.PRNGKey(0),
        decode_fn=lambda t: tok.decode(t),
        keywords=("\x00\x00",),
        keyword_check_every=4,
        cache_dtype=jnp.float32,
    )
    assert text == ""
    assert int(res.lengths[0]) <= 4


def test_inference_engine_end_to_end(tiny_model):
    cfg, tok, params = tiny_model
    engine = InferenceEngine(
        params=params,
        cfg=cfg,
        tokenizer=tok,
        gen=GenerationConfig(max_new_tokens=8, do_sample=False),
        seq_pad_multiple=64,
        cache_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(4, 56, 56, 3), dtype=np.uint8)
    out = engine.infer(frames, "What is happening?", conv_mode="pg-video-llava")
    assert isinstance(out, str)


def test_decode_step_jit_donates_cache(tiny_model):
    """decode_step_jit must DONATE the cache: without donation XLA
    defensively copies the whole KV cache every step (profiled at
    1.03 ms of the 7.8 ms int4 7B step on chip). Donation shows up as
    the input buffers being deleted after the call."""
    cfg, tok, params = tiny_model
    ids = np.full((1, 16), 7, np.int64)
    ids[0, 0] = tok.vid_start_token_id
    ids[0, 1:13] = tok.vid_patch_token_id
    ids[0, 13] = tok.vid_end_token_id
    feats = jnp.zeros(
        (1, cfg.video_token_len, cfg.vision.hidden_size), jnp.float32
    )
    pre = gen_mod.prefill_jit(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray([16], jnp.int32), feats,
        max_cache_len=32, cache_dtype=jnp.float32,
    )
    cache = pre.cache
    tok0 = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)
    k_buf = cache.k
    _, cache2 = gen_mod.decode_step_jit(params["llm"], cfg.llm, tok0, cache)
    assert k_buf.is_deleted(), (
        "decode_step_jit no longer donates the cache — the defensive "
        "per-step cache copy is back (see engine/generate.py)"
    )
    assert not cache2.k.is_deleted()

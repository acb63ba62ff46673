"""LLaMA decoder parity vs HF LlamaForCausalLM (torch CPU, random
weights), plus KV-cache decode consistency."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import transformers

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.engine.weights import convert_llama
from video_llava_tpu.models import llama
from video_llava_tpu.models.llama import KVCache


@pytest.fixture(scope="module")
def llama_pair():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=172,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=172,
        num_layers=3,
        num_heads=4,
        num_kv_heads=4,
        head_dim=16,
        max_position_embeddings=256,
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_llama(sd, cfg, dtype=jnp.float32)
    return model, cfg, params


def test_logits_match_hf(llama_pair):
    model, cfg, params = llama_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama.forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_cached_prefill_matches_uncached(llama_pair):
    _, cfg, params = llama_pair
    rng = np.random.default_rng(1)
    b, s = 2, 12
    ids = jnp.asarray(rng.integers(0, 128, size=(b, s)))
    plain, _ = llama.forward(params, cfg, input_ids=ids)
    cache = KVCache.create(cfg, b, 32, dtype=jnp.float32)
    cached, new_cache = llama.forward(
        params, cfg, input_ids=ids, cache=cache,
        new_length=jnp.full((b,), s, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=1e-5, atol=1e-5
    )
    assert int(new_cache.length[0]) == s


def test_decode_steps_match_full_forward(llama_pair):
    """Greedy decode via per-token decode_step must reproduce the
    argmax chain of full forwards."""
    _, cfg, params = llama_pair
    rng = np.random.default_rng(2)
    b, s, steps = 1, 8, 5
    prompt = rng.integers(0, 128, size=(b, s))

    # Full-forward greedy chain.
    want_tokens = []
    ids = prompt.copy()
    for _ in range(steps):
        logits, _ = llama.forward(params, cfg, input_ids=jnp.asarray(ids))
        nxt = int(jnp.argmax(logits[0, -1]))
        want_tokens.append(nxt)
        ids = np.concatenate([ids, [[nxt]]], axis=1)

    # Cached prefill + decode steps.
    cache = KVCache.create(cfg, b, 32, dtype=jnp.float32)
    logits, cache = llama.forward(
        params, cfg, input_ids=jnp.asarray(prompt), cache=cache,
        new_length=jnp.full((b,), s, jnp.int32),
    )
    got_tokens = []
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    for _ in range(steps):
        got_tokens.append(int(tok[0]))
        step_logits, cache = llama.decode_step(params, cfg, tok, cache)
        tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)

    assert got_tokens == want_tokens


def test_ragged_batch_prefill(llama_pair):
    """Right-padded rows must produce the same logits at their last real
    position as an unpadded forward."""
    _, cfg, params = llama_pair
    rng = np.random.default_rng(3)
    ids_short = rng.integers(0, 128, size=(1, 5))
    ids = np.zeros((1, 9), np.int64)
    ids[0, :5] = ids_short
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = llama.forward(
        params, cfg, input_ids=jnp.asarray(ids), cache=cache,
        new_length=jnp.asarray([5], jnp.int32),
    )
    plain, _ = llama.forward(params, cfg, input_ids=jnp.asarray(ids_short))
    np.testing.assert_allclose(
        np.asarray(logits[0, 4]), np.asarray(plain[0, 4]), rtol=1e-5, atol=1e-5
    )

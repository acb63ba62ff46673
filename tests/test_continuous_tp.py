"""Continuous batching under a TP mesh (engine/continuous.py mesh
support): greedy decode through a (1, 8) 'model'-sharded mesh must
match the unsharded engine token for token on the virtual CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.engine.continuous import ContinuousEngine, SlotRequest
from video_llava_tpu.models import video_llava
from video_llava_tpu.parallel import (
    make_mesh,
    shard_params,
    videollava_param_specs,
)
from video_llava_tpu.runtime.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def tiny_tp():
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=dataclasses.replace(
            LlamaConfig.tiny(vocab_size=512), num_layers=2,
            hidden_size=64, intermediate_size=128, num_heads=8,
            num_kv_heads=8, head_dim=8,
        ),
        vid_patch_token_id=tok.vid_patch_token_id,
        vid_start_token_id=tok.vid_start_token_id,
        vid_end_token_id=tok.vid_end_token_id,
    )
    params = video_llava.init_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32
    )
    return cfg, tok, params


def _run(eng, tok, prompts, max_new=10):
    handles = [
        eng.submit(SlotRequest(
            p, max_new_tokens=max_new, eos_token_id=tok.eos_token_id,
        ))
        for p in prompts
    ]
    for _ in range(200):
        if all(h.done for h in handles):
            break
        eng.step_once()
    assert all(h.done for h in handles)
    return [h.tokens for h in handles]


def test_tp_continuous_matches_unsharded(tiny_tp):
    cfg, tok, params = tiny_tp
    prompts = [
        [tok.bos_token_id] + list(b"alpha"),
        [tok.bos_token_id] + list(b"beta longer prompt"),
        [tok.bos_token_id] + list(b"gamma"),
    ]
    ref = _run(
        ContinuousEngine(
            params, cfg, num_slots=2, max_cache_len=128,
            cache_dtype=jnp.float32, chunk=4, prompt_pad=16,
        ),
        tok, prompts,
    )

    mesh = make_mesh(1, 8)
    sharded = shard_params(params, videollava_param_specs(params), mesh)
    out = _run(
        ContinuousEngine(
            sharded, cfg, num_slots=2, max_cache_len=128,
            cache_dtype=jnp.float32, chunk=4, prompt_pad=16, mesh=mesh,
        ),
        tok, prompts,
    )
    assert out == ref


def test_tp_paged_matches_unsharded(tiny_tp):
    """Paged pool under the (1, 8) TP mesh (paged_cache_spec: heads
    shard, block tables replicated) stays token-for-token equal to the
    unsharded paged engine."""
    cfg, tok, params = tiny_tp
    prompts = [
        [tok.bos_token_id] + list(b"alpha"),
        [tok.bos_token_id] + list(b"beta longer prompt"),
        [tok.bos_token_id] + list(b"gamma"),
    ]
    kw = dict(
        num_slots=2, max_cache_len=128, cache_dtype=jnp.float32,
        chunk=4, prompt_pad=16, paged=True, block_size=16,
    )
    ref = _run(ContinuousEngine(params, cfg, **kw), tok, prompts)

    mesh = make_mesh(1, 8)
    sharded = shard_params(params, videollava_param_specs(params), mesh)
    out = _run(
        ContinuousEngine(sharded, cfg, mesh=mesh, **kw), tok, prompts
    )
    assert out == ref


def test_tp_prefix_cache_matches_unsharded(tiny_tp):
    """Prefix caching under the TP mesh: host-side table edits
    (at[].set) interleave with mesh-pinned device programs and the
    skip path stays token-for-token exact."""
    cfg, tok, params = tiny_tp
    pre = list(b"a shared preamble of useful length ")
    prompts = [
        [tok.bos_token_id] + pre + list(b"q1"),
        [tok.bos_token_id] + pre + list(b"q2"),
        [tok.bos_token_id] + pre + list(b"q3 somewhat longer"),
    ]
    kw = dict(
        num_slots=2, max_cache_len=128, cache_dtype=jnp.float32,
        chunk=4, prompt_pad=16, paged=True, block_size=16,
        prefix_cache=True,
    )
    ref = _run(ContinuousEngine(params, cfg, **kw), tok, prompts)

    mesh = make_mesh(1, 8)
    sharded = shard_params(params, videollava_param_specs(params), mesh)
    eng = ContinuousEngine(sharded, cfg, mesh=mesh, **kw)
    out = _run(eng, tok, prompts)
    assert out == ref
    assert eng.stats["prefix_hit_tokens"] > 0

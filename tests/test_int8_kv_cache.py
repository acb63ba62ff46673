"""int8 KV cache: prefill+decode consistency vs the fp32 cache."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.models import llama
from video_llava_tpu.models.llama import KVCache


def _setup():
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 12)))
    return cfg, params, ids


def test_int8_cache_close_to_fp32():
    cfg, params, ids = _setup()
    lens = jnp.full((2,), 12, jnp.int32)

    c32 = KVCache.create(cfg, 2, 32, jnp.float32)
    l32, c32 = llama.forward(params, cfg, input_ids=ids, cache=c32,
                             new_length=lens)
    c8 = KVCache.create(cfg, 2, 32, jnp.int8)
    assert c8.k.dtype == jnp.int8 and c8.k_scale is not None
    l8, c8 = llama.forward(params, cfg, input_ids=ids, cache=c8,
                           new_length=lens)

    a = np.asarray(l32)[..., :]
    b = np.asarray(l8)[..., :]
    cos = (a.ravel() @ b.ravel()) / (
        np.linalg.norm(a) * np.linalg.norm(b)
    )
    assert cos > 0.999, cos

    # greedy continuation agrees for a few steps
    t32 = jnp.argmax(l32[:, -1], -1).astype(jnp.int32)
    t8 = jnp.argmax(l8[:, -1], -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(t32), np.asarray(t8))
    agree = 0
    for _ in range(5):
        s32, c32 = llama.decode_step(params, cfg, t32, c32)
        s8, c8 = llama.decode_step(params, cfg, t8, c8)
        n32 = jnp.argmax(s32, -1).astype(jnp.int32)
        n8 = jnp.argmax(s8, -1).astype(jnp.int32)
        agree += int((np.asarray(n32) == np.asarray(n8)).all())
        t32, t8 = n32, n8
    assert agree >= 4, agree


def test_int8_cache_generation_engine():
    import dataclasses

    from video_llava_tpu.config import GenerationConfig, VideoLLaVAConfig
    from video_llava_tpu.engine import generate as gen_mod
    from video_llava_tpu.models import video_llava

    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=LlamaConfig.tiny(vocab_size=512),
        vid_patch_token_id=259, vid_start_token_id=260, vid_end_token_id=261,
    )
    params = video_llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = np.array([[257] + list(b"hello")], np.int32)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=258, pad_token_id=256)
    r32 = gen_mod.generate(
        params, cfg, gen, jnp.asarray(ids), jnp.asarray([6], jnp.int32),
        None, jax.random.PRNGKey(0), cache_dtype=jnp.float32,
    )
    r8 = gen_mod.generate(
        params, cfg, gen, jnp.asarray(ids), jnp.asarray([6], jnp.int32),
        None, jax.random.PRNGKey(0), cache_dtype=jnp.int8,
    )
    assert r8.tokens.shape == r32.tokens.shape
    # random tiny model: greedy chains mostly agree under int8 cache
    agree = (np.asarray(r8.tokens) == np.asarray(r32.tokens)).mean()
    assert agree >= 0.5, agree

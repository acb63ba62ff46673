"""Gradient accumulation (train/train_step.py grad_accum): the
token-weighted microbatch scan must reproduce the full-batch update —
exactly the property HF's equal-weight averaging loses when sequence
lengths vary across microbatches."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.constants import IGNORE_INDEX
from video_llava_tpu.models import video_llava
from video_llava_tpu.train.train_step import (
    init_train_state,
    make_train_step,
    trainable_mask,
)


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        VideoLLaVAConfig.tiny(),
        llm=dataclasses.replace(
            LlamaConfig.tiny(vocab_size=512), num_layers=2, hidden_size=64,
            intermediate_size=128, num_heads=4, num_kv_heads=4, head_dim=16,
        ),
    )
    params = video_llava.init_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    b, s = 8, 48
    ids = rng.integers(3, 500, size=(b, s)).astype(np.int32)
    labels = ids.copy()
    # Variable-length targets per row: rows mask different prefix
    # lengths, so microbatch token counts DIFFER (the case that breaks
    # equal-weight averaging).
    for i in range(b):
        labels[i, : 5 + 3 * i] = IGNORE_INDEX
    feats = rng.standard_normal(
        (b, cfg.video_token_len, cfg.vision.hidden_size)
    ).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "video_features": jnp.asarray(feats),
    }
    return cfg, params, batch


@pytest.mark.parametrize("tune_mode", ["projector", None])
def test_accum_matches_full_batch(setup, tune_mode):
    cfg, params, batch = setup
    tx = optax.sgd(1e-2)  # stateless-ish: updates proportional to grads
    mask = None if tune_mode is None else trainable_mask(params, tune_mode)

    s1 = init_train_state(params, tx, mask)
    full_fn = make_train_step(cfg, tx, mask=mask, donate=False)
    s1, m1 = full_fn(s1, batch)

    s2 = init_train_state(params, tx, mask)
    accum_fn = make_train_step(
        cfg, tx, mask=mask, donate=False, grad_accum=4
    )
    s2, m2 = accum_fn(s2, batch)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    for a, b_ in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-6, rtol=2e-5
        )

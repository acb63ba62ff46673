"""VideoLLaVA composite model: vectorized splice parity vs the
reference's per-sample loop semantics (video_chatgpt/model/
video_chatgpt.py:110-168), loss masking, end-to-end tiny forward."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import VideoLLaVAConfig
from video_llava_tpu.constants import IGNORE_INDEX
from video_llava_tpu.models import video_llava
from video_llava_tpu.models.layers import embed
from video_llava_tpu.models.video_llava import (
    shifted_cross_entropy,
    splice_video_embeddings,
)


def _loop_splice(token_embeds, input_ids, video_features, patch_id):
    """Reference-semantics per-sample loop (numpy oracle)."""
    out = np.array(token_embeds, copy=True)
    for b in range(input_ids.shape[0]):
        pos = np.nonzero(input_ids[b] == patch_id)[0]
        if len(pos) == 0:
            continue
        assert len(pos) == video_features.shape[1]
        start = pos[0]
        assert (pos == np.arange(start, start + len(pos))).all()
        out[b, start : start + len(pos)] = video_features[b]
    return out


def test_splice_matches_loop_oracle():
    rng = np.random.default_rng(0)
    b, s, n, d = 3, 20, 6, 8
    patch_id = 99
    ids = rng.integers(0, 50, size=(b, s))
    # row 0: video block at position 2; row 1: at end; row 2: no video
    ids[0, 2 : 2 + n] = patch_id
    ids[1, s - n :] = patch_id
    embeds = rng.normal(size=(b, s, d)).astype(np.float32)
    vids = rng.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(
        splice_video_embeddings(
            jnp.asarray(embeds), jnp.asarray(ids), jnp.asarray(vids), patch_id
        )
    )
    want = _loop_splice(embeds, ids, vids, patch_id)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_loss_masking():
    rng = np.random.default_rng(1)
    b, s, v = 2, 6, 11
    logits = jnp.asarray(rng.normal(size=(b, s, v)).astype(np.float32))
    labels = np.full((b, s), IGNORE_INDEX, np.int32)
    labels[0, 3] = 4  # only one target token (predicted from position 2)
    loss = shifted_cross_entropy(logits, jnp.asarray(labels))
    logp = jax.nn.log_softmax(logits[0, 2])
    np.testing.assert_allclose(float(loss), float(-logp[4]), rtol=1e-6)


def test_end_to_end_tiny_forward_and_prefill():
    cfg = VideoLLaVAConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = video_llava.init_params(key, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    t = 4
    pixels = jnp.asarray(rng.normal(size=(t, 56, 56, 3)).astype(np.float32))
    feats = video_llava.encode_video(params, pixels, cfg)
    assert feats.shape == (cfg.video_token_len, cfg.vision.hidden_size)

    # Build a prompt with the video block, right-padded batch of 1.
    n = cfg.video_token_len
    prompt = [1, 5, 6, cfg.vid_start_token_id]
    prompt += [cfg.vid_patch_token_id] * n
    prompt += [cfg.vid_end_token_id, 7, 8]
    s_real = len(prompt)
    s_pad = s_real + 4
    ids = np.zeros((1, s_pad), np.int32)
    ids[0, :s_real] = prompt

    res = video_llava.prefill(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray([s_real], jnp.int32),
        feats[None],
        max_cache_len=s_pad + 8,
        cache_dtype=jnp.float32,
    )
    assert res.logits_last.shape == (1, cfg.llm.vocab_size)
    assert int(res.cache.length[0]) == s_real

    # Training-style forward with labels.
    labels = np.full((1, s_pad), IGNORE_INDEX, np.int32)
    labels[0, s_real - 2 : s_real] = [7, 8]
    logits, loss, _ = video_llava.forward(
        params, cfg, jnp.asarray(ids), feats[None], labels=jnp.asarray(labels)
    )
    assert logits.shape == (1, s_pad, cfg.llm.vocab_size)
    assert np.isfinite(float(loss))

    # Projector gradient exists and is finite when video tokens present.
    def loss_fn(p):
        _, l, _ = video_llava.forward(
            p, cfg, jnp.asarray(ids), feats[None], labels=jnp.asarray(labels)
        )
        return l

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(
        sum(jnp.sum(x**2) for x in jax.tree.leaves(grads["projector"]))
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0

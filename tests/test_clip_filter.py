"""CLIP zero-shot crop filter: mechanics with tiny towers and a
byte-level tokenizer; thresholds behave like the reference
(prob > 0.1 AND score >= 0.2)."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.grounding.clip_filter import ClipCropFilter
from video_llava_tpu.models import clip as clip_mod


def _build_filter(prob_threshold=0.0, score_threshold=-1.0):
    vcfg = CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16,
    )
    tcfg = CLIPTextConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, projection_dim=16,
    )
    vparams = clip_mod.init_vision_params(jax.random.PRNGKey(0), vcfg)
    tparams = clip_mod.init_text_params(jax.random.PRNGKey(1), tcfg)
    vproj = {
        "kernel": jnp.asarray(
            np.random.default_rng(2).normal(size=(32, 16)).astype(np.float32)
        )
    }
    tokenize = lambda s: [1] + [2 + (ord(c) % 250) for c in s[:20]] + [299]
    return ClipCropFilter(
        vparams, vcfg, tparams, tcfg, tokenize, vproj,
        prob_threshold=prob_threshold, score_threshold=score_threshold,
    )


def test_zeroshot_weights_cached_and_normalized():
    f = _build_filter()
    w = f.zeroshot_weights(["cat", "dog"])
    assert w.shape == (16, 2)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(w, axis=0)), 1.0, rtol=1e-5
    )
    assert f.zeroshot_weights(["cat", "dog"]) is w  # cache hit


def test_filter_keep_mask_shapes_and_thresholds():
    f = _build_filter(prob_threshold=0.0, score_threshold=-1.0)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    boxes = np.array(
        [[5, 5, 40, 40], [50, 30, 95, 75], [0, 0, 10, 10]], np.float32
    )
    keep = f(image, boxes, np.array([0, 1, 0]), ["cat", "dog"])
    assert keep.shape == (3,)
    assert keep.all()  # permissive thresholds keep everything
    # impossible threshold drops everything
    f2 = _build_filter(prob_threshold=1.1, score_threshold=2.0)
    keep2 = f2(image, boxes, np.array([0, 1, 0]), ["cat", "dog"])
    assert not keep2.any()
    assert f(image, np.zeros((0, 4), np.float32), np.zeros((0,), int),
             ["cat"]).shape == (0,)

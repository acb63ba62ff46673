"""CLIP vision tower parity vs HF CLIPVisionModel (torch CPU, random
weights): the exact reference feature path hidden_states[-2][:, 1:]
(video_chatgpt/inference.py:92-94)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import transformers

from video_llava_tpu.config import CLIPVisionConfig
from video_llava_tpu.engine.weights import convert_clip_vision
from video_llava_tpu.models.clip import (
    vision_penultimate_patches,
    vision_pooled_embedding,
)
from video_llava_tpu.ops.pooling import spatio_temporal_pool


def _tiny_hf_clip():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        intermediate_size=256,
        num_layers=3,
        num_heads=4,
        projection_dim=32,
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd, cfg, dtype=jnp.float32)
    return model, cfg, params


@pytest.fixture(scope="module")
def clip_pair():
    return _tiny_hf_clip()


def test_penultimate_patches_match(clip_pair):
    model, cfg, params = clip_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2),
            output_hidden_states=True,
        )
    want = out.hidden_states[-2][:, 1:].numpy()
    got = np.asarray(vision_penultimate_patches(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pooler_output_matches(clip_pair):
    model, cfg, params = clip_pair
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pixels).permute(0, 3, 1, 2))
    want = out.pooler_output.numpy()
    got = np.asarray(vision_pooled_embedding(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_feature_path_matches_reference_composition(clip_pair):
    """encode frames -> penultimate patches -> spatio-temporal pooling,
    vs the same composition done in torch (the reference extractor,
    scripts/save_spatio_temporal_clip_features.py:110-121)."""
    model, cfg, params = clip_pair
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(5, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2),
            output_hidden_states=True,
        )
        feats = out.hidden_states[-2][:, 1:]  # (t, s, c)
        t, s, c = feats.shape
        temporal = feats.mean(dim=1)
        temporal = torch.cat([temporal, torch.zeros(100 - t, c)], dim=0)
        spatial = feats.mean(dim=0)
        want = torch.cat([temporal, spatial], dim=0).numpy()
    got_feats = vision_penultimate_patches(params, jnp.asarray(pixels), cfg)
    got = np.asarray(spatio_temporal_pool(got_feats, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

"""Offline tooling: instruction converter, weight delta round trip,
feature extraction resume semantics."""

import json
import os

import numpy as np

from video_llava_tpu.scripts.convert_instruction_data import convert_entries
from video_llava_tpu.scripts.weight_tools import apply_delta, make_delta


def test_convert_entries_parity():
    entries = [
        {"video_id": "a", "q": "What?", "a": "Something."},
        {"video_id": "b", "q": "Who?", "a": "Someone."},
    ]
    out = convert_entries(entries)
    # even index: question first; odd index: <video> first
    assert out[0]["conversations"][0]["value"] == "What?\n<video>"
    assert out[1]["conversations"][0]["value"] == "<video>\nWho?"
    assert out[0]["video"] == "a.pkl"
    assert out[0]["conversations"][1] == {"from": "gpt", "value": "Something."}


def test_convert_entries_filter():
    entries = [
        {"video_id": "a", "q": "Q", "a": "A"},
        {"video_id": "missing", "q": "Q", "a": "A"},
    ]
    out = convert_entries(entries, available_ids={"a"})
    assert [o["id"] for o in out] == ["a"]


def test_delta_roundtrip():
    rng = np.random.default_rng(0)
    base = {
        "model.layers.0.w": rng.normal(size=(4, 4)).astype(np.float32),
        "model.embed_tokens.weight": rng.normal(size=(10, 4)).astype(np.float32),
    }
    target = {
        "model.layers.0.w": rng.normal(size=(4, 4)).astype(np.float32),
        # resized embeddings (vocab grew 10 -> 12)
        "model.embed_tokens.weight": rng.normal(size=(12, 4)).astype(np.float32),
        "model.mm_projector.weight": rng.normal(size=(4, 4)).astype(np.float32),
    }
    delta = make_delta(base, {k: v.copy() for k, v in target.items()})
    back = apply_delta(base, delta)
    for k in target:
        np.testing.assert_allclose(back[k], target[k], rtol=1e-6, atol=1e-6)


def test_feature_extraction_tiny(tmp_path):
    """save_features main loop on synthetic videos with a tiny CLIP."""
    import jax.numpy as jnp

    from video_llava_tpu.media.loader import encode_video
    from video_llava_tpu.scripts import save_features as sf

    vdir = tmp_path / "vids"
    fdir = tmp_path / "feats"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for name in ["v1", "v2"]:
        encode_video(
            str(vdir / f"{name}.mp4"),
            rng.integers(0, 255, size=(6, 64, 64, 3), dtype=np.uint8),
            fps=3,
            codec="mpeg4",
        )

    # monkeypatch a small extractor config
    import video_llava_tpu.config as cfgmod

    orig = sf.build_extractor

    def tiny_extractor(clip_path=None, image_size=56, dtype=jnp.float32):
        import dataclasses
        import jax
        from video_llava_tpu.models import clip as clip_mod
        from video_llava_tpu.ops.image import normalize_clip
        from video_llava_tpu.ops.pooling import spatio_temporal_pool

        cfg = cfgmod.CLIPVisionConfig(
            image_size=56, patch_size=14, hidden_size=32,
            intermediate_size=64, num_layers=2, num_heads=2,
        )
        params = clip_mod.init_vision_params(jax.random.PRNGKey(0), cfg, dtype)

        @jax.jit
        def extract(params, frames, n):
            pixels = normalize_clip(frames, dtype=dtype)
            feats = clip_mod.vision_penultimate_patches(params, pixels, cfg)
            return spatio_temporal_pool(feats, num_valid_frames=n,
                                        out_dtype=jnp.float32)

        return cfg, params, extract

    sf.build_extractor = tiny_extractor
    try:
        sf.main(
            [
                "--video_dir_path", str(vdir),
                "--clip_feat_path", str(fdir),
                "--image_size", "56",
                "--num_frames", "8",
            ]
        )
    finally:
        sf.build_extractor = orig
    import pickle

    files = sorted(os.listdir(fdir))
    assert files == ["v1.pkl", "v2.pkl"]
    with open(fdir / "v1.pkl", "rb") as f:
        feats = pickle.load(f)
    assert feats.shape == (100 + 16, 32)

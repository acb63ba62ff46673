"""RAM tag-decoder architecture: shapes, batching, tagger integration."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.grounding.tagging import TaggingModule
from video_llava_tpu.models import ram, swin
from video_llava_tpu.models.ram import RamConfig
from video_llava_tpu.models.swin import SwinConfig


def _setup():
    swin_cfg = SwinConfig.tiny_test()
    ram_cfg = RamConfig(num_tags=12, hidden_size=32, num_heads=4,
                        decoder_layers=2)
    backbone = swin.init_params(jax.random.PRNGKey(0), swin_cfg)
    params = ram.init_params(
        jax.random.PRNGKey(1), ram_cfg, swin_cfg.num_features
    )
    return swin_cfg, ram_cfg, backbone, params


def test_tag_logits_shape_and_batch_consistency():
    swin_cfg, ram_cfg, backbone, params = _setup()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 64, 64, 3)).astype(np.float32))
    logits = ram.tag_logits(backbone, params, x, swin_cfg, ram_cfg)
    assert logits.shape == (3, 12)
    # per-frame independence: single-frame forward matches batch row
    one = ram.tag_logits(backbone, params, x[1:2], swin_cfg, ram_cfg)
    np.testing.assert_allclose(
        np.asarray(one[0]), np.asarray(logits[1]), rtol=1e-4, atol=1e-5
    )


def test_tagging_module_with_ram_decoder():
    swin_cfg, ram_cfg, backbone, params = _setup()
    tm = TaggingModule.with_ram_decoder(
        backbone, params, swin_cfg, ram_cfg,
        tag_list=[f"t{i}" for i in range(12)], threshold=0.4,
    )
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    per_frame = tm.run_on_frames(frames)
    assert len(per_frame) == 2
    assert all(isinstance(t, str) for tags in per_frame for t in tags)


def _synthetic_ram_state_dict(swin_cfg, ram_cfg, rng, with_self_attn=True):
    """Released-RAM key schema (timm swin + q2l head) with tiny shapes."""
    sd = {}
    d, ff = ram_cfg.hidden_size, ram_cfg.intermediate_size
    nf = swin_cfg.num_features

    # --- timm-style visual encoder
    p = swin_cfg.patch_size
    sd["visual_encoder.patch_embed.proj.weight"] = rng.normal(
        size=(swin_cfg.embed_dim, 3, p, p)).astype(np.float32)
    sd["visual_encoder.patch_embed.proj.bias"] = np.zeros(
        swin_cfg.embed_dim, np.float32)
    sd["visual_encoder.patch_embed.norm.weight"] = np.ones(
        swin_cfg.embed_dim, np.float32)
    sd["visual_encoder.patch_embed.norm.bias"] = np.zeros(
        swin_cfg.embed_dim, np.float32)
    dim = swin_cfg.embed_dim
    num_rel = (2 * swin_cfg.window_size - 1) ** 2
    for s in range(swin_cfg.num_stages):
        for i in range(swin_cfg.depths[s]):
            pre = f"visual_encoder.layers.{s}.blocks.{i}"
            for n, shp in [("norm1", dim), ("norm2", dim)]:
                sd[f"{pre}.{n}.weight"] = np.ones(shp, np.float32)
                sd[f"{pre}.{n}.bias"] = np.zeros(shp, np.float32)
            sd[f"{pre}.attn.qkv.weight"] = rng.normal(
                size=(3 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{pre}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{pre}.attn.proj.weight"] = rng.normal(
                size=(dim, dim)).astype(np.float32) * 0.02
            sd[f"{pre}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{pre}.attn.relative_position_bias_table"] = rng.normal(
                size=(num_rel, swin_cfg.num_heads[s])).astype(np.float32)
            hidden = int(dim * swin_cfg.mlp_ratio)
            sd[f"{pre}.mlp.fc1.weight"] = rng.normal(
                size=(hidden, dim)).astype(np.float32) * 0.02
            sd[f"{pre}.mlp.fc1.bias"] = np.zeros(hidden, np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = rng.normal(
                size=(dim, hidden)).astype(np.float32) * 0.02
            sd[f"{pre}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if s < swin_cfg.num_stages - 1:
            pre = f"visual_encoder.layers.{s}.downsample"
            sd[f"{pre}.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"{pre}.norm.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{pre}.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32) * 0.02
            dim *= 2
    sd["visual_encoder.norm.weight"] = np.ones(nf, np.float32)
    sd["visual_encoder.norm.bias"] = np.zeros(nf, np.float32)

    # --- label embeddings + folded projection
    sd["label_embed"] = rng.normal(
        size=(ram_cfg.num_tags, d)).astype(np.float32)
    sd["wordvec_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32) * 0.1
    sd["wordvec_proj.bias"] = rng.normal(size=(d,)).astype(np.float32) * 0.1
    sd["image_proj.weight"] = rng.normal(size=(d, nf)).astype(np.float32) * 0.02
    sd["image_proj.bias"] = np.zeros(d, np.float32)

    # --- q2l tagging head (BertLayer form)
    for i in range(ram_cfg.decoder_layers):
        pre = f"tagging_head.encoder.layer.{i}"
        blocks = ["crossattention"] + (["attention"] if with_self_attn else [])
        for blk in blocks:
            for nm in ["query", "key", "value"]:
                sd[f"{pre}.{blk}.self.{nm}.weight"] = rng.normal(
                    size=(d, d)).astype(np.float32) * 0.02
                sd[f"{pre}.{blk}.self.{nm}.bias"] = np.zeros(d, np.float32)
            sd[f"{pre}.{blk}.output.dense.weight"] = rng.normal(
                size=(d, d)).astype(np.float32) * 0.02
            sd[f"{pre}.{blk}.output.dense.bias"] = np.zeros(d, np.float32)
            sd[f"{pre}.{blk}.output.LayerNorm.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.{blk}.output.LayerNorm.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.intermediate.dense.weight"] = rng.normal(
            size=(ff, d)).astype(np.float32) * 0.02
        sd[f"{pre}.intermediate.dense.bias"] = np.zeros(ff, np.float32)
        sd[f"{pre}.output.dense.weight"] = rng.normal(
            size=(d, ff)).astype(np.float32) * 0.02
        sd[f"{pre}.output.dense.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.output.LayerNorm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.output.LayerNorm.bias"] = np.zeros(d, np.float32)

    sd["fc.weight"] = rng.normal(size=(1, d)).astype(np.float32) * 0.02
    sd["fc.bias"] = np.zeros(1, np.float32)
    sd["class_threshold"] = np.full(ram_cfg.num_tags, 0.68, np.float32)
    return sd


def test_convert_ram_checkpoint():
    swin_cfg = SwinConfig.tiny_test()
    ram_cfg = RamConfig(num_tags=12, hidden_size=32, num_heads=4,
                        decoder_layers=2, intermediate_size=64)
    rng = np.random.default_rng(0)
    sd = _synthetic_ram_state_dict(swin_cfg, ram_cfg, rng)

    backbone, params, thresholds = ram.convert_ram_checkpoint(
        sd, swin_cfg, ram_cfg
    )
    assert len(params["layers"]) == 2
    assert all("self" in lp for lp in params["layers"])
    assert thresholds.shape == (12,) and thresholds[0] == np.float32(0.68)

    # wordvec projection folded: relu(W @ e + b)
    expect = np.maximum(
        sd["label_embed"] @ sd["wordvec_proj.weight"].T
        + sd["wordvec_proj.bias"], 0.0,
    )
    np.testing.assert_allclose(
        np.asarray(params["label_embeddings"]), expect, rtol=1e-5
    )

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    logits = ram.tag_logits(backbone, params, x, swin_cfg, ram_cfg)
    assert logits.shape == (2, 12)
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_ram_checkpoint_no_self_attention():
    swin_cfg = SwinConfig.tiny_test()
    ram_cfg = RamConfig(num_tags=6, hidden_size=32, num_heads=4,
                        decoder_layers=1, intermediate_size=64)
    rng = np.random.default_rng(1)
    sd = _synthetic_ram_state_dict(swin_cfg, ram_cfg, rng,
                                   with_self_attn=False)
    # "module."-prefixed checkpoints (DataParallel saves) also convert
    sd = {f"module.{k}": v for k, v in sd.items()}
    backbone, params, _ = ram.convert_ram_checkpoint(sd, swin_cfg, ram_cfg)
    assert all("self" not in lp for lp in params["layers"])
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    logits = ram.tag_logits(backbone, params, x, swin_cfg, ram_cfg)
    assert logits.shape == (1, 6)


def test_tag_list_and_threshold_loaders(tmp_path):
    tags = ["person", "dog", "three word tag", "car"]
    p = tmp_path / "ram_tag_list.txt"
    p.write_text("\n".join(tags) + "\n")
    assert ram.load_tag_list(str(p)) == tags

    tp = tmp_path / "ram_tag_list_threshold.txt"
    tp.write_text("\n".join(["0.65", "0.7", "0.8", "0.68"]))
    th = ram.load_tag_thresholds(str(tp), 4)
    np.testing.assert_allclose(th, [0.65, 0.7, 0.8, 0.68])
    import pytest

    with pytest.raises(ValueError):
        ram.load_tag_thresholds(str(tp), 5)
    np.testing.assert_allclose(
        ram.load_tag_thresholds(None, 3, default=0.5), [0.5] * 3
    )


def test_per_tag_threshold_in_tagging_module():
    swin_cfg, ram_cfg, backbone, params = _setup()
    # thresholds: tag0 impossible, tag1 always fires
    th = np.full(12, 2.0, np.float32)
    th[1] = -1.0
    tm = TaggingModule.with_ram_decoder(
        backbone, params, swin_cfg, ram_cfg,
        tag_list=[f"t{i}" for i in range(12)], threshold=th,
    )
    frames = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    per_frame = tm.run_on_frames(frames)
    assert all("t1" in tags and "t0" not in tags for tags in per_frame)

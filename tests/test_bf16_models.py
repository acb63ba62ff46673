"""bf16-parameter smoke tests across the model zoo.

Real deployments load bf16 checkpoints; the test suite's parity tests
all run f32, which let a Whisper f32-mel/bf16-conv dtype mismatch slip
through. These tests run each stack's forward with bf16 params and the
natural f32/uint8 inputs of its production callers.
"""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.models import bert, clip, ram, swin
from video_llava_tpu.models.bert import BertConfig
from video_llava_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from video_llava_tpu.models.ram import RamConfig
from video_llava_tpu.models.swin import SwinConfig


def _to_bf16(params):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def test_clip_vision_bf16():
    cfg = CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=64,
        intermediate_size=128, num_layers=2, num_heads=4,
        projection_dim=32,
    )
    params = clip.init_vision_params(jax.random.PRNGKey(0), cfg,
                                     jnp.bfloat16)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 56, 56, 3)), jnp.float32
    )
    out = clip.vision_penultimate_patches(
        params, pixels.astype(jnp.bfloat16), cfg
    )
    assert out.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_clip_text_bf16():
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, max_position_embeddings=16,
        projection_dim=32,
    )
    params = clip.init_text_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    ids = jnp.asarray([[5, 7, 9, 98, 0, 0]], jnp.int32)
    out = clip.text_forward(params, ids, cfg, eot_token_id=98)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_swin_ram_tagging_bf16():
    swin_cfg = SwinConfig.tiny_test()
    ram_cfg = RamConfig(num_tags=12, hidden_size=32, num_heads=4,
                        decoder_layers=2)
    backbone = _to_bf16(swin.init_params(jax.random.PRNGKey(0), swin_cfg))
    params = _to_bf16(ram.init_params(
        jax.random.PRNGKey(1), ram_cfg, swin_cfg.num_features))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    logits = ram.tag_logits(backbone, params, x, swin_cfg, ram_cfg)
    assert logits.shape == (2, 12)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_bert_bf16():
    import torch
    import transformers

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=32)
    hf = transformers.BertModel(transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32,
    )).eval()
    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = _to_bf16(bert.convert_hf_bert(sd, cfg))
    ids = jnp.asarray([[101, 5, 6, 102, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    out = bert.forward(params, ids, mask, cfg)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(out)[0], np.float32)
    ).all()


def test_sam_bf16():
    import torch
    import transformers

    from video_llava_tpu.models import sam as sam_mod
    from video_llava_tpu.models.sam import SamConfig

    cfg = SamConfig.tiny_test()
    hf_cfg = transformers.SamConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=8,
            # match the parity fixture (tests/test_sam.py): layer 1 is
            # a GLOBAL attention layer, so the bf16 smoke covers both
            # windowed and global paths
            global_attn_indexes=[1],
            window_size=2, mlp_dim=64, output_channels=16, num_pos_feats=8,
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=64, patch_size=8,
            mask_input_channels=4,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, mlp_dim=32,
            iou_head_hidden_dim=16,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SamModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _to_bf16(sam_mod.convert_hf_sam(sd, cfg))
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[8.0, 8.0, 40.0, 48.0]]], jnp.float32)
    masks, iou = sam_mod.predict_boxes(params, pixels, boxes, cfg)
    assert masks.shape[0] == 1
    assert np.isfinite(np.asarray(masks, np.float32)).all()
    assert np.isfinite(np.asarray(iou, np.float32)).all()


def test_grounding_dino_bf16():
    import torch
    import transformers

    from video_llava_tpu.models import grounding_dino as gd
    from video_llava_tpu.models.grounding_dino import GroundingDinoConfig

    cfg = GroundingDinoConfig.tiny_test()
    hf_cfg = transformers.GroundingDinoConfig(
        d_model=cfg.d_model,
        num_queries=cfg.num_queries,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        num_feature_levels=cfg.num_feature_levels,
        max_text_len=cfg.max_text_len,
        backbone_config=transformers.SwinConfig(
            image_size=cfg.swin.image_size,
            patch_size=cfg.swin.patch_size,
            embed_dim=cfg.swin.embed_dim,
            depths=list(cfg.swin.depths),
            num_heads=list(cfg.swin.num_heads),
            window_size=cfg.swin.window_size,
            out_indices=[i + 1 for i in cfg.backbone_stage_indices],
        ),
        text_config=transformers.BertConfig(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            intermediate_size=cfg.text.intermediate_size,
            max_position_embeddings=cfg.text.max_position_embeddings,
        ),
    )
    torch.manual_seed(0)
    model = transformers.GroundingDinoForObjectDetection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _to_bf16(gd.convert_hf_grounding_dino(sd, cfg))
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32
    )
    ids = np.array([[101, 7, 8, 1012, 102]], np.int64)
    logits, boxes = gd.forward(params, cfg, pixels, ids)
    t = ids.shape[1]
    assert np.isfinite(np.asarray(logits[..., :t], np.float32)).all()
    assert np.isfinite(np.asarray(boxes, np.float32)).all()

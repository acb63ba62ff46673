"""GroundingDINO parity vs HF (random weights, tiny config): logits and
boxes of the full two-stage detector, plus the detector adapter."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import transformers

from video_llava_tpu.models import grounding_dino as gd
from video_llava_tpu.models.grounding_dino import (
    GroundingDinoConfig,
    generate_text_masks,
)


@pytest.fixture(scope="module")
def dino_pair():
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
    params = gd.convert_hf_grounding_dino(sd, cfg)
    return model, cfg, params


def test_text_masks_match_hf():
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map,
    )

    ids = np.array([[101, 7, 8, 1012, 9, 1012, 102]], np.int64)
    want_mask, want_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.from_numpy(ids)
    )
    got_mask, got_pos = generate_text_masks(ids)
    np.testing.assert_array_equal(got_mask, want_mask.numpy())
    np.testing.assert_array_equal(got_pos, want_pos.numpy())


def test_full_detector_matches_hf(dino_pair):
    model, cfg, params = dino_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    ids = np.array([[101, 7, 8, 1012, 9, 10, 1012, 102]], np.int64)
    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2),
            input_ids=torch.from_numpy(ids),
        )
        want_logits = out.logits.numpy()
        want_boxes = out.pred_boxes.numpy()
    got_logits, got_boxes = gd.forward(
        params, cfg, jnp.asarray(pixels), ids
    )
    np.testing.assert_allclose(
        np.asarray(got_boxes), want_boxes, rtol=1e-3, atol=1e-3
    )
    gl = np.asarray(got_logits)
    # compare only the real-text region (rest is -inf padding)
    t = ids.shape[1]
    np.testing.assert_allclose(gl[..., :t], want_logits[..., :t],
                               rtol=1e-3, atol=2e-3)
    assert np.isneginf(gl[..., t:]).all()


def test_detector_adapter(dino_pair):
    _, cfg, params = dino_pair
    det = gd.GroundingDinoDetector(
        params, cfg,
        tokenize=lambda s: [101] + [min(900, 5 + ord(c) % 50) for c in s[:10]]
        + [102],
        image_size=64,
        box_threshold=0.0,  # random weights: accept everything
    )
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, size=(48, 80, 3), dtype=np.uint8)
    boxes, scores, class_ids = det(image, ["cat", "dog"])
    assert boxes.shape[1] == 4
    assert len(boxes) == len(scores) == len(class_ids)
    assert (class_ids >= 0).all() and (class_ids < 2).all()
    # boxes live in image pixel space
    assert (boxes[:, 2] <= 80 + 1e-3).all() and (boxes[:, 3] <= 48 + 1e-3).all()

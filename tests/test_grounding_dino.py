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


def _hf_sd_to_original_schema(sd, cfg):
    """Rewrite an HF GroundingDino state dict into the original-repo
    key schema (groundingdino_swint_ogc.pth layout) with identical
    weight values: fuses separate q/k/v into nn.MultiheadAttention
    in_proj tensors and timm-ifies the Swin backbone keys."""
    out = {}
    m = "model."

    def fuse(dst, q, k, v, o):
        out[dst + "in_proj_weight"] = np.concatenate(
            [sd[q + "weight"], sd[k + "weight"], sd[v + "weight"]], axis=0
        )
        out[dst + "in_proj_bias"] = np.concatenate(
            [sd[q + "bias"], sd[k + "bias"], sd[v + "bias"]]
        )
        out[dst + "out_proj.weight"] = sd[o + "weight"]
        out[dst + "out_proj.bias"] = sd[o + "bias"]

    def copy(dst, src):
        out[dst + "weight"] = sd[src + "weight"]
        if src + "bias" in sd:
            out[dst + "bias"] = sd[src + "bias"]

    for i in range(cfg.encoder_layers):
        hp = f"{m}encoder.layers.{i}."
        fus, txt, dfm = (
            f"transformer.encoder.fusion_layers.{i}.",
            f"transformer.encoder.text_layers.{i}.",
            f"transformer.encoder.layers.{i}.",
        )
        copy(fus + "layer_norm_v.", hp + "fusion_layer.layer_norm_vision.")
        copy(fus + "layer_norm_l.", hp + "fusion_layer.layer_norm_text.")
        out[fus + "gamma_v"] = sd[hp + "fusion_layer.vision_param"]
        out[fus + "gamma_l"] = sd[hp + "fusion_layer.text_param"]
        for a, b in [
            ("attn.v_proj.", "fusion_layer.attn.vision_proj."),
            ("attn.l_proj.", "fusion_layer.attn.text_proj."),
            ("attn.values_v_proj.", "fusion_layer.attn.values_vision_proj."),
            ("attn.values_l_proj.", "fusion_layer.attn.values_text_proj."),
            ("attn.out_v_proj.", "fusion_layer.attn.out_vision_proj."),
            ("attn.out_l_proj.", "fusion_layer.attn.out_text_proj."),
        ]:
            copy(fus + a, hp + b)
        te = hp + "text_enhancer_layer."
        fuse(txt + "self_attn.", te + "self_attn.query.",
             te + "self_attn.key.", te + "self_attn.value.",
             te + "self_attn.out_proj.")
        copy(txt + "linear1.", te + "fc1.")
        copy(txt + "linear2.", te + "fc2.")
        copy(txt + "norm1.", te + "layer_norm_before.")
        copy(txt + "norm2.", te + "layer_norm_after.")
        dl = hp + "deformable_layer."
        for nm in ["sampling_offsets.", "attention_weights.",
                   "value_proj.", "output_proj."]:
            copy(dfm + "self_attn." + nm, dl + "self_attn." + nm)
        copy(dfm + "norm1.", dl + "self_attn_layer_norm.")
        copy(dfm + "linear1.", dl + "fc1.")
        copy(dfm + "linear2.", dl + "fc2.")
        copy(dfm + "norm2.", dl + "final_layer_norm.")

    for i in range(cfg.decoder_layers):
        hp = f"{m}decoder.layers.{i}."
        p = f"transformer.decoder.layers.{i}."
        fuse(p + "self_attn.", hp + "self_attn.query.",
             hp + "self_attn.key.", hp + "self_attn.value.",
             hp + "self_attn.out_proj.")
        copy(p + "norm2.", hp + "self_attn_layer_norm.")
        fuse(p + "ca_text.", hp + "encoder_attn_text.query.",
             hp + "encoder_attn_text.key.", hp + "encoder_attn_text.value.",
             hp + "encoder_attn_text.out_proj.")
        copy(p + "catext_norm.", hp + "encoder_attn_text_layer_norm.")
        for nm in ["sampling_offsets.", "attention_weights.",
                   "value_proj.", "output_proj."]:
            copy(p + "cross_attn." + nm, hp + "encoder_attn." + nm)
        copy(p + "norm1.", hp + "encoder_attn_layer_norm.")
        copy(p + "linear1.", hp + "fc1.")
        copy(p + "linear2.", hp + "fc2.")
        copy(p + "norm3.", hp + "final_layer_norm.")

    for i in range(cfg.num_feature_levels):
        copy(f"input_proj.{i}.0.", f"{m}input_proj_vision.{i}.0.")
        copy(f"input_proj.{i}.1.", f"{m}input_proj_vision.{i}.1.")

    # Swin backbone: HF split q/k/v -> timm fused qkv
    sw = f"{m}backbone.conv_encoder.model."
    copy("backbone.0.patch_embed.proj.",
         sw + "embeddings.patch_embeddings.projection.")
    copy("backbone.0.patch_embed.norm.", sw + "embeddings.norm.")
    for s in range(cfg.swin.num_stages):
        for b in range(cfg.swin.depths[s]):
            hb = f"{sw}encoder.layers.{s}.blocks.{b}."
            tb = f"backbone.0.layers.{s}.blocks.{b}."
            out[tb + "attn.qkv.weight"] = np.concatenate(
                [sd[hb + "attention.self.query.weight"],
                 sd[hb + "attention.self.key.weight"],
                 sd[hb + "attention.self.value.weight"]], axis=0)
            out[tb + "attn.qkv.bias"] = np.concatenate(
                [sd[hb + "attention.self.query.bias"],
                 sd[hb + "attention.self.key.bias"],
                 sd[hb + "attention.self.value.bias"]])
            copy(tb + "attn.proj.", hb + "attention.output.dense.")
            out[tb + "attn.relative_position_bias_table"] = sd[
                hb + "attention.self.relative_position_bias_table"]
            copy(tb + "norm1.", hb + "layernorm_before.")
            copy(tb + "norm2.", hb + "layernorm_after.")
            copy(tb + "mlp.fc1.", hb + "intermediate.dense.")
            copy(tb + "mlp.fc2.", hb + "output.dense.")
        hd = f"{sw}encoder.layers.{s}.downsample."
        if hd + "reduction.weight" in sd:
            copy(f"backbone.0.layers.{s}.downsample.reduction.",
                 hd + "reduction.")
            copy(f"backbone.0.layers.{s}.downsample.norm.", hd + "norm.")
    for si in cfg.backbone_stage_indices:
        copy(f"backbone.0.norm{si}.",
             f"{sw}hidden_states_norms.stage{si + 1}.")

    for k, v in sd.items():
        if k.startswith(f"{m}text_backbone."):
            out["bert." + k[len(f"{m}text_backbone."):]] = v
    copy("feat_map.", m + "text_projection.")
    out["transformer.level_embed"] = sd[m + "level_embed"]
    copy("transformer.enc_output.", m + "enc_output.")
    copy("transformer.enc_output_norm.", m + "enc_output_norm.")
    for j in range(3):
        copy(f"transformer.enc_out_bbox_embed.layers.{j}.",
             f"{m}encoder_output_bbox_embed.layers.{j}.")
    out["transformer.tgt_embed.weight"] = sd[
        m + "query_position_embeddings.weight"]
    for j in range(2):
        copy(f"transformer.decoder.ref_point_head.layers.{j}.",
             f"{m}decoder.reference_points_head.layers.{j}.")
    copy("transformer.decoder.norm.", m + "decoder.layer_norm.")
    for i in range(cfg.decoder_layers):
        for j in range(3):
            copy(f"bbox_embed.{i}.layers.{j}.", f"bbox_embed.{i}.layers.{j}.")
    return out


def test_original_repo_converter_matches_hf_converter(dino_pair):
    """Same weights through both key schemas -> identical param trees."""
    import jax

    model, cfg, params_hf = dino_pair
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd_orig = _hf_sd_to_original_schema(sd, cfg)
    params_orig = gd.convert_original_grounding_dino(sd_orig, cfg)

    flat_hf, tree_hf = jax.tree.flatten_with_path(params_hf)
    flat_orig, tree_orig = jax.tree.flatten_with_path(params_orig)
    assert tree_hf == tree_orig
    for (path_a, a), (path_b, b) in zip(flat_hf, flat_orig):
        assert path_a == path_b
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0,
            err_msg=str(path_a),
        )


def test_original_repo_converter_shared_bbox_heads(dino_pair):
    """Weight-shared bbox heads (only head 0 saved) reuse head 0."""
    model, cfg, _ = dino_pair
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd_orig = _hf_sd_to_original_schema(sd, cfg)
    for k in list(sd_orig):
        if k.startswith("bbox_embed.") and not k.startswith("bbox_embed.0."):
            del sd_orig[k]
    params = gd.convert_original_grounding_dino(sd_orig, cfg)
    a = params["bbox_heads"][0]["layer0"]["kernel"]
    b = params["bbox_heads"][-1]["layer0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detect_batch_matches_single(dino_pair):
    """Batched detection (one forward for k frames) must reproduce the
    per-frame path exactly — same preprocessing, same postprocess."""
    _, cfg, params = dino_pair
    det = gd.GroundingDinoDetector(
        params, cfg,
        tokenize=lambda s: [101] + [min(900, 5 + ord(c) % 50) for c in s[:10]]
        + [102],
        image_size=64,
        box_threshold=0.0,
    )
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, size=(3, 48, 80, 3), dtype=np.uint8)
    batched = det.detect_batch(frames, ["cat", "dog"])
    for f in range(3):
        boxes, scores, cids = det(frames[f], ["cat", "dog"])
        np.testing.assert_allclose(batched[f][0], boxes, atol=1e-4)
        np.testing.assert_allclose(batched[f][1], scores, atol=1e-5)
        np.testing.assert_array_equal(batched[f][2], cids)

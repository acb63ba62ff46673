"""SAM parity vs HF SamModel (random weights): vision encoder, box
prompts, mask decoder logits and IoU predictions."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import transformers

from video_llava_tpu.models import sam as sam_mod
from video_llava_tpu.models.sam import SamConfig


@pytest.fixture(scope="module")
def sam_pair():
    hf_cfg = transformers.SamConfig(
        vision_config=dict(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=64,
            patch_size=8,
            global_attn_indexes=[1],
            window_size=2,
            mlp_dim=64,
            output_channels=16,
            num_pos_feats=8,  # shared PE dim must equal prompt hidden
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=64, patch_size=8, mask_input_channels=4
        ),
        mask_decoder_config=dict(
            hidden_size=16,
            num_attention_heads=2,
            mlp_dim=32,
            iou_head_hidden_dim=16,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SamModel(hf_cfg).eval()
    cfg = SamConfig.tiny_test()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = sam_mod.convert_hf_sam(sd, cfg)
    return model, cfg, params


def test_vision_encoder_matches_hf(sam_pair):
    model, cfg, params = sam_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.vision_encoder(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).last_hidden_state.numpy()  # (b, c, g, g)
    got = np.asarray(
        sam_mod.vision_encoder(params["vision"], jnp.asarray(pixels), cfg.vision)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mask_prediction_matches_hf(sam_pair):
    model, cfg, params = sam_pair
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 40.0, 48.0]]], np.float32)  # (b, n, 4)
    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=True,
        )
        want_masks = out.pred_masks.numpy()  # (b, n, 3, h, w)
        want_iou = out.iou_scores.numpy()
    got_masks, got_iou = sam_mod.predict_boxes(
        params, jnp.asarray(pixels), jnp.asarray(boxes), cfg
    )
    np.testing.assert_allclose(
        np.asarray(got_iou), want_iou, rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_masks), want_masks, rtol=5e-3, atol=5e-3
    )


def test_batched_boxes(sam_pair):
    _, cfg, params = sam_pair
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(0, 32, size=(2, 3, 4)).astype(np.float32)
    )
    boxes = boxes.at[..., 2:].add(16.0)
    masks, iou = sam_mod.predict_boxes(params, pixels, boxes, cfg)
    assert masks.shape == (2, 3, 3, 32, 32)
    assert iou.shape == (2, 3, 3)


def test_predict_from_embeddings_matches_predict_boxes(sam_pair):
    """Split encoder/decoder path (embedding cache) is bit-identical to
    the fused predict_boxes pipeline."""
    _, cfg, params = sam_pair
    rng = np.random.default_rng(3)
    pixels = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 32, size=(2, 2, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(16.0)
    want_masks, want_iou = sam_mod.predict_boxes(params, pixels, boxes, cfg)
    emb = sam_mod.vision_encoder(params["vision"], pixels, cfg.vision)
    got_masks, got_iou = sam_mod.predict_from_embeddings(
        params, emb, boxes, cfg
    )
    np.testing.assert_array_equal(np.asarray(got_masks), np.asarray(want_masks))
    np.testing.assert_array_equal(np.asarray(got_iou), np.asarray(want_iou))


def test_segmenter_embedding_cache_parity(sam_pair):
    """SamSegmenter: precomputed-embedding calls return exactly what the
    uncached path returns, and cache entries pop on use."""
    from video_llava_tpu.grounding.builders import SamSegmenter

    _, cfg, params = sam_pair
    seg = SamSegmenter(params, cfg, encode_batch_size=2)
    rng = np.random.default_rng(4)
    frames = [
        rng.integers(0, 255, size=(48, 56, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    boxes = np.array([[8.0, 8.0, 40.0, 44.0], [4.0, 4.0, 24.0, 30.0]],
                     np.float32)
    want = [seg(f, boxes) for f in frames]

    seg.precompute_embeddings(frames, [0, 1, 2])  # chunks [2, 2(padded)]
    assert set(seg._emb_cache) == {0, 1, 2}
    got = [seg(f, boxes, frame_index=i) for i, f in enumerate(frames)]
    assert not seg._emb_cache  # popped on use
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # discard + clear lifecycle
    seg.precompute_embeddings(frames, [0, 1])
    seg.discard_embedding(0)
    assert set(seg._emb_cache) == {1}
    seg.clear_cache()
    assert not seg._emb_cache

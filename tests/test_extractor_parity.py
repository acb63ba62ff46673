"""End-to-end feature-extractor parity (SURVEY hard part (a)).

Reproduces the reference extraction pipeline
(scripts/save_spatio_temporal_clip_features.py) in torch — decoded
frames -> torch-nearest resize -> HF CLIPImageProcessor -> HF
CLIPVisionModel hidden_states[-2][:,1:] -> pooling — and compares our
device pipeline (same decoded frames -> ops.image.preprocess_frames ->
JAX CLIP -> ops.pooling) with identical random weights. Validates every
numeric step of BASELINE config 1 short of real released weights.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import transformers
from PIL import Image

from video_llava_tpu.config import CLIPVisionConfig
from video_llava_tpu.engine.weights import convert_clip_vision
from video_llava_tpu.media.loader import VideoReader, encode_video
from video_llava_tpu.models.clip import vision_penultimate_patches
from video_llava_tpu.ops.image import preprocess_frames
from video_llava_tpu.ops.pooling import spatio_temporal_pool
from video_llava_tpu.ops.sampling import get_seq_frames


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    size = 56
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=size, patch_size=14, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=size, patch_size=14, hidden_size=64, intermediate_size=256,
        num_layers=3, num_heads=4,
    )
    params = convert_clip_vision(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )
    processor = transformers.CLIPImageProcessor(
        size={"shortest_edge": size}, crop_size={"height": size, "width": size}
    )

    path = str(tmp_path_factory.mktemp("ext") / "v.mp4")
    rng = np.random.default_rng(0)
    encode_video(
        path, rng.integers(0, 255, size=(24, 90, 120, 3), dtype=np.uint8),
        fps=6, codec="mpeg4",
    )
    return model, cfg, params, processor, path, size


def test_full_extractor_parity(pipeline):
    model, cfg, params, processor, path, size = pipeline

    # Shared decode (the reference uses decord; both sides here consume
    # the same native-decoded frames, isolating the numeric pipeline).
    vr = VideoReader(path)
    idx = get_seq_frames(len(vr), 10)
    frames = vr.get_batch(idx)  # native resolution (90, 120)
    vr.close()

    # --- reference composition (torch) -----------------------------------
    # load_video: torch nearest interpolate to (size, size), uint8
    ft = torch.from_numpy(frames).permute(0, 3, 1, 2).float()
    ft = torch.nn.functional.interpolate(ft, size=(size, size))
    ft = ft.permute(0, 2, 3, 1).to(torch.uint8).numpy()
    pil = [Image.fromarray(f) for f in ft]
    pixel_values = processor.preprocess(pil, return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        out = model(pixel_values, output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]
        t, s, c = feats.shape
        temporal = feats.mean(dim=1)
        temporal = torch.cat([temporal, torch.zeros(100 - t, c)], dim=0)
        want = torch.cat([temporal, feats.mean(dim=0)], dim=0).numpy()

    # --- our device pipeline ----------------------------------------------
    pixels = preprocess_frames(frames, size)  # nearest resize + normalize
    got_feats = vision_penultimate_patches(params, pixels, cfg)
    got = np.asarray(
        spatio_temporal_pool(got_feats, out_dtype=jnp.float32)
    )

    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

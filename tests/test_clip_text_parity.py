"""CLIP text tower parity vs HF CLIPModel text side (random weights):
the grounding stack's zero-shot filter depends on it."""

import numpy as np
import torch
import jax.numpy as jnp

import transformers

from video_llava_tpu.config import CLIPTextConfig
from video_llava_tpu.engine.weights import convert_clip_text
from video_llava_tpu.models.clip import text_forward


def test_text_embedding_matches_hf():
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
            hidden_act="quick_gelu",
            eos_token_id=501,
            bos_token_id=500,
        ),
        vision_config=dict(
            image_size=56, patch_size=14, hidden_size=32,
            intermediate_size=64, num_hidden_layers=1, num_attention_heads=2,
        ),
        projection_dim=48,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, projection_dim=48,
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_text(sd, cfg)

    rng = np.random.default_rng(0)
    # HF pools at the highest token id (EOT); craft ids accordingly
    ids = rng.integers(1, 400, size=(2, 12))
    ids[:, 7] = 501  # EOT position
    with torch.no_grad():
        want = model.get_text_features(torch.from_numpy(ids)).numpy()
    got = np.asarray(
        text_forward(params, jnp.asarray(ids), cfg, eot_token_id=501)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # OpenAI-convention pooling (max id = EOT) agrees here since 501 is
    # the largest id in every row.
    got2 = np.asarray(text_forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-4)

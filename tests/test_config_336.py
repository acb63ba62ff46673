"""LLaVA-1.5-style 336px configuration: token lengths and the
mlp2x_gelu projector (reference video_chatgpt.py:52-56,
builder.py:33-51)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import (
    CLIPVisionConfig,
    LlamaConfig,
    ProjectorConfig,
    VideoLLaVAConfig,
)
from video_llava_tpu.models import projector


def test_336_token_lengths():
    cfg = VideoLLaVAConfig(
        vision=CLIPVisionConfig(image_size=336),
        llm=LlamaConfig.vicuna_13b(),
        projector_type="mlp2x_gelu",
    )
    assert cfg.vision.num_patches == 576
    assert cfg.video_token_len == 676  # 576 + 100 (model_utils.py:147-148)
    assert cfg.projector.projector_type == "mlp2x_gelu"


def test_mlp2x_gelu_projector():
    pcfg = ProjectorConfig(projector_type="mlp2x_gelu", mm_hidden_size=16,
                           hidden_size=32)
    params = projector.init_params(jax.random.PRNGKey(0), pcfg, jnp.float32)
    assert len(params["layers"]) == 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)),
                    jnp.float32)
    y = projector.apply(params, x, pcfg)
    assert y.shape == (3, 32)

    # identity passthrough
    icfg = ProjectorConfig(projector_type="identity")
    assert projector.apply({}, x, icfg) is x

    # unknown type raises (builder.py:51)
    import pytest

    with pytest.raises(ValueError):
        projector.init_params(
            jax.random.PRNGKey(0),
            ProjectorConfig(projector_type="bogus"),
        )

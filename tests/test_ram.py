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

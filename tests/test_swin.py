"""Swin backbone parity vs HF SwinModel (random weights)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

import transformers

from video_llava_tpu.models import swin
from video_llava_tpu.models.swin import SwinConfig


@pytest.fixture(scope="module")
def swin_pair():
    hf_cfg = transformers.SwinConfig(
        image_size=64,
        patch_size=4,
        embed_dim=24,
        depths=[2, 2],
        num_heads=[2, 4],
        window_size=4,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.SwinModel(hf_cfg).eval()
    cfg = SwinConfig.tiny_test()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = swin.convert_hf_swin(sd, cfg)
    return model, cfg, params


def test_pooled_matches_hf(swin_pair):
    model, cfg, params = swin_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    got = np.asarray(swin.forward_pooled(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_multiscale_feature_shapes(swin_pair):
    _, cfg, params = swin_pair
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    feats = swin.forward_features(params, pixels, cfg)
    assert [f.shape for f in feats] == [(1, 16, 16, 24), (1, 8, 8, 48)]


def test_non_window_divisible_matches_hf(swin_pair):
    """HF pads non-window-divisible maps (and odd merges) right/bottom
    and crops back — the GroundingDINO-at-800px case (200x200 patches,
    window 7). 88px here: 22x22 patches, window 4 divides, but the merge
    to 11x11 is odd and the next stage pads 11 -> 12."""
    model, cfg, params = swin_pair
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(1, 88, 88, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    got = np.asarray(swin.forward_pooled(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_window_pad_matches_hf():
    """Patch grid NOT divisible by the window (23x23 grid, window 4)."""
    hf_cfg = transformers.SwinConfig(
        image_size=92, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=4, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.SwinModel(hf_cfg).eval()
    cfg = SwinConfig.tiny_test()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = swin.convert_hf_swin(sd, cfg)
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(1, 92, 92, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    got = np.asarray(swin.forward_pooled(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_shrunk_window_bias_uses_table_stride():
    """When the runtime window shrinks below the config window, bias
    lookups must address the (2W-1)-strided checkpoint table by true
    relative displacement (adversarial-review regression)."""
    import numpy as np

    from video_llava_tpu.models.swin import _relative_position_index

    W, w = 7, 6
    small = _relative_position_index(w, W)
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    ).reshape(2, -1)
    for a in range(w * w):
        for b in range(w * w):
            dy = coords[0, a] - coords[0, b]
            dx = coords[1, a] - coords[1, b]
            want = (dy + W - 1) * (2 * W - 1) + (dx + W - 1)
            assert small[a, b] == want, (a, b)

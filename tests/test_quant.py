"""int8 weights-only quantization: numerics and LM integration."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.models import llama
from video_llava_tpu.ops.quant import (
    dequantize,
    is_quantized,
    quantize_params,
    quantize_tensor,
    quantized_matmul,
)


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    q, s = quantize_tensor(jnp.asarray(w), axis=0)
    back = np.asarray(dequantize(q, s, jnp.float32))
    # per-channel int8: relative error ~ 1/127 of channel absmax
    err = np.abs(back - w).max(axis=0)
    bound = np.abs(w).max(axis=0) / 127.0 * 0.51
    assert (err <= bound + 1e-6).all()


def test_quantized_matmul_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    q, s = quantize_tensor(w, axis=0)
    got = np.asarray(quantized_matmul(x, q, s))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert np.median(rel) < 0.02


def test_quantized_llama_logits_close():
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_params(params, min_size=1024)
    assert is_quantized(qparams["layers"]["wq"]["kernel"])
    assert is_quantized(qparams["lm_head"]["kernel"])

    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 16)))
    full, _ = llama.forward(params, cfg, input_ids=ids)
    quant, _ = llama.forward(qparams, cfg, input_ids=ids)
    f = np.asarray(full).reshape(-1)
    q = np.asarray(quant).reshape(-1)
    cos = (f @ q) / (np.linalg.norm(f) * np.linalg.norm(q))
    assert cos > 0.99, cos
    # greedy next-token ranking mostly preserved
    agree = (
        np.argmax(np.asarray(full)[0], -1) == np.argmax(np.asarray(quant)[0], -1)
    ).mean()
    assert agree > 0.7, agree


def test_clip_vision_w8a8_close_to_fp():
    """W8A8 (qvalues_a8) CLIP tower stays within PTQ-int8 tolerance of
    the fp forward (cosine similarity on penultimate patches)."""
    import numpy as np
    from video_llava_tpu.config import CLIPVisionConfig
    from video_llava_tpu.models import clip

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64,
        intermediate_size=128, num_layers=3, num_heads=4,
    )
    p = clip.init_vision_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    q = quantize_params(p, min_size=1024, a8=True)
    flat = jax.tree_util.tree_leaves_with_path(q)
    assert any("qvalues_a8" in str(path) for path, _ in flat)
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
            np.float32
        )
    )
    a = np.asarray(clip.vision_penultimate_patches(p, px, cfg)).ravel()
    b = np.asarray(clip.vision_penultimate_patches(q, px, cfg)).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos

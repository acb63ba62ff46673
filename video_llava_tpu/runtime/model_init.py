"""Model initialization from checkpoints.

Parity: reference initialize_model (video_chatgpt/eval/model_utils.py:
82-150): load tokenizer + LM (fp16 there, bf16 here), add video special
tokens, resize embeddings, non-strict projector overlay from
mm_projector.bin, load CLIP vision tower, compute
video_token_len = (frame_size/patch_size)^2 + 100.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_tpu.config import (
    CLIPVisionConfig,
    GenerationConfig,
    LlamaConfig,
    VideoLLaVAConfig,
)
from video_llava_tpu.engine import weights as weights_mod
from video_llava_tpu.parallel import make_mesh, shard_params, videollava_param_specs
from video_llava_tpu.runtime.inference import InferenceEngine
from video_llava_tpu.runtime.tokenizer import load_tokenizer
from video_llava_tpu.models import video_llava


def _llm_quant_layout(cfg, llm_quant: str, llm_fuse: bool):
    """Abstract shapes of the LLM tree in its final serving layout
    (quantized, optionally with fused wqkv/gate_up decode kernels)."""
    from video_llava_tpu.models.llama import fuse_layer_kernels
    from video_llava_tpu.ops.quant import quantize_params
    from video_llava_tpu.ops.quant4 import quantize_params_int4

    q = quantize_params_int4 if llm_quant == "int4" else quantize_params
    to_layout = (lambda t: fuse_layer_kernels(q(t))) if llm_fuse else q
    shapes = jax.eval_shape(
        lambda k: video_llava.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    return to_layout, jax.eval_shape(to_layout, shapes["llm"])


def _random_llm_quantized(cfg, llm_quant: str, llm_fuse: bool):
    """Random LLM weights materialized DIRECTLY in the quantized (and
    optionally fused) layout: a bf16 7B/13B intermediate plus the
    quantize-program temporaries exceed single-chip HBM (measured:
    quantizing a materialized bf16 7B demanded 23.3 G of 15.75 G), and
    random values don't affect serving latency."""
    _, qshapes = _llm_quant_layout(cfg, llm_quant, llm_fuse)

    def make(leaf):
        if leaf.dtype == jnp.int8:
            return jnp.ones(leaf.shape, jnp.int8) * 3
        return jnp.full(leaf.shape, 0.01, leaf.dtype)

    return jax.jit(lambda: jax.tree.map(make, qshapes))()


def _host_quantize_llm(llm_np, cfg, llm_quant: str, llm_fuse: bool):
    """Quantize a host-resident (numpy) LLM tree on the CPU backend and
    return numpy leaves in the final layout — real checkpoints never
    materialize a device bf16 copy (the 13B one cannot even fit)."""
    to_layout, _ = _llm_quant_layout(cfg, llm_quant, llm_fuse)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return jax.device_get(to_layout(llm_np))


def initialize_model(
    model_name: Optional[str] = None,
    projection_path: Optional[str] = None,
    clip_path: Optional[str] = None,
    model_size: str = "7b",
    image_size: int = 224,
    dtype=jnp.bfloat16,
    mesh_model: Optional[int] = None,
    seed: int = 0,
    clip_dtype: Optional[str] = None,
    llm_quant: Optional[str] = None,
    llm_fuse: bool = False,
) -> InferenceEngine:
    """Build an InferenceEngine.

    model_name: HF Vicuna/LLaMA checkpoint dir (tokenizer + weights).
    projection_path: reference-style mm_projector.bin.
    clip_path: HF CLIP checkpoint dir. Missing paths fall back to random
    init (air-gapped testing / benchmarking).
    clip_dtype: None/'bf16' | 'auto' | 'int8' — W8A8 CLIP tower,
    resolved against the checkpoint's quant-preflight record
    (engine/quant_select.resolve_clip_dtype: 'auto' pins the recorded
    vision decision, explicit int8 against real weights needs an
    approving record).
    llm_quant: None | 'int8' | 'int4' — weights-only LLM quantization
    applied WITHOUT ever materializing a device bf16 LLM (direct
    quantized init for random weights, host-side quantize for
    checkpoints): quantize-after-init OOMs single-chip HBM at 7B+.
    llm_fuse: merge wqkv/gate_up decode kernels (single-chip only —
    fused names are outside the TP sharding rules).
    """
    if llm_fuse and mesh_model and mesh_model > 1:
        raise ValueError("llm_fuse is single-chip only (TP shards "
                         "unfused names)")
    tokenizer = load_tokenizer(model_name)

    if model_size == "tiny":
        cfg = VideoLLaVAConfig.tiny()
    else:
        llm = (
            LlamaConfig.vicuna_7b() if model_size == "7b" else LlamaConfig.vicuna_13b()
        )
        vision = CLIPVisionConfig(image_size=image_size)
        cfg = VideoLLaVAConfig(llm=llm, vision=vision)
    cfg = dataclasses.replace(
        cfg,
        vid_patch_token_id=tokenizer.vid_patch_token_id,
        vid_start_token_id=tokenizer.vid_start_token_id,
        vid_end_token_id=tokenizer.vid_end_token_id,
    )

    if llm_quant and not (model_name and os.path.isdir(model_name)):
        # Random weights, quantized serving: init vision/projector
        # normally but the LLM directly in its final layout.
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        import video_llava_tpu.models.clip as clip_mod
        import video_llava_tpu.models.projector as proj_mod

        params = {
            "vision": jax.jit(
                lambda k: clip_mod.init_vision_params(k, cfg.vision, dtype)
            )(k1),
            "projector": proj_mod.init_params(k2, cfg.projector, dtype),
            "llm": _random_llm_quantized(cfg, llm_quant, llm_fuse),
        }
    else:
        params = jax.jit(lambda k: video_llava.init_params(k, cfg, dtype))(
            jax.random.PRNGKey(seed)
        )
    if model_name and os.path.isdir(model_name):
        sd = weights_mod.load_checkpoint_dir(model_name)
        if llm_quant:
            # convert AND quantize on the CPU backend, then ship only
            # the quantized tree — the bf16 13B tree can't fit HBM
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                llm_host = weights_mod.convert_llama(sd, cfg.llm, dtype)
            llm_host = _host_quantize_llm(llm_host, cfg, llm_quant,
                                          llm_fuse)
            params["llm"] = jax.tree.map(jnp.asarray, llm_host)
        else:
            params["llm"] = weights_mod.convert_llama(sd, cfg.llm, dtype)
    if clip_path and os.path.isdir(clip_path):
        sd = weights_mod.load_checkpoint_dir(clip_path)
        params["vision"] = weights_mod.convert_clip_vision(sd, cfg.vision, dtype)
    if clip_dtype and clip_dtype != "bf16":
        from video_llava_tpu.engine.quant_select import resolve_clip_dtype
        from video_llava_tpu.ops.quant import quantize_params

        resolved = resolve_clip_dtype(
            clip_dtype,
            clip_path if clip_path and os.path.isdir(clip_path) else None,
        )
        if resolved == "int8":
            params["vision"] = jax.jit(
                lambda v: quantize_params(v, a8=True)
            )(params["vision"])
    if projection_path and os.path.exists(projection_path):
        sd = weights_mod.load_torch_bin(projection_path)
        params, report = weights_mod.apply_projector_overlay(
            params, sd, cfg.projector, dtype
        )
        if report["unexpected"]:
            print(
                f"Unexpected Keys: {report['unexpected']}.\n"
                "The Video-ChatGPT weights are not loaded correctly."
            )

    mesh = None
    if mesh_model and mesh_model > 1:
        from video_llava_tpu.ops.attention import set_attention_mesh
        from video_llava_tpu.ops.pooling import set_pooling_mesh

        mesh = make_mesh(1, mesh_model)
        params = shard_params(params, videollava_param_specs(params), mesh)
        set_attention_mesh(mesh)  # enables shard_map'd Pallas attention
        set_pooling_mesh(mesh)  # keeps pooling fused per-shard

    return InferenceEngine(
        params=params,
        cfg=cfg,
        tokenizer=tokenizer,
        gen=GenerationConfig(
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
        ),
        mesh=mesh,
    )

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
    """
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

    params = jax.jit(lambda k: video_llava.init_params(k, cfg, dtype))(
        jax.random.PRNGKey(seed)
    )
    if model_name and os.path.isdir(model_name):
        sd = weights_mod.load_checkpoint_dir(model_name)
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

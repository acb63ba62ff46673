"""Training entry point.

Parity: reference train() (video_chatgpt/train/train.py:477-562) — the
projector-tuning recipe on precomputed CLIP features: AdamW + cosine,
bf16, tune_mm_mlp_adapter (projector + token embeddings), periodic
checkpoints, resume from the newest checkpoint-*, final projector-only
export (mm_projector.bin).

TPU-native: one pjit'd train step over a ('data','model') mesh; the
data loader feeds static-bucket batches; checkpoints via Orbax.

Run:
  python -m video_llava_tpu.train.train --data_path data.json \
      --video_folder feats/ --output_dir ckpts/ [--mesh_data 2 ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import LlamaConfig, VideoLLaVAConfig
from video_llava_tpu.engine.checkpoint import (
    export_projector,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from video_llava_tpu.models import video_llava
from video_llava_tpu.parallel import make_mesh, shard_params, videollava_param_specs
from video_llava_tpu.runtime.tokenizer import load_tokenizer
from video_llava_tpu.train.data import (
    Collator,
    LazySupervisedDataset,
    MultimodalCfg,
    data_iterator,  # noqa: F401 (public API, single-host path)
    sharded_data_iterator,
)
from video_llava_tpu.train.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--video_folder", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_size", default="7b", choices=["7b", "13b", "tiny"])
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--pretrained_dir", default=None,
                   help="HF LLaMA/Vicuna checkpoint dir to initialize from")
    p.add_argument("--tune_mm_mlp_adapter", action="store_true", default=True)
    p.add_argument("--tune_mode", default="projector+embed",
                   choices=["projector", "projector+embed", "full"])
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    # HF TrainingArguments-compatible: microbatch the step and take one
    # token-weighted-averaged optimizer update (reference recipe trains
    # at global batch 32; docs/2-Training.md).
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--save_steps", type=int, default=3000)
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--mesh_model", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="Capture a jax.profiler trace of one steady-state training "
        "step (step 3, past compilation) into DIR; view with "
        "tensorboard/xprof or perfetto.",
    )
    p.add_argument(
        "--llm_weights", default="bf16", choices=["bf16", "int8"],
        help="Weight format for the FROZEN LLM body during projector/"
        "embedding tuning. int8 halves weight HBM so single-chip 7B "
        "projector tuning fits (gradients flow through the dequantized "
        "matmuls; trainable embeddings/projector stay bf16). Multi-chip "
        "FSDP runs keep bf16.",
    )
    return p.parse_args(argv)


def build_config(model_size: str) -> VideoLLaVAConfig:
    if model_size == "tiny":
        return VideoLLaVAConfig.tiny()
    llm = LlamaConfig.vicuna_7b() if model_size == "7b" else LlamaConfig.vicuna_13b()
    return VideoLLaVAConfig(llm=llm)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args.model_size)
    tokenizer = load_tokenizer(args.tokenizer_path)
    cfg = dataclasses.replace(
        cfg,
        vid_patch_token_id=tokenizer.vid_patch_token_id,
        vid_start_token_id=tokenizer.vid_start_token_id,
        vid_end_token_id=tokenizer.vid_end_token_id,
    )

    n_dev = len(jax.devices())
    data_axis = args.mesh_data or (n_dev if args.tune_mode != "full" else 1)
    mesh = make_mesh(data_axis, args.mesh_model)

    if args.pretrained_dir:
        from video_llava_tpu.engine.weights import convert_llama, load_checkpoint_dir

        sd = load_checkpoint_dir(args.pretrained_dir)
        llm_params = convert_llama(sd, cfg.llm)
        params = video_llava.init_params(
            jax.random.PRNGKey(args.seed), cfg, jnp.bfloat16
        )
        params["llm"] = llm_params
    else:
        params = video_llava.init_params(
            jax.random.PRNGKey(args.seed), cfg, jnp.bfloat16
        )

    if args.llm_weights == "int8":
        if args.tune_mode == "full":
            raise SystemExit("--llm_weights int8 requires a frozen LLM "
                             "(tune_mode projector/projector+embed)")
        from video_llava_tpu.ops.quant import quantize_params

        # embed_tokens stays bf16: it is trainable in projector+embed
        # mode (reference trains input embeddings alongside the
        # projector, train/llava_trainer.py:33-46).
        # donate: without it the bf16 LLM (13.5 GiB at 7B) and its int8
        # copy are both live during the call and single-chip quantized
        # tuning OOMs before the first step.
        params["llm"] = jax.jit(
            lambda p: quantize_params(p, skip_keys=(
                "class_embedding", "position_embedding", "embed_tokens",
            )),
            donate_argnums=0,
        )(params["llm"])

    specs = videollava_param_specs(params, fsdp=(args.tune_mode == "full"))
    params = shard_params(params, specs, mesh)
    if len(jax.devices()) > 1:
        from video_llava_tpu.ops.attention import set_attention_mesh

        set_attention_mesh(mesh)

    dataset = LazySupervisedDataset(
        args.data_path,
        tokenizer,
        MultimodalCfg(
            video_token_len=cfg.video_token_len,
            video_folder=args.video_folder,
            use_vid_start_end=cfg.use_vid_start_end,
        ),
        max_len=args.model_max_length,
    )
    collator = Collator(tokenizer.pad_token_id, max_len=args.model_max_length)
    batch_size = (
        args.per_device_train_batch_size
        * args.gradient_accumulation_steps
        * mesh.shape["data"]
    )
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * args.num_train_epochs

    mask = trainable_mask(params, args.tune_mode)
    tx = make_optimizer(
        args.learning_rate,
        args.weight_decay,
        warmup_steps=int(total_steps * args.warmup_ratio),
        total_steps=total_steps,
    )
    state = init_train_state(params, tx, mask)

    start_step = 0
    resume = latest_checkpoint(args.output_dir)
    if resume:
        print(f"resuming from {resume}")
        state = restore_checkpoint(resume, state)
        start_step = int(state.step)

    step_fn = make_train_step(
        cfg, tx, mask=mask,
        grad_accum=args.gradient_accumulation_steps,
    )
    rng = np.random.default_rng(args.seed)

    step = start_step
    t0 = time.time()
    for epoch in range(args.num_train_epochs):
        # Each host loads only its shard of the global batch (multi-host
        # data loading); single-host this is device_put with batch_spec.
        for batch in sharded_data_iterator(
            dataset, collator, batch_size, rng, mesh
        ):
            if step - start_step == 0:
                print(f"first batch shapes: { {k: v.shape for k, v in batch.items()} }")
            if args.profile and step - start_step == 3:
                # step 3: compilation and data-pipeline warmup are done,
                # so the trace shows one steady-state device step.
                with jax.profiler.trace(args.profile):
                    state, metrics = step_fn(state, batch)
                    # block_until_ready is a NO-OP over the tunneled
                    # TPU (CLAUDE.md); a host fetch is the real barrier
                    # that keeps the step inside the trace window
                    from video_llava_tpu.utils.timing import sync

                    sync(metrics)
                print(f"profiler trace written to {args.profile}")
            else:
                state, metrics = step_fn(state, batch)
            step += 1
            if step % 10 == 0:
                loss = float(metrics["loss"])
                dt = time.time() - t0
                print(
                    f"epoch {epoch} step {step}/{total_steps} "
                    f"loss {loss:.4f} ({dt / max(step - start_step, 1):.2f}s/step)"
                )
            if args.save_steps and step % args.save_steps == 0:
                save_checkpoint(args.output_dir, step, state)
                export_projector(
                    jax.device_get(state.params),
                    os.path.join(
                        args.output_dir, "mm_projector", f"checkpoint-{step}.bin"
                    ),
                )

    save_checkpoint(args.output_dir, step, state)
    export_projector(
        jax.device_get(state.params),
        os.path.join(args.output_dir, "mm_projector.bin"),
    )
    with open(os.path.join(args.output_dir, "train_summary.json"), "w") as f:
        json.dump({"steps": step, "wall_s": time.time() - t0}, f)
    print("training complete")


if __name__ == "__main__":
    main()

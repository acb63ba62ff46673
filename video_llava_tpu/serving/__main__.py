"""Serve a Vicuna judge / chat endpoint from the command line.

Replaces the reference's FastChat three-process recipe
(quantitative_evaluation/README.md:5-16: controller + model_worker +
openai_api_server) with one command:

    python -m video_llava_tpu.serving --model_name /path/vicuna-13b \
        --model_size 13b --quant int8 --continuous --num_slots 4

Missing --model_name serves random weights (air-gapped smoke).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from video_llava_tpu.runtime.model_init import initialize_model
from video_llava_tpu.serving.server import ChatModel, serve


def main(argv=None):
    ap = argparse.ArgumentParser(prog="video_llava_tpu.serving")
    ap.add_argument("--model_name", default=None,
                    help="HF Vicuna checkpoint dir (tokenizer + weights)")
    ap.add_argument("--model_size", default="13b",
                    choices=["tiny", "7b", "13b"])
    ap.add_argument("--quant", default=None,
                    choices=["int8", "int4", "auto"],
                    help="weights-only LLM quantization at load. "
                    "'auto' reads the checkpoint's quant_preflight.json "
                    "(validate_quant_quality --preflight --record) and "
                    "pins the recorded decision; 'int4' against real "
                    "weights REQUIRES a record approving int4")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--served_name", default="vicuna-13b-v1.5")
    ap.add_argument("--conv_mode", default="vicuna_v1_1")
    ap.add_argument("--mesh_model", type=int, default=None,
                    help="TP degree (shard the LLM over this many chips)")
    # batching modes (mutually exclusive; default = serialized)
    ap.add_argument("--continuous", action="store_true",
                    help="continuous batching (persistent slot decode)")
    ap.add_argument("--num_slots", type=int, default=4)
    ap.add_argument("--max_cache_len", type=int, default=2048)
    ap.add_argument("--paged", action="store_true",
                    help="paged KV pool for --continuous (shared block "
                    "pool + per-slot block tables)")
    ap.add_argument("--num_blocks", type=int, default=None,
                    help="paged pool size in 64-token blocks (default: "
                    "slot-cache capacity)")
    ap.add_argument("--prefix_cache", action="store_true",
                    help="automatic prefix caching (implies --paged): "
                    "repeated prompt prefixes skip their prefill")
    ap.add_argument("--batching", action="store_true",
                    help="windowed request batching")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--window_ms", type=float, default=30.0)
    ap.add_argument("--no_speculative", action="store_true")
    args = ap.parse_args(argv)

    from video_llava_tpu.engine.quant_select import resolve_quant

    # Resolve BEFORE the (slow) model load so a missing/refusing
    # preflight record fails fast (VERDICT r3 #8: int4 never ships
    # unvalidated; 'auto' pins the recorded decision).
    quant = resolve_quant(args.quant, args.model_name)
    if args.quant == "auto":
        print(f"--quant auto -> {quant or 'bf16'} (preflight record)",
              flush=True)

    # Quantization happens INSIDE initialize_model (direct quantized
    # init for random weights, host-side quantize for checkpoints) —
    # a quantize-after-init jit on a materialized bf16 7B demanded
    # 23.3 G of the chip's 15.75 G HBM. Single-chip serving also takes
    # the fused wqkv/gate_up decode layout (the bench's fast path).
    single_chip = not (args.mesh_model and args.mesh_model > 1)
    engine = initialize_model(
        model_name=args.model_name,
        model_size=args.model_size,
        mesh_model=args.mesh_model,
        llm_quant=quant,
        llm_fuse=bool(quant) and single_chip,
    )
    params = engine.params

    model = ChatModel(
        params=params,
        cfg=engine.cfg,
        tokenizer=engine.tokenizer,
        conv_mode=args.conv_mode,
        cache_dtype=jnp.int8 if quant == "int8" else jnp.bfloat16,
        speculative=not args.no_speculative,
        mesh=engine.mesh,
    )
    serve(
        model,
        host=args.host,
        port=args.port,
        model_name=args.served_name,
        batching=args.batching,
        continuous=args.continuous,
        num_slots=args.num_slots,
        max_cache_len=args.max_cache_len,
        paged=args.paged,
        num_blocks=args.num_blocks,
        prefix_cache=args.prefix_cache,
    )


if __name__ == "__main__":
    main()

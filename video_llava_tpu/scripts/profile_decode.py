"""Decode-step decomposition on chip (VERDICT r3 #9).

The int4 7B decode step measures 8.31 ms against a ~4.2 ms pure
weight-stream floor; this script finds where the other ~4 ms goes:
  1. measures the warm per-step latency of the bench decode step
     (same construction as bench.py: int4 W4A8 fused layout, bf16 KV
     scan-carry cache);
  2. captures a jax.profiler trace of a burst of decode steps and
     prints per-op device self-times (utils/trace_tools.py) — the
     non-matmul remainder (cache copies, rotary/norm glue, sampling)
     shows up by name.

Usage (TPU, from /root/repo):
    python -m video_llava_tpu.scripts.profile_decode [--steps 64]
Honors BENCH_LLM_DTYPE / BENCH_MODEL / BENCH_KV_DTYPE like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--trace_dir", default="/tmp/decode_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.getcwd())
    import bench  # repo-root bench machinery

    from video_llava_tpu.engine import generate as gen_mod
    from video_llava_tpu.utils.timing import measure, sync
    from video_llava_tpu.utils.trace_tools import print_top_ops

    cfg, params, frames, input_ids, seq_lens, rng, fns = bench.build()
    encode_jit, prefill_jit, _ = fns
    feats = encode_jit(params, frames)
    pre = prefill_jit(params, input_ids, seq_lens, feats)

    tok = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)

    def step(t, cache):
        return gen_mod.decode_step_jit(params["llm"], cfg.llm, t, cache)

    lg, cache = step(tok, pre.cache)  # compile
    sync(lg)

    # warm per-step latency: run a burst inside one host window so the
    # per-call RTT does not dominate (measure() subtracts one RTT per
    # call; a 16-step chained burst amortizes dispatch noise further).
    # decode_step_jit DONATES the cache, so the burst chains it
    # forward instead of restarting from a (now-invalid) buffer.
    state = {"t": tok, "c": cache}

    def burst(i):
        out = None
        for _ in range(16):
            out, state["c"] = step(state["t"], state["c"])
            state["t"] = jnp.argmax(out, axis=-1).astype(jnp.int32)
        return out

    t_burst = measure(burst, iters=3)
    tok, cache = state["t"], state["c"]
    step_ms = t_burst / 16 * 1e3
    print(json.dumps({
        "decode_step_ms": round(step_ms, 3),
        "model": bench.MODEL_SIZE,
        "llm_dtype": bench.LLM_DTYPE,
        "kv": bench.CACHE_DTYPE,
    }), flush=True)

    with jax.profiler.trace(args.trace_dir):
        t, c = tok, cache
        for _ in range(args.steps):
            out, c = step(t, c)
            t = jnp.argmax(out, axis=-1).astype(jnp.int32)
        sync(out)
    print(f"# trace written to {args.trace_dir}", flush=True)
    print_top_ops(args.trace_dir, n=args.top)


if __name__ == "__main__":
    main()

"""On-chip decomposition of the XMem propagation step.

XMem propagation is the largest device stage of the grounded-clip
pipeline after round 4 (17.2 ms/frame of the ~3.4 s device projection;
detect fell to 60-64 ms/frame and SAM to ~12). Its compute roofline is
~1-2 ms/frame (r50 key encode + r18 value encode + memory read +
decoder at 480x832, f32), so this script times the stages separately to
find where the other ~15 ms goes. Reference: the DEVA/XMem GPU stack
the tracker replaces (grounding_evaluation/grounding_new_api.py:21-24).

Usage (TPU, from /root/repo):
    python -m video_llava_tpu.scripts.profile_xmem [--frames 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models import xmem
from video_llava_tpu.utils.timing import measure


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--objects", type=int, default=4)
    ap.add_argument("--trace_dir", default="")
    args = ap.parse_args(argv)

    H, W, N, T = args.height, args.width, args.objects, args.frames
    cfg = xmem.XMemConfig(max_objects=N)
    rng = np.random.default_rng(0)
    params = jax.jit(
        lambda k: xmem.init_params(k, cfg, jnp.float32)
    )(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        rng.integers(0, 255, (T, H, W, 3)), jnp.uint8
    ).astype(jnp.float32) / 255
    mask0 = jnp.asarray(rng.random((N, H, W)) > 0.9, jnp.float32)
    state = xmem.init_state(cfg, H // 16, W // 16)
    nobj = jnp.asarray(N, jnp.int32)
    state = xmem.add_reference_step(
        params, state, frames[0], mask0, nobj, cfg
    )
    upd = jnp.zeros((T,), bool)
    deep = jnp.zeros((T,), bool)

    out = {"frames": T, "size": f"{H}x{W}", "objects": N}

    # stage 1: key encode (r50 trunk + projections), one frame vmapped
    # over the chunk (mirrors propagate_chunk's batched key encode)
    key_fn = jax.jit(
        lambda p, f: jax.vmap(lambda fr: xmem.encode_key(p, fr)[3])(f)
    )
    key_fn(params, frames)
    t = min(
        measure(lambda i: key_fn(params, frames), iters=10)
        for _ in range(2)
    )
    out["key_encode_chunk_ms"] = round(t * 1e3, 2)

    # full chunk
    full = jax.jit(
        lambda p, s, f: xmem.propagate_chunk(p, s, f, upd, deep, cfg)[0]
    )
    full(params, state, frames)
    t = min(
        measure(lambda i: full(params, state, frames), iters=10)
        for _ in range(2)
    )
    out["propagate_chunk_ms"] = round(t * 1e3, 2)
    out["per_frame_ms"] = round(t / T * 1e3, 2)
    print(json.dumps(out), flush=True)

    if args.trace_dir:
        from video_llava_tpu.utils import trace_tools

        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                r = full(params, state, frames)
            np.asarray(r[0, 0, 0, 0])
        rows = trace_tools.device_op_totals(args.trace_dir)
        for name, ms, n in rows[:25]:
            print(f"{ms / 3:9.3f} ms  x{n:4d}  {name[:80]}", flush=True)


if __name__ == "__main__":
    main()

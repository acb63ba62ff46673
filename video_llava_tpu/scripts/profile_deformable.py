"""On-chip stage decomposition of the deformable-attention kernel.

The GDINO encoder is 6 calls of this kernel = 82% of detect
(scripts/profile_gdino, round 4); VERDICT r4 #3 asks for the call to
reach ~4.5 ms at the encoder shape or a measured rejection. This
script decomposes the measured time by ABLATION — the kernel runs with
stages skipped (`_ablate`, wrong math, timing only) and stage costs
fall out by difference:

    full        y-dot + x-tent-mask + point-sum + fold
    no_mask     full minus the x bilinear-tent build/multiply
    no_fold     full minus the fold matmul
    y_only      y-dot only (plus tent build on the y side)

Chained-iteration methodology (CLAUDE.md): K data-dependent calls in
one jit, best of 3 bursts.

Usage: python -m video_llava_tpu.scripts.profile_deformable [--k 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--hd", type=int, default=32)
    ap.add_argument("--points", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_llava_tpu.ops.deformable_pallas import (
        multi_scale_deformable_attention_pallas as msda,
    )

    # 800 px encoder geometry (profile_gdino's shape)
    shapes = ((100, 100), (50, 50), (25, 25), (13, 13))
    q = sum(h * w for h, w in shapes)
    b, nh, hd, p = args.b, args.heads, args.hd, args.points
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    value = jnp.asarray(
        rng.standard_normal((b, q, nh, hd)), dtype
    )
    # local raster offsets: each query's reference point is its own
    # raster position, samples within +-4 px (the HF ring-bias regime)
    ref_pts = []
    for h, w in shapes:
        yy, xx = np.mgrid[0:h, 0:w]
        ref_pts.append(
            np.stack([(xx.ravel() + 0.5) / w, (yy.ravel() + 0.5) / h], -1)
        )
    ref = np.concatenate(ref_pts)  # (q, 2) in [0,1]
    off = rng.uniform(-4.0, 4.0, (q, nh, len(shapes), p, 2))
    wh = np.asarray([[w, h] for h, w in shapes], np.float64)
    locs = ref[:, None, None, None, :] + off / wh[None, None, :, None, :]
    locs = jnp.asarray(
        np.broadcast_to(locs[None], (b,) + locs.shape), jnp.float32
    )
    aw = rng.random((b, q, nh, len(shapes), p)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-2, -1), keepdims=True))

    def chain(fn, K):
        x0 = value

        def chained(v):
            def body(i, c):
                out = fn(c)
                return x0 + (out[0, 0, 0] * 0).astype(x0.dtype)

            return fn(jax.lax.fori_loop(0, K - 1, body, x0))

        f = jax.jit(chained)
        r = f(x0)
        np.asarray(r[0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x0)
            np.asarray(r[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    print(f"backend={jax.default_backend()} shape=800px b={b} "
          f"q={q} heads={nh} dtype={args.dtype}")
    times = {}
    for mode in ("", "no_mask", "no_fold", "y_only"):
        t = chain(
            lambda v, m=mode: msda(v, shapes, locs, aw, _ablate=m),
            args.k,
        )
        times[mode or "full"] = t
        print(f"{mode or 'full':8s}: {t * 1e3:7.3f} ms/call", flush=True)
    full = times["full"]
    print(f"x-mask cost   ~ {(full - times['no_mask']) * 1e3:6.3f} ms")
    print(f"fold cost     ~ {(full - times['no_fold']) * 1e3:6.3f} ms")
    print(f"y-dot (+tent) ~ {times['y_only'] * 1e3:6.3f} ms")


if __name__ == "__main__":
    main()

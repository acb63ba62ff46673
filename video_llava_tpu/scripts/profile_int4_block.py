"""On-chip A/B profiler for the int4 MXU block matmul (prefill / b>8 path).

Times `int4_matmul_pallas` on the 7B gate_up shape (D=4096 -> F=22016,
g=128) with the RTT-FREE chained methodology: K data-dependent calls
inside ONE jit through a traced-trip-count fori_loop, timed at TWO
trip counts, and differenced —

    t_call = (T(K2) - T(K1)) / (K2 - K1)

The original burst/K form folded the ~26 ms tunnel RTT of the result
fetch into every estimate as +RTT/K (~+0.87 ms at K=30) — discovered
in round 5 when a DMA-floor probe returned the same "0.87 ms" for
kernels of every size. Differences of same-K measurements were still
valid; ABSOLUTE numbers recorded before round 5 carry that bias.

This is the permanent form of the scratch profiler that round 4 left
half-finished at the repo root (prof_blk2_tmp.py, removed in round 5):
the round-4 snapshot rewrote `_w4_matmul_kernel` from the per-group
K-split form to a scale-expansion-matmul form WITHOUT running this
measurement, and the rewrite regressed every batch size (see ROADMAP
round-5 table) and the driver headline (prefill 50.1 -> 70.2 ms).

Usage: python -m video_llava_tpu.scripts.profile_int4_block [--b 8,32,...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

K1, K2 = 16, 272


def chain_time(fn, w, s, b, d, rng, reps=8):
    import jax
    import jax.numpy as jnp

    x0 = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    def chained(x, k):
        def body(i, c):
            out = fn(c, w, s)
            return x0 + (out[0, 0] * 0).astype(x0.dtype)

        return fn(jax.lax.fori_loop(0, k, body, x0), w, s)

    f = jax.jit(chained)
    for k in (K1, K2):
        np.asarray(f(x0, k)[0, 0])  # compile + warm both trip counts

    best = {K1: float("inf"), K2: float("inf")}
    for _ in range(reps):  # interleave trip counts against clock drift
        for k in (K1, K2):
            t0 = time.perf_counter()
            np.asarray(f(x0, k)[0, 0])
            best[k] = min(best[k], time.perf_counter() - t0)
    return (best[K2] - best[K1]) / (K2 - K1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="8,16,32,64,128,512")
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--f", type=int, default=22016)
    ap.add_argument("--group", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_llava_tpu.ops import quant4 as q4

    rng = np.random.default_rng(0)
    D, F = args.d, args.f
    w = jnp.asarray(rng.integers(-120, 120, (D // 2, F)), jnp.int8)
    s = jnp.asarray(
        rng.random((D // args.group, F)) * 0.01 + 0.001, jnp.float32
    )

    print(f"backend={jax.default_backend()} shape=({D},{F}) g={args.group}")
    impls = {
        "bf16-block": lambda x, w, s: q4.int4_matmul_pallas(
            x, w, s, a8_block=False
        ),
        "a8-block": lambda x, w, s: q4.int4_matmul_pallas(
            x, w, s, a8_block=True
        ),
        "xla-twin": q4.int4_matmul_xla,
    }
    a8_impls = {  # decode path (b <= A8_MAX_BATCH): W4A8 matvec kernel
        "a8-matvec": lambda x, w, s: q4.int4_matmul_pallas(
            x, w, s, a8=True
        ),
    }
    for b in (int(x) for x in args.b.split(",")):
        line = f"b={b:4d}:"
        picks = dict(impls)
        if b <= q4.A8_MAX_BATCH:
            picks.update(a8_impls)
        for name, fn in picks.items():
            t = chain_time(fn, w, s, b, D, rng)
            line += f"  {name} {t * 1e3:7.3f} ms"
        print(line, flush=True)

    # parity spot check vs the XLA twin
    x = jnp.asarray(rng.standard_normal((32, D)), jnp.float32)
    a = np.asarray(q4.int4_matmul_pallas(x, w, s))
    r = np.asarray(q4.int4_matmul_xla(x, w, s))
    cos = float(
        a.ravel() @ r.ravel() / (np.linalg.norm(a) * np.linalg.norm(r))
    )
    print("cos vs xla:", round(cos, 8))


if __name__ == "__main__":
    main()

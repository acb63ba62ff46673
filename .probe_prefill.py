"""Prefill block-kernel formulations at b=512, gate_up shape.

Current a8-block: per-group K-split loop, 2G int8 dots with K=1 tile
each — measured 0.377 ms vs ~0.12 ms analytic int8-MXU floor.
Variants probe where the stall is.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_llava_tpu.ops import quant4 as q4

K1, K2 = 8, 136


def make_chained(fn, x0):
    def chained(x, k):
        def body(i, c):
            out = fn(c)
            return x0 + (out[0, 0] * 0).astype(x0.dtype)

        return fn(jax.lax.fori_loop(0, k, body, x0))

    f = jax.jit(chained)
    for k in (K1, K2):
        np.asarray(f(x0, k)[0, 0])
    return f


def time_once(f, x0, k):
    t0 = time.perf_counter()
    np.asarray(f(x0, k)[0, 0])
    return time.perf_counter() - t0


def kern(x_ref, w_ref, s_ref, o_ref, xq_ref, sx_ref, *, variant,
         groups_half):
    w = w_ref[:]
    dh, bf = w.shape
    d = 2 * dh

    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        x = x_ref[:].astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8
        ) / 127.0
        xq_ref[:] = (
            jnp.clip(jnp.round(x / sx), -127, 127)
            .astype(jnp.int32)
            .astype(jnp.int8)
        )
        sx_ref[:] = sx

    p = w.astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.int8)
    xq = xq_ref[:]
    s = s_ref[:].astype(jnp.float32)
    b = xq.shape[0]
    gh = groups_half
    g = dh // gh

    if variant == "ksplit":  # shipping form
        acc = jnp.zeros((b, bf), jnp.float32)
        for gi in range(gh):
            r0 = gi * g
            acc += s[gi : gi + 1] * jnp.dot(
                xq[:, r0 : r0 + g], lo[r0 : r0 + g],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            acc += s[gh + gi : gh + gi + 1] * jnp.dot(
                xq[:, dh + r0 : dh + r0 + g], hi[r0 : r0 + g],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        o_ref[:] = acc * sx_ref[:]
        return
    if variant == "batched":  # one batched dot_general over 2G groups
        q = jnp.concatenate([lo, hi], axis=0)  # (d, bf)
        xg = xq.reshape(b, 2 * gh, g).swapaxes(0, 1)  # (2G, b, g)
        qg = q.reshape(2 * gh, g, bf)
        parts = jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (2G, b, bf)
        acc = jnp.zeros((b, bf), jnp.float32)
        for gi in range(2 * gh):
            acc += s[gi : gi + 1] * parts[gi]
        o_ref[:] = acc * sx_ref[:]
        return
    if variant == "nogroup":  # G=1 floor: one long-K dot (NOT shippable)
        q = jnp.concatenate([lo, hi], axis=0)
        acc = jnp.dot(xq, q, preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * s[0:1] * sx_ref[:]
        return
    raise ValueError(variant)


def build(variant, x, packed, scales):
    dh, f = packed.shape
    n_groups = scales.shape[0]
    b, d = x.shape
    gh = n_groups // 2
    bf = 512
    return pl.pallas_call(
        functools.partial(kern, variant=variant, groups_half=gh),
        grid=(1, f // bf),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, j: (0, 0)),
            pl.BlockSpec((dh, bf), lambda i, j: (0, j)),
            pl.BlockSpec((n_groups, bf), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, bf), lambda i, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.int8),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x.astype(jnp.float32), packed, scales)


def main():
    rng = np.random.default_rng(0)
    D, F, B = 4096, 22016, 512
    w = jnp.asarray(rng.integers(-120, 120, (D // 2, F)), jnp.int8)
    s = jnp.asarray(rng.random((D // 128, F)) * 0.01 + 0.001, jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    print(f"backend={jax.default_backend()} b={B} gate_up", flush=True)
    fns = {}
    fns["ship"] = make_chained(
        lambda x: q4.int4_matmul_pallas(x, w, s, a8_block=True), x0
    )
    for v in ("ksplit", "batched", "nogroup"):
        try:
            fns[v] = make_chained(
                functools.partial(build, v, packed=w, scales=s), x0
            )
        except Exception as e:
            print(f"  {v} FAILED: {str(e).splitlines()[0][:90]}", flush=True)
    best = {m: {K1: float("inf"), K2: float("inf")} for m in fns}
    for _ in range(8):
        for m in fns:
            for k in (K1, K2):
                best[m][k] = min(best[m][k], time_once(fns[m], x0, k))
    for m in fns:
        t = (best[m][K2] - best[m][K1]) / (K2 - K1)
        print(f"{m:8s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

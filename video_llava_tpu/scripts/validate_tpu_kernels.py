"""On-chip validation for staged Pallas kernels (run on the real TPU).

CPU tests run kernels in interpret mode, which can pass while Mosaic
lowering fails on the chip (see .claude/skills/verify). This script
drives each staged kernel through its first real compile, checks it
against the XLA twin, and times both so the dispatch default can be
flipped with evidence:

    python -m video_llava_tpu.scripts.validate_tpu_kernels [--which ...]

Kernels staged opt-in until this runs green:
  * paged    — ops.attention.decode_attention_mxu_paged
               (flip: ops.attention.enable_paged_kernel())
  * deformable — ops.deformable_pallas
               (flip: ops.deformable.set_default_impl('pallas'))
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, iters=20):
    """Median seconds per call (host-fetch sync; block_until_ready is a
    no-op over the tunneled TPU — utils/timing.py)."""
    from video_llava_tpu.utils.timing import measure

    return measure(lambda i: fn(), iters=iters)


def validate_paged(args):
    from video_llava_tpu.ops.attention import (
        decode_attention,
        decode_attention_mxu_paged,
    )

    rng = np.random.default_rng(0)
    # 7B decode shapes: 32 heads x 128, 64-token blocks, 2048-cap rows
    nl, nb, bs, h, d = 4, 140, 64, 32, 128
    b, maxb = args.batch, 32
    if args.interpret:  # tiny CPU smoke
        nl, nb, bs, h, d, maxb = 2, 10, 16, 4, 32, 4
    # the scrambled tables draw b*maxb DISTINCT non-pad blocks
    nb = max(nb, b * maxb + 5)
    kq = rng.integers(-127, 128, size=(nl, nb, bs, h, d)).astype(np.int8)
    vq = rng.integers(-127, 128, size=(nl, nb, bs, h, d)).astype(np.int8)
    ks = (rng.random((nl, nb, bs, h)).astype(np.float32) + 0.5) / 127
    vs = (rng.random((nl, nb, bs, h)).astype(np.float32) + 0.5) / 127
    table = rng.permutation(nb - 1)[: b * maxb].reshape(b, maxb) + 1
    q = rng.normal(size=(b, 1, h, d)).astype(np.float32)
    lens = np.linspace(maxb * bs // 3, maxb * bs, b).astype(np.int32)

    kq, vq, ks, vs = map(jnp.asarray, (kq, vq, ks, vs))
    table = jnp.asarray(table.astype(np.int32))
    qj, lj = jnp.asarray(q, jnp.bfloat16), jnp.asarray(lens)

    # Arrays go in as jit ARGUMENTS: closing over the ~300 MB cache bakes
    # it into the HLO as constants and overflows the tunnel's
    # remote-compile request limit (HTTP 413).
    def xla(li, kq, vq, ks, vs, table, qj, lj):
        layer_of = lambda a: a[li]
        dense = lambda a: layer_of(a)[table].reshape(
            (b, maxb * bs) + a.shape[3:]
        )
        return decode_attention(
            qj, dense(kq), dense(vq), lj,
            k_scale=dense(ks)[..., None], v_scale=dense(vs)[..., None],
        )

    def pallas(li, kq, vq, ks, vs, table, qj, lj):
        return decode_attention_mxu_paged(
            qj, kq, vq, li, table, lj, k_scale=ks, v_scale=vs,
            interpret=args.interpret,
        )

    operands = (kq, vq, ks, vs, table, qj, lj)
    jx = jax.jit(xla)
    jp = jax.jit(pallas)
    li = jnp.int32(1)
    a = np.asarray(jx(li, *operands), np.float32)
    c = np.asarray(jp(li, *operands), np.float32)  # first Mosaic compile
    cos = float(
        (a.ravel() @ c.ravel())
        / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-9)
    )
    t_x = _time(lambda: jx(li, *operands))
    t_p = _time(lambda: jp(li, *operands))
    out = {
        "kernel": "decode_attention_mxu_paged",
        "batch": b, "block": bs, "heads": h, "cos_vs_xla": round(cos, 6),
        "xla_ms": round(t_x * 1e3, 3), "pallas_ms": round(t_p * 1e3, 3),
    }
    print(json.dumps(out), flush=True)
    assert cos > 0.999, cos
    return out


def validate_deformable(args):
    from video_llava_tpu.ops import deformable
    from video_llava_tpu.ops.deformable import (
        multi_scale_deformable_attention,
    )
    from video_llava_tpu.ops.deformable_pallas import (
        multi_scale_deformable_attention_pallas,
        multi_scale_deformable_attention_pallas_2d,
    )

    # pin the dispatching twin to the XLA gather formulation (on TPU
    # 'auto' would otherwise route it to the kernel under test)
    prev_impl = deformable._DEFAULT_IMPL
    deformable.set_default_impl("xla")

    rng = np.random.default_rng(1)
    # GroundingDINO encoder shape at 800px (the hot config)
    shapes = ((100, 100), (50, 50), (25, 25), (13, 13))
    if args.interpret:  # tiny CPU smoke
        shapes = ((12, 12), (6, 6))
    lq = sum(h * w for h, w in shapes)
    b, nh, hd, npts = 1, 8, 32, 4
    value = jnp.asarray(
        rng.normal(size=(b, lq, nh, hd)).astype(np.float32), jnp.bfloat16
    )
    if args.locs == "local":
        # The encoder regime (grounding_dino._deformable_attention):
        # raster reference points + pixel-unit offsets normalized per
        # level — the case the dynamic row-window kernel targets.
        refs = []
        for h, w in shapes:
            ys = (np.arange(h) + 0.5) / h
            xs = (np.arange(w) + 0.5) / w
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
        ref_pts = np.concatenate(refs)  # (lq, 2)
        offs = (
            rng.normal(size=(b, lq, nh, len(shapes), npts, 2))
            * args.off_sigma
        )
        norm = np.asarray([[w, h] for (h, w) in shapes], np.float32)
        locs = jnp.asarray(
            (ref_pts[None, :, None, None, None] + offs / norm[:, None])
            .astype(np.float32)
        )
    else:
        locs = jnp.asarray(
            rng.random((b, lq, nh, len(shapes), npts, 2)).astype(np.float32)
        )
    attw = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, lq, nh, len(shapes), npts)).astype(np.float32)
    ), axis=-1)

    f_x = jax.jit(lambda v, l, w: multi_scale_deformable_attention(
        v, shapes, l, w
    ))
    f_p = jax.jit(lambda v, l, w: multi_scale_deformable_attention_pallas(
        v, shapes, l, w, interpret=args.interpret
    ))
    f_2d = jax.jit(
        lambda v, l, w: multi_scale_deformable_attention_pallas_2d(
            v, shapes, l, w, interpret=args.interpret
        )
    )
    a = np.asarray(f_x(value, locs, attw), np.float32)
    c = np.asarray(f_p(value, locs, attw), np.float32)
    d = np.asarray(f_2d(value, locs, attw), np.float32)

    def _cos(x, y):
        return float(
            (x.ravel() @ y.ravel())
            / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9)
        )

    cos = _cos(a, c)
    cos2d = _cos(a, d)
    t_x = _time(lambda: f_x(value, locs, attw), iters=10)
    t_p = _time(lambda: f_p(value, locs, attw), iters=10)
    t_2d = _time(lambda: f_2d(value, locs, attw), iters=10)
    out = {
        "kernel": "deformable_attention_pallas", "queries": lq,
        "locs": args.locs, "off_sigma": args.off_sigma,
        "cos_vs_xla": round(cos, 6), "cos_2d_vs_xla": round(cos2d, 6),
        "xla_ms": round(t_x * 1e3, 3), "pallas_ms": round(t_p * 1e3, 3),
        "pallas_2d_ms": round(t_2d * 1e3, 3),
    }
    print(json.dumps(out), flush=True)
    deformable.set_default_impl(prev_impl)
    assert cos > 0.99, cos
    assert cos2d > 0.99, cos2d
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=["all", "paged", "deformable"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--locs", default="local",
                    choices=["local", "uniform"],
                    help="deformable sampling-location regime: 'local' "
                    "mirrors the encoder (raster refs + pixel-unit "
                    "offsets); 'uniform' is the worst case for the "
                    "row-window kernel")
    ap.add_argument("--off_sigma", type=float, default=4.0,
                    help="pixel-unit offset sigma for --locs local "
                    "(trained GDINO offsets are typically a few px)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke (forces the cpu backend + interpret "
                    "mode; timings meaningless)")
    args = ap.parse_args(argv)
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    if args.which in ("all", "paged"):
        validate_paged(args)
    if args.which in ("all", "deformable"):
        validate_deformable(args)


if __name__ == "__main__":
    main()

"""Stage-by-stage on-chip decomposition of the GroundingDINO forward.

Times successive prefixes of `grounding_dino._forward_device` (the
`stage` knob) at the shipped 800 px config and prints the per-stage
deltas, so kernel work targets the measured hot stage instead of a
guess. The reference's equivalent forward is the CUDA
groundingdino.predict at grounding_evaluation/grounding_new_api.py:288.

Usage (TPU): python -m video_llava_tpu.scripts.profile_gdino [--batch 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models import grounding_dino as gdino_mod
from video_llava_tpu.ops.image import normalize_clip, resize_bicubic
from video_llava_tpu.utils.timing import measure

STAGES = ("text", "backbone", "encoder", "two_stage", None)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_full"],
                    help="deformable-attention dispatch: 'pallas_full' "
                    "pins the full-width kernel (tile2d off)")
    args = ap.parse_args(argv)

    from video_llava_tpu.ops import deformable

    if args.impl == "pallas_full":
        deformable.set_default_impl("pallas")
        deformable.set_tile2d(False)
    elif args.impl != "auto":
        deformable.set_default_impl(args.impl)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(480, 832, 3)).astype(np.uint8)
    detector = gdino_mod.build_detector(None)
    detector.params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, detector.params
    )
    dsize = detector.image_size
    pixels = normalize_clip(
        jnp.clip(jnp.round(resize_bicubic(
            jnp.asarray(frame.astype(np.float32)), dsize, dsize
        )), 0, 255)
    )[None].astype(jnp.bfloat16)
    pixels = jnp.tile(pixels, (args.batch, 1, 1, 1))
    ids = np.asarray([detector.tokenize("person . dog .")], np.int64)
    ids = np.repeat(ids, args.batch, axis=0)
    mask = np.ones_like(ids)
    self_mask, pos_ids = gdino_mod.generate_text_masks(ids)
    dev_args = (
        detector.params, detector.cfg, pixels, jnp.asarray(ids),
        jnp.asarray(mask == 0), jnp.asarray(self_mask),
        jnp.asarray(pos_ids), jnp.asarray(mask == 1),
    )

    prev = 0.0
    out = {"batch": args.batch, "image_size": dsize}
    for st in STAGES:
        fn = lambda i: gdino_mod._forward_device(  # noqa: E731
            dev_args[0], dev_args[1], dev_args[2] + i * 1e-9,
            *dev_args[3:], stage=st,
        )[0]
        t = measure(fn, iters=args.iters)
        name = st or "full"
        out[f"cum_{name}_ms"] = round(t * 1e3, 1)
        out[f"delta_{name}_ms"] = round((t - prev) * 1e3, 1)
        prev = t
        print(json.dumps(out), flush=True)
    out["per_frame_ms"] = round(prev * 1e3 / args.batch, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

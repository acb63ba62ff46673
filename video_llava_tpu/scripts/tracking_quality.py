"""Synthetic J&F tracking-quality benchmark (VERDICT r2 item 8).

Quantifies mask-propagation quality — handcrafted-feature STM vs the
learned XMem network (briefly trained here; real checkpoints drop in
via convert_xmem_checkpoint) — on procedurally generated clips covering
the classic failure modes of appearance tracking:

  * translation        smooth motion, static background (sanity)
  * occlusion          a bar occludes part of the object mid-clip
  * appearance_change  the object recolors mid-clip while a distractor
                       in the OLD color appears near the old position
                       (the shape-cue problem of tests/test_xmem.py)
  * camera_motion      the whole scene translates (global motion)
  * distractor         an identical-looking object crosses the target

Protocol per clip: the tracker receives frame 0 + its ground-truth mask
as the reference, then propagates through the remaining frames with its
shipped memory cadence. J = mean IoU of thresholded masks vs GT over
frames 1..L-1; F = mean boundary F-measure (2 px tolerance) — the
DAVIS-style J&F pair, on synthetic clips (no real-video benchmark is
runnable in this zero-egress environment; the reference defers this
entirely to DEVA, grounding_new_api.py:503-509, and publishes figures
only).

Run:  python -m video_llava_tpu.scripts.tracking_quality
      [--train_steps 150] [--clips 3] [--frames 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Dict, List, Tuple

import numpy as np

H = W = 64
OBJ_R = 8
# Inverse positive-class frequency of the synthetic suite (a r=8 disc
# in 64x64 is ~5% of pixels); used to balance the brief-training BCE.
POS_WEIGHT = 19.0


# -- clip generators -----------------------------------------------------------


def _background(rng) -> np.ndarray:
    """Low-amplitude textured background (so camera motion is visible)."""
    base = rng.uniform(0.10, 0.25, size=(H, W, 1)).astype(np.float32)
    tex = rng.normal(0, 0.02, size=(H, W, 3)).astype(np.float32)
    return np.clip(base + tex, 0, 1)


def _draw_circle(img, cy, cx, r, color):
    yy, xx = np.mgrid[:H, :W]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img[m] = color
    return m.astype(np.float32)


def _draw_square(img, cy, cx, r, color):
    y0, y1 = max(cy - r, 0), min(cy + r, H)
    x0, x1 = max(cx - r, 0), min(cx + r, W)
    img[y0:y1, x0:x1] = color
    m = np.zeros((H, W), np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def _lerp(a, b, t):
    return a + (b - a) * t


def clip_translation(rng, n):
    bg = _background(rng)
    color = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
    frames, gts = [], []
    for t in range(n):
        f = bg.copy()
        u = t / max(n - 1, 1)
        cy, cx = int(_lerp(14, 48, u)), int(_lerp(12, 50, u))
        m = _draw_circle(f, cy, cx, OBJ_R, color)
        frames.append(f)
        gts.append(m)
    return frames, gts


def clip_occlusion(rng, n):
    bg = _background(rng)
    color = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
    bar_color = rng.uniform(0.0, 0.15, size=3).astype(np.float32)
    bar_x0, bar_x1 = 28, 38
    frames, gts = [], []
    for t in range(n):
        f = bg.copy()
        u = t / max(n - 1, 1)
        cy, cx = 32, int(_lerp(12, 52, u))
        m = _draw_circle(f, cy, cx, OBJ_R, color)
        # occluder drawn ON TOP; GT = visible object pixels
        f[:, bar_x0:bar_x1] = bar_color
        m[:, bar_x0:bar_x1] = 0.0
        frames.append(f)
        gts.append(m)
    return frames, gts


def clip_appearance_change(rng, n):
    bg = _background(rng)
    c_old = np.asarray([0.1, 0.2, 0.9], np.float32)
    c_new = np.asarray([0.1, 0.9, 0.2], np.float32)
    frames, gts = [], []
    for t in range(n):
        f = bg.copy()
        u = t / max(n - 1, 1)
        cy, cx = int(_lerp(16, 44, u)), int(_lerp(16, 44, u))
        color = c_old if t < n // 2 else c_new
        if t >= n // 2:
            # old-color square near the object's OLD position
            _draw_square(f, 20, 20, 7, c_old)
        m = _draw_circle(f, cy, cx, OBJ_R, color)
        frames.append(f)
        gts.append(m)
    return frames, gts


def clip_camera_motion(rng, n):
    bg = _background(rng)
    color = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
    scene = bg.copy()
    m0 = _draw_circle(scene, 30, 30, OBJ_R, color)
    frames, gts = [], []
    for t in range(n):
        dy, dx = 2 * t, 3 * t
        frames.append(np.roll(scene, (dy, dx), axis=(0, 1)).copy())
        gts.append(np.roll(m0, (dy, dx), axis=(0, 1)).copy())
    return frames, gts


def clip_distractor(rng, n):
    bg = _background(rng)
    color = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
    frames, gts = [], []
    for t in range(n):
        f = bg.copy()
        u = t / max(n - 1, 1)
        # target: left -> right along y=24; distractor: right -> left
        # along y=40 (identical appearance, paths nearby but disjoint)
        ty, tx = 24, int(_lerp(12, 52, u))
        dy, dx = 40, int(_lerp(52, 12, u))
        _draw_circle(f, dy, dx, OBJ_R, color)
        m = _draw_circle(f, ty, tx, OBJ_R, color)
        frames.append(f)
        gts.append(m)
    return frames, gts


CLIP_KINDS: Dict[str, Callable] = {
    "translation": clip_translation,
    "occlusion": clip_occlusion,
    "appearance_change": clip_appearance_change,
    "camera_motion": clip_camera_motion,
    "distractor": clip_distractor,
}


# -- metrics --------------------------------------------------------------------


def iou(pred: np.ndarray, gt: np.ndarray) -> float:
    p, g = pred > 0.5, gt > 0.5
    union = np.logical_or(p, g).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(p, g).sum() / union)


def _boundary(mask: np.ndarray) -> np.ndarray:
    m = mask > 0.5
    er = np.zeros_like(m)
    er[1:-1, 1:-1] = (
        m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1]
        & m[1:-1, :-2] & m[1:-1, 2:]
    )
    return m & ~er


def _dilate(b: np.ndarray, it: int) -> np.ndarray:
    for _ in range(it):
        b = (
            b
            | np.roll(b, 1, 0) | np.roll(b, -1, 0)
            | np.roll(b, 1, 1) | np.roll(b, -1, 1)
        )
    return b


def boundary_f(pred: np.ndarray, gt: np.ndarray, tol: int = 2) -> float:
    """DAVIS-style contour F-measure with a dilation tolerance band."""
    pb, gb = _boundary(pred), _boundary(gt)
    np_, ng = pb.sum(), gb.sum()
    if np_ == 0 and ng == 0:
        return 1.0
    if np_ == 0 or ng == 0:
        return 0.0
    prec = float((pb & _dilate(gb, tol)).sum() / np_)
    rec = float((gb & _dilate(pb, tol)).sum() / ng)
    return 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)


# -- evaluation ------------------------------------------------------------------


def evaluate_tracker(
    make_tracker: Callable[[], object],
    clips: Dict[str, List[Tuple[list, list]]],
) -> Dict[str, Dict[str, float]]:
    """make_tracker() -> object with add_reference(frame, masks) and
    step(frame) -> (max_objects, H, W); fresh instance per clip."""
    out = {}
    for kind, kind_clips in clips.items():
        js, fs = [], []
        for frames, gts in kind_clips:
            tr = make_tracker()
            tr.add_reference(frames[0], gts[0][None])
            for f, g in zip(frames[1:], gts[1:]):
                pred = np.asarray(tr.step(f))[0]
                js.append(iou(pred, g))
                fs.append(boundary_f(pred > 0.5, g))
        out[kind] = {
            "J": float(np.mean(js)),
            "F": float(np.mean(fs)),
            "JF": float((np.mean(js) + np.mean(fs)) / 2),
        }
    out["mean"] = {
        k: float(np.mean([v[k] for kk, v in out.items() if kk != "mean"]))
        for k in ("J", "F", "JF")
    }
    return out


def evaluate_tracker_fused(
    make_propagator: Callable[[], object],
    clips: Dict[str, List[Tuple[list, list]]],
) -> Dict[str, Dict[str, float]]:
    """Same protocol, but driven through the PUBLIC product dispatch
    (GroundedTracker.run_on_list_of_images -> the fused whole-clip
    program) instead of the propagator object (VERDICT r4 #7): an
    oracle detector/segmenter injects the GT mask at frame 0, the rest
    of the clip propagates inside the fused program. make_propagator()
    -> LearnedMemoryTracker | None (None = handcrafted STM)."""
    from video_llava_tpu.grounding.memory_tracker import TrackerConfig
    from video_llava_tpu.grounding.tracker import GroundedTracker

    out = {}
    for kind, kind_clips in clips.items():
        js, fs = [], []
        for frames, gts in kind_clips:
            gt0 = np.asarray(gts[0])
            ys, xs = np.nonzero(gt0 > 0.5)
            box = np.asarray(
                [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                np.float32,
            )

            class OracleDet:
                calls = 0

                def __call__(self, image, prompts):
                    first = self.calls == 0
                    self.calls += 1
                    if first:
                        return (
                            box,
                            np.asarray([0.9], np.float32),
                            np.asarray([0], np.int64),
                        )
                    return (
                        np.zeros((0, 4), np.float32),
                        np.zeros((0,), np.float32),
                        np.zeros((0,), np.int64),
                    )

            class OracleSeg:
                def __call__(self, image, boxes):
                    return gt0[None].astype(np.float32)

            tr = GroundedTracker(
                detector=OracleDet(),
                segmenter=OracleSeg(),
                detection_every=len(frames),  # frame 0 only
                box_threshold=0.0,
                tracker_cfg=TrackerConfig(max_objects=2),
                propagator=make_propagator(),
                binary_masks=False,
                detect_batch_size=1,
            )
            assert tr.fused_eligible(), "not measuring the fused path"
            res = tr.run_on_list_of_images(
                [np.asarray(f, np.float32) for f in frames], ["object"]
            )
            for r, g in zip(res[1:], gts[1:]):
                pred = np.asarray(r.masks)[0]
                js.append(iou(pred, g))
                fs.append(boundary_f(pred > 0.5, g))
        out[kind] = {
            "J": float(np.mean(js)),
            "F": float(np.mean(fs)),
            "JF": float((np.mean(js) + np.mean(fs)) / 2),
        }
    out["mean"] = {
        k: float(np.mean([v[k] for kk, v in out.items() if kk != "mean"]))
        for k in ("J", "F", "JF")
    }
    return out


def make_clips(seed: int, clips_per_kind: int, n_frames: int):
    rng = np.random.default_rng(seed)
    return {
        kind: [gen(rng, n_frames) for _ in range(clips_per_kind)]
        for kind, gen in CLIP_KINDS.items()
    }


# -- brief XMem training -----------------------------------------------------------


def brief_train_xmem(cfg, train_clips, steps: int, lr: float = 1e-4,
                     seed: int = 0, log_every: int = 25):
    """A few Adam steps of next-frame propagation BCE on training clips
    DISJOINT from the eval set (different generator seed). Stands in
    for a real XMem checkpoint in this zero-egress environment — the
    point of the benchmark is the ARCHITECTURE comparison (learned vs
    handcrafted features), not SOTA numbers."""
    import jax
    import jax.numpy as jnp
    import optax

    from video_llava_tpu.models import xmem

    params = jax.jit(
        lambda k: xmem.init_params(k, cfg, jnp.float32)
    )(jax.random.PRNGKey(seed))

    # training pairs: (ref frame, ref mask, query frame, query mask)
    pairs = []
    for kind_clips in train_clips.values():
        for frames, gts in kind_clips:
            for t in range(1, len(frames)):
                pairs.append((frames[0], gts[0], frames[t], gts[t]))
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))

    def loss_fn(params, f0, m0, f1, m1):
        state = xmem.init_state(cfg, H // 16, W // 16)
        masks0 = jnp.zeros((cfg.max_objects, H, W)).at[0].set(m0)
        state = xmem.add_reference_step(
            params, state, f0, masks0, jnp.int32(1), cfg
        )
        # Same path as propagate_step, stopped at the raw decoder
        # LOGITS: the shipped prob goes sigmoid -> soft-aggregate,
        # which underflows to exact 0/1 within one optimizer step at
        # random init — log(p+eps) then has exactly-zero gradients and
        # all-background becomes an inescapable stationary point. BCE
        # in logit space never underflows.
        f16, f8, f4, key, shrinkage, selection = xmem.encode_key(
            params, f1
        )
        h16, w16 = key.shape[:2]
        n = h16 * w16
        readout = xmem.read_memory(
            state.keys.reshape(-1, cfg.key_dim),
            state.shrinkage.reshape(-1),
            state.values.reshape(-1, cfg.max_objects, cfg.value_dim),
            jnp.repeat(state.slot_valid, n),
            key.reshape(n, -1),
            selection.reshape(n, -1),
            cfg.top_k,
        ).transpose(1, 0, 2).reshape(
            cfg.max_objects, h16, w16, cfg.value_dim
        )
        logits, _ = xmem.decode(
            params, f16, f8, f4, state.hidden, readout,
            update_hidden=False,
        )
        z = logits[0]
        # pos-weighted BCE (objects ~5% of pixels) + soft Dice.
        bce_pix = jnp.maximum(z, 0) - z * m1 + jnp.log1p(jnp.exp(-jnp.abs(z)))
        w = 1.0 + (POS_WEIGHT - 1.0) * m1
        bce = jnp.sum(w * bce_pix) / jnp.sum(w)
        p = jax.nn.sigmoid(z)
        dice = 1.0 - (2 * jnp.sum(p * m1) + 1.0) / (
            jnp.sum(p) + jnp.sum(m1) + 1.0
        )
        return bce + dice

    # Gradients through the memory read + grouped decoder are large at
    # random init (global norms in the thousands), and Adam moves EVERY
    # param by ~lr per step — on a 45M-param net one too-big step
    # saturates the output. Clip + warmup-cosine keeps the first steps
    # gentle; the logit-space loss keeps gradients alive regardless.
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(20, max(steps // 5, 1)),
        decay_steps=max(steps, 2),
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, f0, m0, f1, m1):
        loss, grads = jax.value_and_grad(loss_fn)(params, f0, m0, f1, m1)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        f0, m0, f1, m1 = pairs[order[i % len(pairs)]]
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(f0), jnp.asarray(m0),
            jnp.asarray(f1), jnp.asarray(m1),
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"  train step {i + 1}/{steps} loss={float(loss):.4f}",
                  flush=True)
    return params


def format_table(results: Dict[str, Dict[str, Dict[str, float]]]) -> str:
    kinds = list(CLIP_KINDS) + ["mean"]
    trackers = list(results)
    lines = ["| clip | " + " | ".join(
        f"{t} J / F" for t in trackers) + " |"]
    lines.append("|" + "---|" * (len(trackers) + 1))
    for k in kinds:
        row = [k]
        for t in trackers:
            r = results[t][k]
            row.append(f"{r['J']:.2f} / {r['F']:.2f}")
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=150)
    p.add_argument("--clips", type=int, default=3, help="clips per kind")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default=None)
    p.add_argument("--xmem_checkpoint", default=None,
                   help="real XMem .pth (skips the brief training)")
    p.add_argument("--lt_frames", type=int, default=0,
                   help="also evaluate LONG clips of this many frames "
                        "with the working ring alone vs ring + "
                        "long-term prototype memory (XMemConfig."
                        "lt_slots) — the >100-frame regime the "
                        "mid-term ring alone cannot cover")
    p.add_argument("--lt_slots", type=int, default=256)
    p.add_argument("--lt_prototypes", type=int, default=16)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from video_llava_tpu.grounding.memory_tracker import (
        LearnedMemoryTracker,
        MemoryTracker,
        TrackerConfig,
    )
    from video_llava_tpu.models import xmem

    eval_clips = make_clips(args.seed + 1000, args.clips, args.frames)
    cfg = xmem.XMemConfig(max_objects=2, mem_slots=3, top_k=8)

    results = {}
    print("evaluating handcrafted STM...", flush=True)
    results["handcrafted"] = evaluate_tracker(
        lambda: MemoryTracker(TrackerConfig(max_objects=2)), eval_clips
    )

    if args.xmem_checkpoint:
        import torch

        sd = torch.load(args.xmem_checkpoint, map_location="cpu",
                        weights_only=True)
        if isinstance(sd, dict) and "network" in sd:
            sd = sd["network"]
        params = xmem.convert_xmem_checkpoint(sd, cfg)
        label = "xmem(ckpt)"
    else:
        print(f"briefly training XMem ({args.train_steps} steps)...",
              flush=True)
        train_clips = make_clips(args.seed, args.clips, args.frames)
        params = brief_train_xmem(cfg, train_clips, args.train_steps,
                                  seed=args.seed)
        label = "xmem(brief)"
    print("evaluating learned propagation...", flush=True)
    results[label] = evaluate_tracker(
        lambda: LearnedMemoryTracker(params, cfg), eval_clips
    )
    # the same propagators through the PUBLIC fused dispatch — the
    # program the product actually ships (chat/eval) — so the J&F
    # table certifies quality of the fused path, not just the
    # propagator object (VERDICT r4 #7)
    print("evaluating fused dispatch (handcrafted STM)...", flush=True)
    results["handcrafted(fused)"] = evaluate_tracker_fused(
        lambda: None, eval_clips
    )
    print("evaluating fused dispatch (learned)...", flush=True)
    results[label + "(fused)"] = evaluate_tracker_fused(
        lambda: LearnedMemoryTracker(params, cfg), eval_clips
    )

    if args.lt_frames:
        import dataclasses as dc

        long_clips = make_clips(args.seed + 2000, args.clips,
                                args.lt_frames)
        cfg_lt = dc.replace(cfg, lt_slots=args.lt_slots,
                            lt_prototypes=args.lt_prototypes)
        tag = f"{args.lt_frames}f"
        print(f"evaluating {tag} clips, ring only...", flush=True)
        results[f"xmem(ring,{tag})"] = evaluate_tracker(
            lambda: LearnedMemoryTracker(params, cfg), long_clips
        )
        print(f"evaluating {tag} clips, ring + long-term...", flush=True)
        results[f"xmem(+LT,{tag})"] = evaluate_tracker(
            lambda: LearnedMemoryTracker(params, cfg_lt), long_clips
        )

    print()
    print(format_table(results))
    summary = {
        "metric": "tracking_jf_mean",
        "value": round(results[label]["mean"]["JF"], 4),
        "unit": "J&F (synthetic suite)",
        "fused_jf_mean": round(results[label + "(fused)"]["mean"]["JF"], 4),
        "detail": results,
    }
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

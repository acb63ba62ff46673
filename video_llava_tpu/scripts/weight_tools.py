"""Weight tooling: delta computation and checkpoint consolidation.

Parity: reference video_chatgpt/model/make_delta.py:12-39 (target -
base weight diff, with top-left-corner subtraction for resized
embeddings) and consolidate.py:12-17 (re-save). Operates on flat
state-dict files (torch .bin / safetensors / npz) so it serves both
torch-era checkpoints and our JAX exports.

Run: python -m video_llava_tpu.scripts.weight_tools make-delta \
    --base b.bin --target t.bin --delta d.npz
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

RESIZED_KEYS = ("model.embed_tokens.weight", "lm_head.weight")
PROJECTOR_KEYS = ("model.mm_projector.weight", "model.mm_projector.bias")


def _load(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    from video_llava_tpu.engine.weights import load_torch_bin

    return load_torch_bin(path)


def _save(path: str, sd: Dict[str, np.ndarray]) -> None:
    if path.endswith(".npz"):
        np.savez(path, **sd)
    elif path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(sd, path)
    else:
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   path)


def make_delta(base: Dict[str, np.ndarray], target: Dict[str, np.ndarray]):
    """delta = target - base; resized embeddings subtract in the
    top-left corner; projector keys pass through."""
    delta = {}
    for name, param in target.items():
        if name not in base:
            assert name in PROJECTOR_KEYS or "mm_projector" in name, (
                f"{name} not in base model"
            )
            delta[name] = param
            continue
        b = base[name]
        if param.shape == b.shape:
            delta[name] = param - b
        else:
            assert name in RESIZED_KEYS, f"{name} dimension mismatch"
            d = param.copy()
            d[: b.shape[0], : b.shape[1]] -= b
            delta[name] = d
    return delta


def apply_delta(base: Dict[str, np.ndarray], delta: Dict[str, np.ndarray]):
    """Inverse of make_delta."""
    out = {}
    for name, d in delta.items():
        if name not in base:
            out[name] = d
            continue
        b = base[name]
        if d.shape == b.shape:
            out[name] = d + b
        else:
            assert name in RESIZED_KEYS, f"{name} dimension mismatch"
            t = d.copy()
            t[: b.shape[0], : b.shape[1]] += b
            out[name] = t
    return out


def consolidate(src_path: str, dst_path: str) -> None:
    """Load + re-save (reference consolidate.py:12-17)."""
    _save(dst_path, _load(src_path))


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("make-delta")
    d.add_argument("--base", required=True)
    d.add_argument("--target", required=True)
    d.add_argument("--delta", required=True)
    a = sub.add_parser("apply-delta")
    a.add_argument("--base", required=True)
    a.add_argument("--delta", required=True)
    a.add_argument("--target", required=True)
    c = sub.add_parser("consolidate")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    args = p.parse_args(argv)

    if args.cmd == "make-delta":
        _save(args.delta, make_delta(_load(args.base), _load(args.target)))
    elif args.cmd == "apply-delta":
        _save(args.target, apply_delta(_load(args.base), _load(args.delta)))
    else:
        consolidate(args.src, args.dst)
    print("done")


if __name__ == "__main__":
    main()

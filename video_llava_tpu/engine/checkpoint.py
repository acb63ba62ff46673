"""Checkpointing: Orbax full-state save/resume + the reference's
projector-only export.

Parity: VideoChatGPTTrainer._save keeps ONLY mm_projector / embed_tokens
keys and writes `mm_projector/checkpoint-{N}.bin` or `mm_projector.bin`
(video_chatgpt/train/llava_trainer.py:24-48); training resumes from the
newest `checkpoint-*` (train/train.py:557-560).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np

import jax


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Orbax save under {ckpt_dir}/checkpoint-{step}."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint-{step}"))
    ckptr = ocp.StandardCheckpointer()
    # Re-saving the same step must be idempotent (the final save after
    # the epoch loop collides with a periodic one whenever total_steps
    # is a multiple of save_steps); Orbax refuses to overwrite.
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest checkpoint-* dir (reference resume glob semantics)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(ckpt_dir, name), int(m.group(1))
    return best


def restore_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def export_projector(
    params, out_path: str, include_embeddings: bool = True
) -> None:
    """Write the reference-compatible projector checkpoint: a torch .bin
    with 'model.mm_projector.{weight,bias}' (+ 'model.embed_tokens.
    weight'), loadable by the reference's initialize_vision_modules /
    load_state_dict(strict=False) path."""
    import torch

    sd = {}
    layers = params["projector"].get("layers", [])
    if len(layers) == 1:
        sd["model.mm_projector.weight"] = torch.from_numpy(
            np.asarray(layers[0]["kernel"], np.float32).T.copy()
        )
        sd["model.mm_projector.bias"] = torch.from_numpy(
            np.asarray(layers[0]["bias"], np.float32)
        )
    else:
        for i, layer in enumerate(layers):
            sd[f"model.mm_projector.{2 * i}.weight"] = torch.from_numpy(
                np.asarray(layer["kernel"], np.float32).T.copy()
            )
            sd[f"model.mm_projector.{2 * i}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"], np.float32)
            )
    if include_embeddings:
        sd["model.embed_tokens.weight"] = torch.from_numpy(
            np.asarray(params["llm"]["embed_tokens"]["weight"], np.float32)
        )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    torch.save(sd, out_path)

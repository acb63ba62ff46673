"""Quantization-format selection backed by the preflight record.

`scripts/validate_quant_quality --preflight --record` measures
int8/int4 quality deltas vs bf16 on a real checkpoint and writes a
`quant_preflight.json` record next to the weights. This module closes
the loop (VERDICT r3 #8): serving/bench configs say `--quant auto`
and get the RECORDED decision, and an explicit `--quant int4` REFUSES
to run against real weights without a record approving int4 — int4's
quality is checkpoint-dependent in a way int8's is not, so it never
ships unvalidated.

The reference never quantizes (Vicuna fp16 end to end,
video_chatgpt/eval/model_utils.py:82-150); this machinery exists
because our speed headline rides int4 weights.
"""

from __future__ import annotations

import json
import os
from typing import Optional

RECORD_NAME = "quant_preflight.json"


def record_path(weights_dir: str) -> str:
    return os.path.join(weights_dir, RECORD_NAME)


def load_preflight(weights_dir: Optional[str]) -> Optional[dict]:
    """The preflight record for a checkpoint dir, or None."""
    if not weights_dir:
        return None
    path = record_path(weights_dir)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        rec = json.load(f)
    if "preflight_llm_format" not in rec:
        raise ValueError(
            f"{path} is not a preflight record (missing "
            "'preflight_llm_format') — regenerate with "
            "validate_quant_quality --preflight --record"
        )
    return rec


def resolve_quant(
    quant: Optional[str], weights_dir: Optional[str]
) -> Optional[str]:
    """Resolve a --quant argument against the checkpoint's preflight
    record -> 'int8' | 'int4' | None (bf16).

    * None -> None.
    * 'auto' -> the recorded decision ('bf16' maps to None). A real
      checkpoint without a record is an error (run the preflight);
      random weights (weights_dir None) default to int8 — the format
      whose quality loss is checkpoint-independent in practice.
    * 'int4' -> requires a record approving int4 for real weights
      (air-gapped smoke runs without weights stay allowed).
    * 'int8' -> always allowed (logged caveats live in README).
    """
    if quant is None:
        return None
    if quant not in ("auto", "int8", "int4"):
        raise ValueError(f"unknown quant {quant!r}")
    rec = load_preflight(weights_dir)
    if quant == "auto":
        if weights_dir is None:
            return "int8"
        if rec is None:
            raise FileNotFoundError(
                f"--quant auto needs {record_path(weights_dir)}; run "
                "python -m video_llava_tpu.scripts.validate_quant_quality "
                f"--weights {weights_dir} --preflight --record first"
            )
        fmt = rec["preflight_llm_format"]
        return None if fmt == "bf16" else fmt
    if quant == "int4" and weights_dir is not None:
        _require_int4(rec, weights_dir)
    return quant


def resolve_clip_dtype(
    clip_dtype: Optional[str], weights_dir: Optional[str]
) -> str:
    """Resolve a CLIP-tower dtype request against the preflight record
    -> 'bf16' | 'int8'.

    * None / 'bf16' -> bf16 (the default: bit-parity with the
      reference extractor, scripts/save_spatio_temporal_clip_features
      .py:116-121, is the quality north star).
    * 'auto' -> the recorded `preflight_vision_format` when the record
      has one (validate_quant_quality --vision), else bf16 — unlike
      the LLM 'auto', a missing vision entry falls back conservatively
      instead of erroring, because bf16 is always quality-safe.
    * 'int8' -> W8A8 CLIP; for real weights requires a record whose
      vision gate approved int8 (mirrors the LLM int4 rule — the
      feature-cosine loss is checkpoint-dependent).
    """
    if clip_dtype in (None, "bf16"):
        return "bf16"
    if clip_dtype not in ("auto", "int8"):
        raise ValueError(f"unknown clip dtype {clip_dtype!r}")
    rec = load_preflight(weights_dir)
    fmt = (rec or {}).get("preflight_vision_format")
    if clip_dtype == "auto":
        return fmt if fmt in ("bf16", "int8") else "bf16"
    if weights_dir is not None:
        if fmt is None:
            raise FileNotFoundError(
                "--clip int8 without a vision preflight entry: run "
                "validate_quant_quality --vision --preflight --record "
                f"for {weights_dir} first (or use bf16/auto)"
            )
        if fmt != "int8":
            raise ValueError(
                f"vision preflight chose {fmt!r}, refusing int8 CLIP "
                "(rerun the preflight with looser --min_vision_cos if "
                "intentional)"
            )
    return "int8"


def _require_int4(rec, weights_dir):
    if rec is None:
        raise FileNotFoundError(
            "--quant int4 without a preflight record: int4 quality "
            "is checkpoint-dependent. Run validate_quant_quality "
            "--preflight --record (or use --quant auto / int8). "
            f"Expected record: {record_path(weights_dir)}"
        )
    if rec["preflight_llm_format"] != "int4":
        raise ValueError(
            f"preflight record chose "
            f"{rec['preflight_llm_format']!r}, refusing --quant "
            "int4 (override by rerunning the preflight with looser "
            "thresholds if intentional)"
        )

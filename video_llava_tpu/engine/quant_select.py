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
    return quant

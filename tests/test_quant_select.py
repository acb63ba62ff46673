"""Preflight-gated quantization selection (engine/quant_select.py):
'--quant auto' pins the recorded decision; int4 refuses to run against
real weights without a record approving it (VERDICT r3 #8)."""

import json

import pytest

from video_llava_tpu.engine.quant_select import (
    RECORD_NAME,
    load_preflight,
    record_path,
    resolve_quant,
)


def _write_record(tmp_path, fmt):
    p = tmp_path / RECORD_NAME
    p.write_text(json.dumps({
        "preflight_llm_format": fmt,
        "max_ppl_delta_pct": 1.0,
        "min_top1": 0.97,
    }))
    return str(tmp_path)


def test_none_passthrough(tmp_path):
    assert resolve_quant(None, str(tmp_path)) is None
    assert resolve_quant(None, None) is None


def test_auto_reads_record(tmp_path):
    d = _write_record(tmp_path, "int4")
    assert resolve_quant("auto", d) == "int4"
    d = _write_record(tmp_path, "int8")
    assert resolve_quant("auto", d) == "int8"
    d = _write_record(tmp_path, "bf16")
    assert resolve_quant("auto", d) is None  # bf16 -> no quantization


def test_auto_without_record_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="preflight"):
        resolve_quant("auto", str(tmp_path))


def test_auto_random_weights_defaults_int8():
    # air-gapped smoke (no checkpoint): int8, the checkpoint-
    # independent format
    assert resolve_quant("auto", None) == "int8"


def test_int4_requires_approving_record(tmp_path):
    with pytest.raises(FileNotFoundError, match="int4"):
        resolve_quant("int4", str(tmp_path))
    d = _write_record(tmp_path, "int8")
    with pytest.raises(ValueError, match="refusing"):
        resolve_quant("int4", d)
    d = _write_record(tmp_path, "int4")
    assert resolve_quant("int4", d) == "int4"
    # random weights: allowed (nothing to validate against)
    assert resolve_quant("int4", None) == "int4"


def test_int8_always_allowed(tmp_path):
    assert resolve_quant("int8", str(tmp_path)) == "int8"
    assert resolve_quant("int8", None) == "int8"


def test_malformed_record_rejected(tmp_path):
    (tmp_path / RECORD_NAME).write_text(json.dumps({"oops": 1}))
    with pytest.raises(ValueError, match="preflight record"):
        load_preflight(str(tmp_path))


def test_record_path():
    assert record_path("/x/y").endswith("/x/y/" + RECORD_NAME)


# -- CLIP (vision) dtype resolution ------------------------------------------


def _write_vision_record(tmp_path, llm_fmt, vision_fmt):
    p = tmp_path / RECORD_NAME
    p.write_text(json.dumps({
        "preflight_llm_format": llm_fmt,
        "preflight_vision_format": vision_fmt,
    }))
    return str(tmp_path)


def test_clip_bf16_and_none_passthrough(tmp_path):
    from video_llava_tpu.engine.quant_select import resolve_clip_dtype

    assert resolve_clip_dtype(None, str(tmp_path)) == "bf16"
    assert resolve_clip_dtype("bf16", None) == "bf16"


def test_clip_auto_reads_vision_entry(tmp_path):
    from video_llava_tpu.engine.quant_select import resolve_clip_dtype

    d = _write_vision_record(tmp_path, "int4", "int8")
    assert resolve_clip_dtype("auto", d) == "int8"
    d = _write_vision_record(tmp_path, "int4", "bf16")
    assert resolve_clip_dtype("auto", d) == "bf16"
    # no vision entry / no record / random weights -> conservative bf16
    d = _write_record(tmp_path, "int4")
    assert resolve_clip_dtype("auto", d) == "bf16"
    assert resolve_clip_dtype("auto", None) == "bf16"


def test_clip_int8_requires_approving_vision_entry(tmp_path):
    from video_llava_tpu.engine.quant_select import resolve_clip_dtype

    d = _write_record(tmp_path, "int4")  # record without vision entry
    with pytest.raises(FileNotFoundError, match="vision"):
        resolve_clip_dtype("int8", d)
    d = _write_vision_record(tmp_path, "int4", "bf16")
    with pytest.raises(ValueError, match="refusing"):
        resolve_clip_dtype("int8", d)
    d = _write_vision_record(tmp_path, "int4", "int8")
    assert resolve_clip_dtype("int8", d) == "int8"
    # random weights: allowed (air-gapped smoke)
    assert resolve_clip_dtype("int8", None) == "int8"


def test_clip_unknown_rejected():
    from video_llava_tpu.engine.quant_select import resolve_clip_dtype

    with pytest.raises(ValueError, match="unknown"):
        resolve_clip_dtype("fp8", None)

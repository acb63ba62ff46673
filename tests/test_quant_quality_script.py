"""Smoke the quantization-quality validation script's offline
self-test path (scripts/validate_quant_quality.py): teacher-forced
sliding-window perplexity + top-1/KL agreement plumbing must run
end-to-end without a real checkpoint."""

from video_llava_tpu.scripts.validate_quant_quality import main


def test_self_test_bf16_int8():
    assert main(["--self_test", "--formats", "bf16,int8"]) == 0


def test_self_test_preflight_record(tmp_path):
    """--preflight --record writes a record engine/quant_select can
    resolve (the '--quant auto' loop, VERDICT r3 #8)."""
    import json

    from video_llava_tpu.engine.quant_select import (
        RECORD_NAME, resolve_quant,
    )

    rec = tmp_path / RECORD_NAME
    main([
        "--self_test", "--formats", "bf16,int8",
        "--preflight", "--record", str(rec),
    ])
    data = json.loads(rec.read_text())
    assert data["preflight_llm_format"] in ("bf16", "int8", "int4")
    assert "metrics" in data and "bf16" in data["metrics"]
    got = resolve_quant("auto", str(tmp_path))
    assert got == (
        None if data["preflight_llm_format"] == "bf16"
        else data["preflight_llm_format"]
    )


def test_self_test_record_has_vision_entry(tmp_path):
    """The preflight record carries the CLIP vision gate
    (preflight_vision_format) and resolve_clip_dtype pins it
    (VERDICT r4 #5)."""
    import json

    from video_llava_tpu.engine.quant_select import (
        RECORD_NAME, resolve_clip_dtype,
    )

    rec = tmp_path / RECORD_NAME
    main([
        "--self_test", "--formats", "bf16,int8",
        "--preflight", "--record", str(rec),
    ])
    data = json.loads(rec.read_text())
    assert data["preflight_vision_format"] in ("bf16", "int8")
    assert data["vision_metrics"]["feature_cos_mean"] > 0.5
    assert data["vision_weights_real"] is False
    got = resolve_clip_dtype("auto", str(tmp_path))
    assert got == data["preflight_vision_format"]

"""Smoke the quantization-quality validation script's offline
self-test path (scripts/validate_quant_quality.py): teacher-forced
sliding-window perplexity + top-1/KL agreement plumbing must run
end-to-end without a real checkpoint."""

from video_llava_tpu.scripts.validate_quant_quality import main


def test_self_test_bf16_int8():
    assert main(["--self_test", "--formats", "bf16,int8"]) == 0

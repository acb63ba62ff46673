"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware.

Note: the environment may preset JAX_PLATFORMS (e.g. to a tunneled TPU
platform), so we override via jax.config, which wins over the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# -- fast-tier curation (VERDICT r3 #7) ---------------------------------------
# For modules listed here, every test NOT named below is auto-marked
# `slow` at collection, so `-m "not slow"` (tests/run_suite.py --fast)
# keeps exactly these smokes. Modules not listed are untouched (their
# tests stay fast unless individually marked). The full tier still runs
# everything. Chosen as the one-to-a-few most end-to-end parity checks
# per module; timings on this 1-core box drove the cut (the fast tier
# measured 1921 s before curation — see run_suite.py docstring).
FAST_TESTS = {
    # torch-mirror parity modules (one smoke each)
    "test_bf16_models.py": {"test_clip_vision_bf16"},
    "test_clip_parity.py": {"test_penultimate_patches_match"},
    "test_deformable.py": {"test_msda_matches_hf"},
    "test_grounding_dino.py": {"test_text_masks_match_hf"},
    "test_llama_parity.py": {"test_logits_match_hf"},
    "test_mobile_sam.py": {"test_tiny_vit_converter_forward_parity"},
    "test_sam.py": {"test_vision_encoder_matches_hf"},
    "test_swin.py": {"test_pooled_matches_hf"},
    "test_weight_loading.py": {
        "test_projector_export_reimport_roundtrip"
    },
    "test_whisper.py": {"test_log_mel_matches_torch_stft"},
    "test_whisper_at.py": {"test_tltr_parity"},
    "test_xmem.py": {"test_memory_read_parity"},
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        keep = FAST_TESTS.get(item.fspath.basename)
        if keep is not None and item.name.split("[")[0] not in keep:
            item.add_marker(slow)

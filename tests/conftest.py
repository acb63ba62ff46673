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
# keeps exactly these smokes. Modules NOT listed keep only their FIRST
# collected item (a canary that the module imports and its basic path
# runs). The full tier still runs everything. Rationale: on this 1-core
# box nearly every test pays multi-second jit compiles — the tier
# measured 1921 s uncurated and still 1284 s with only the torch-mirror
# modules curated — so the fast tier is an explicit smoke ALLOWLIST
# (the pre-commit gate), and the full tier remains the correctness bar.
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
    # heavy non-mirror modules: cheap-but-meaningful smokes, chosen
    # from measured per-test durations (fast-tier run, 1-core box)
    "test_chat.py": {"test_first_turn_injects_video_token"},
    "test_ram.py": {"test_tag_list_and_threshold_loaders"},
    "test_fused_clip.py": {
        "test_pack_roundtrip", "test_fused_rejects_unsupported_configs",
    },
    "test_video_llava.py": {
        "test_splice_matches_loop_oracle", "test_loss_masking",
    },
    "test_paged_kv_cache.py": {"test_paged_write_dense_roundtrip"},
    "test_int8_kv_cache.py": {"test_int8_cache_close_to_fp32"},
    "test_speculative.py": {
        "test_find_draft_most_recent_match",
        "test_pld_matches_greedy_random_prompt",
    },
    "test_sharding.py": {
        "test_param_layouts", "test_tp_decode_token_parity",
    },
    "test_continuous_tp.py": {"test_tp_continuous_matches_unsharded"},
    "test_serving_continuous.py": {"test_metrics_and_health_endpoints"},
    "test_transcribe.py": {
        "test_segment_filter_rule", "test_chunking", "test_empty_audio",
    },
    "test_grounding_utils.py": {
        "test_parse_match_response",
        "test_get_unique_tags_frequency_sorted_and_per_call",
    },
    "test_deformable_pallas.py": {
        "test_pallas_bf16_value", "test_tile2d_dispatch_encoder_only",
    },
    "test_batched_eval.py": {"test_orbax_roundtrip"},
    "test_quant.py": {
        "test_quantize_roundtrip_error_small",
        "test_quantized_matmul_close",
    },
    "test_clip_filter.py": {
        "test_zeroshot_weights_cached_and_normalized",
        "test_filter_keep_mask_shapes_and_thresholds",
    },
    "test_continuous.py": {"test_greedy_parity_interleaved"},
    "test_quant_quality_script.py": {"test_self_test_preflight_record"},
    "test_pooling_sharded.py": {
        "test_sharded_fallback_on_indivisible", "test_sharded_under_jit",
    },
    "test_align.py": {
        "test_trellis_matches_brute_force",
        "test_align_tokens_recovers_known_alignment",
    },
    "test_generate.py": {
        "test_greedy_deterministic",
        "test_decode_step_jit_donates_cache",
    },
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    first_of_module: set = set()
    for item in items:
        base = item.fspath.basename
        keep = FAST_TESTS.get(base)
        if keep is not None:
            if item.name.split("[")[0] not in keep:
                item.add_marker(slow)
        elif base in first_of_module:
            item.add_marker(slow)
        else:
            first_of_module.add(base)

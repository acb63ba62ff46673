"""Quantization quality validation: bf16 vs int8/int4 LLM weights.

The bench numbers show int4/int8 speed; this script measures what the
narrower weights COST in model quality on a real checkpoint — the
reference never quantizes (Vicuna fp16 end to end,
video_chatgpt/eval/model_utils.py:82-150), so any judge-score we report
from a quantized model needs this delta on record.

Metrics per format, teacher-forced over sliding windows of real text:
  * perplexity (fp32 log-softmax over the full vocab);
  * top-1 agreement vs the bf16 reference logits (greedy-decode proxy);
  * mean KL(bf16 || quant) per scored token.

Usage (checkpoint + tokenizer + any plain-text file):

    python -m video_llava_tpu.scripts.validate_quant_quality \
        --weights /path/to/vicuna-7b --tokenizer /path/to/vicuna-7b \
        --text wiki.txt --formats bf16,int8,int4 --seq 1024 --stride 512

Offline self-test (random tiny model, synthetic ids — exercises every
code path; deltas are meaningless but must be finite and small between
bf16 and int8):

    python -m video_llava_tpu.scripts.validate_quant_quality --self_test
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_tpu.config import LlamaConfig
from video_llava_tpu.models import llama


def _quantize(params_bf16, fmt: str):
    if fmt == "bf16":
        return params_bf16
    if fmt == "int8":
        from video_llava_tpu.ops.quant import quantize_params

        return jax.jit(quantize_params)(params_bf16)
    if fmt == "int4":
        from video_llava_tpu.ops.quant4 import quantize_params_int4

        return jax.jit(quantize_params_int4)(params_bf16)
    raise SystemExit(f"unknown format {fmt!r} (use bf16,int8,int4)")


def _window_scores(params, cfg, ids_win, n_score):
    """ids_win: (1, seq). Returns per-token (n_score,) NLL of the last
    n_score targets, plus their argmax ids and fp32 log-probs."""
    logits, _ = llama.forward(params, cfg, input_ids=ids_win)
    logits = logits[0, :-1]  # predicts ids_win[0, 1:]
    targets = ids_win[0, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return nll[-n_score:], jnp.argmax(logits, -1)[-n_score:], logp[-n_score:]


def evaluate(params, cfg, token_ids: np.ndarray, seq: int, stride: int,
             ref_logp=None):
    """Sliding-window teacher-forced scoring. Returns dict of metrics
    and the per-window fp32 log-probs (for the bf16 reference pass)."""
    fn = jax.jit(lambda p, w: _window_scores(p, cfg, w, min(stride, seq - 1)))
    nlls, agree, kls, logps = [], [], [], []
    n_tok = len(token_ids)
    if n_tok < seq:
        raise ValueError(
            f"eval text tokenizes to {n_tok} tokens, shorter than one "
            f"--seq {seq} window — use more text or a smaller --seq"
        )
    starts = list(range(0, max(1, n_tok - seq + 1), stride))
    for wi, s0 in enumerate(starts):
        win = token_ids[s0 : s0 + seq]
        if len(win) < seq:
            break
        nll, top1, logp = fn(params, jnp.asarray(win)[None])
        nlls.append(np.asarray(nll))
        logps.append(np.asarray(logp, np.float32))
        if ref_logp is not None:
            ref = ref_logp[wi]
            agree.append(np.asarray(top1) == ref.argmax(-1))
            kls.append(np.sum(np.exp(ref) * (ref - np.asarray(logp)), -1))
    nll_all = np.concatenate(nlls)
    out = {
        "perplexity": float(np.exp(nll_all.mean())),
        "mean_nll": float(nll_all.mean()),
        "tokens_scored": int(nll_all.size),
    }
    if ref_logp is not None:
        out["top1_agreement_vs_bf16"] = float(np.concatenate(agree).mean())
        out["mean_kl_vs_bf16"] = float(np.concatenate(kls).mean())
    return out, logps


def _load_real(args):
    from transformers import AutoTokenizer

    from video_llava_tpu.engine.weights import (
        convert_llama,
        load_checkpoint_dir,
    )

    cfg = LlamaConfig() if args.model_size == "7b" else LlamaConfig(
        hidden_size=5120, intermediate_size=13824, num_layers=40,
        num_heads=40, num_kv_heads=40,
    )
    sd = load_checkpoint_dir(args.weights)
    params = convert_llama(sd, cfg)
    tok = AutoTokenizer.from_pretrained(args.tokenizer, use_fast=False)
    text = open(args.text).read()
    ids = np.asarray(tok(text).input_ids, np.int32)
    return params, cfg, ids


def _load_self_test():
    cfg = LlamaConfig(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_layers=4, num_heads=4, num_kv_heads=4, head_dim=64,
    )
    params = jax.jit(
        lambda k: llama.init_params(k, cfg, jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    ids = np.asarray(
        np.random.default_rng(0).integers(0, 1024, size=4096), np.int32
    )
    return params, cfg, ids


def evaluate_vision(params_bf16, vcfg, pixels, min_cos: float):
    """CLIP W8A8 quality gate: per-patch-token cosine of the penultimate
    feature map (the exact tensor the extractor mirrors,
    scripts/save_spatio_temporal_clip_features.py:116-121) int8 vs
    bf16. Returns (metrics dict, chosen format).

    Per-token cosine (not a global norm) is the right granularity: the
    projector consumes tokens independently, so one badly-quantized
    token can skew an answer even when the mean error is tiny. The gate
    requires BOTH mean and p5 token cosine above threshold."""
    from video_llava_tpu.models import clip as clip_mod
    from video_llava_tpu.ops.quant import quantize_params

    fwd = jax.jit(
        lambda p, f: clip_mod.vision_penultimate_patches(p, f, vcfg)
    )
    ref = np.asarray(fwd(params_bf16, pixels), np.float32)
    # min_size=1<<10 so self-test-sized towers actually quantize (the
    # real ViT-L kernels are >=1M elements either way)
    qp = jax.jit(
        lambda p: quantize_params(p, min_size=1 << 10, a8=True)
    )(params_bf16)
    got = np.asarray(fwd(qp, pixels), np.float32)
    r = ref.reshape(-1, ref.shape[-1])
    g = got.reshape(-1, got.shape[-1])
    cos = np.sum(r * g, -1) / np.maximum(
        np.linalg.norm(r, axis=-1) * np.linalg.norm(g, axis=-1), 1e-8
    )
    metrics = {
        "feature_cos_mean": float(cos.mean()),
        "feature_cos_p5": float(np.percentile(cos, 5)),
        "rel_l2": float(
            np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-8)
        ),
        "tokens": int(cos.size),
    }
    ok = metrics["feature_cos_mean"] >= min_cos and (
        metrics["feature_cos_p5"] >= min_cos - 0.005
    )
    return metrics, ("int8" if ok else "bf16")


def choose_format(results: dict, max_ppl_delta_pct: float = 1.0,
                  min_top1: float = 0.97) -> str:
    """The documented int4->int8->bf16 fallback gate: pick the narrowest
    format whose teacher-forced quality stays within thresholds of the
    bf16 reference (ppl regression AND greedy top-1 agreement). Serving
    configs should run `--preflight` once per checkpoint and pin the
    answer; until a real-weight run exists, quoted int4/int8 latencies
    carry 'quality unvalidated' status (README perf table)."""
    base = results["bf16"]["perplexity"]
    for fmt in ("int4", "int8"):
        m = results.get(fmt)
        if m is None:
            continue
        ppl_delta = 100.0 * (m["perplexity"] - base) / base
        if (
            ppl_delta <= max_ppl_delta_pct
            and m.get("top1_agreement_vs_bf16", 0.0) >= min_top1
        ):
            return fmt
    return "bf16"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", help="HF checkpoint dir (bin/safetensors)")
    ap.add_argument("--tokenizer", help="tokenizer dir")
    ap.add_argument("--text", help="plain-text eval file")
    ap.add_argument("--model_size", default="7b", choices=["7b", "13b"])
    ap.add_argument("--formats", default="bf16,int8,int4")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=512)
    ap.add_argument("--self_test", action="store_true")
    ap.add_argument("--preflight", action="store_true",
                    help="print the serving format decision (int4 if "
                         "within thresholds, else int8, else bf16) as "
                         "the last JSON line")
    ap.add_argument("--record", nargs="?", const="", default=None,
                    help="with --preflight: persist the decision as a "
                         "quant_preflight.json record. Bare --record "
                         "writes next to --weights; an explicit path "
                         "overrides. serving --quant auto / int4 read "
                         "this record (engine/quant_select.py)")
    ap.add_argument("--max_ppl_delta_pct", type=float, default=1.0)
    ap.add_argument("--min_top1", type=float, default=0.97)
    ap.add_argument("--vision", action="store_true",
                    help="also gate the CLIP tower: W8A8 int8 vs bf16 "
                         "per-token feature cosine on the penultimate "
                         "map; adds preflight_vision_format to the "
                         "record (BENCH_CLIP_DTYPE=auto / serving "
                         "--clip_dtype auto read it)")
    ap.add_argument("--clip_weights",
                    help="CLIP vision checkpoint dir (bin/safetensors); "
                         "omitted -> random init (self-test only: the "
                         "gate is then indicative, not a real-weight "
                         "validation)")
    ap.add_argument("--video",
                    help="video file for the vision gate's frames "
                         "(omitted -> random frames)")
    ap.add_argument("--vision_frames", type=int, default=16)
    ap.add_argument("--min_vision_cos", type=float, default=0.99)
    args = ap.parse_args(argv)

    if args.self_test:
        params_bf16, cfg, ids = _load_self_test()
        args.seq, args.stride = 256, 128
    else:
        if not (args.weights and args.tokenizer and args.text):
            ap.error("--weights/--tokenizer/--text required (or --self_test)")
        params_bf16, cfg, ids = _load_real(args)

    formats = [f.strip() for f in args.formats.split(",")]
    if "bf16" not in formats:
        formats = ["bf16"] + formats  # reference pass is mandatory

    results = {}
    ref_logps = None
    for fmt in formats:
        params = _quantize(params_bf16, fmt)
        metrics, logps = evaluate(
            params, cfg, ids, args.seq, args.stride,
            ref_logp=None if fmt == "bf16" else ref_logps,
        )
        if fmt == "bf16":
            ref_logps = logps
        results[fmt] = metrics
        print(json.dumps({"format": fmt, **metrics}), flush=True)

    if "bf16" in results:
        base = results["bf16"]["perplexity"]
        for fmt, m in results.items():
            if fmt != "bf16":
                print(
                    json.dumps(
                        {
                            "format": fmt,
                            "ppl_delta_pct": 100.0
                            * (m["perplexity"] - base)
                            / base,
                        }
                    ),
                    flush=True,
                )

    vision_metrics = vision_fmt = None
    if args.vision or args.self_test:
        from video_llava_tpu.config import CLIPVisionConfig
        from video_llava_tpu.models import clip as clip_mod
        from video_llava_tpu.ops.image import normalize_clip

        if args.self_test:
            vcfg = CLIPVisionConfig(
                image_size=32, patch_size=16, hidden_size=64,
                intermediate_size=128, num_layers=3, num_heads=4,
            )
            vparams = jax.jit(
                lambda k: clip_mod.init_vision_params(k, vcfg, jnp.bfloat16)
            )(jax.random.PRNGKey(1))
        else:
            vcfg = CLIPVisionConfig()
            if args.clip_weights:
                from video_llava_tpu.engine.weights import (
                    convert_clip_vision,
                    load_checkpoint_dir,
                )

                vparams = convert_clip_vision(
                    load_checkpoint_dir(args.clip_weights), vcfg
                )
            else:
                print(
                    "# vision gate on RANDOM weights (no --clip_weights)"
                    " — indicative only", flush=True
                )
                vparams = jax.jit(
                    lambda k: clip_mod.init_vision_params(
                        k, vcfg, jnp.bfloat16
                    )
                )(jax.random.PRNGKey(1))
        if args.video:
            from video_llava_tpu.media.loader import load_video

            frames = load_video(
                args.video, num_frm=args.vision_frames,
                shape=(vcfg.image_size, vcfg.image_size),
            )
        else:
            frames = np.random.default_rng(0).integers(
                0, 256,
                size=(args.vision_frames, vcfg.image_size,
                      vcfg.image_size, 3),
            ).astype(np.uint8)
        pixels = normalize_clip(jnp.asarray(frames), dtype=jnp.bfloat16)
        vision_metrics, vision_fmt = evaluate_vision(
            vparams, vcfg, pixels, args.min_vision_cos
        )
        print(
            json.dumps(
                {"vision_format": vision_fmt, **vision_metrics}
            ),
            flush=True,
        )

    if args.preflight:
        chosen = choose_format(
            results, args.max_ppl_delta_pct, args.min_top1
        )
        record = {
            "preflight_llm_format": chosen,
            "max_ppl_delta_pct": args.max_ppl_delta_pct,
            "min_top1": args.min_top1,
            "metrics": results,
        }
        if vision_fmt is not None:
            record["preflight_vision_format"] = vision_fmt
            record["min_vision_cos"] = args.min_vision_cos
            record["vision_metrics"] = vision_metrics
            record["vision_weights_real"] = bool(args.clip_weights)
        print(json.dumps(record), flush=True)
        if args.record is not None:
            import os

            from video_llava_tpu.engine.quant_select import record_path

            path = args.record or (
                record_path(args.weights) if args.weights else None
            )
            if not path:
                ap.error("--record without a path needs --weights")
            with open(path, "w") as f:
                json.dump(record, f, indent=1)
            print(f"# preflight record written to {path}", flush=True)

    if args.self_test:
        d8 = abs(
            results["int8"]["perplexity"] - results["bf16"]["perplexity"]
        ) / results["bf16"]["perplexity"]
        assert d8 < 0.25, f"int8 self-test ppl delta {d8:.3f} implausible"
        assert results["int8"]["top1_agreement_vs_bf16"] > 0.5
        assert choose_format(results) in ("bf16", "int8", "int4")
        assert vision_metrics is not None
        # W8A8 on a quantized tiny tower: close but NOT bit-identical
        # (a 0-delta means nothing was actually quantized)
        assert 0.5 < vision_metrics["feature_cos_mean"] < 1.0
        assert vision_metrics["rel_l2"] > 0.0
        print("self_test OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

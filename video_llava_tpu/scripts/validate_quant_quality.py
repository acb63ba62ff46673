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
        print("self_test OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

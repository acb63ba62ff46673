"""End-to-end video-QA benchmark on real TPU hardware.

Measures the reference's headline inference path (BASELINE.md config 2)
as one device-resident pipeline on a single chip:
  100 frames (224px, uint8) -> CLIP ViT-L/14 penultimate features
  -> spatio-temporal pooling -> mm_projector -> Vicuna-7B prefill
  (512-token prompt incl. 356 video tokens) -> 128-token greedy decode.

Weights are randomly initialized (zero-egress environment) — latency is
weight-value independent. Prints one JSON line; vs_baseline is measured
against the 2s p50 north-star from BASELINE.md scaled to this slice
(the target is defined on v5e-8; we run the whole model on ONE chip, so
vs_baseline = 2.0 / p50 on the conservative single-chip number).
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import (
    GenerationConfig,
    LlamaConfig,
    VideoLLaVAConfig,
)
from video_llava_tpu.engine.generate import _decode_loop
from video_llava_tpu.models import video_llava
from video_llava_tpu.ops.image import normalize_clip

import os

NUM_FRAMES = 100
PROMPT_LEN = 512
# BENCH_BATCH=N measures BATCHED QA throughput (BASELINE config 3 at
# eval scale): N independent clips encoded (lax.map: CLIP is already
# MXU-saturated at 100 frames, so clip batching adds nothing there),
# one batched prefill, one batched greedy decode. Emits
# e2e_video_qa_batched_p50 + qa_samples_per_min; the driver-facing
# metric from a plain run stays e2e_video_qa_p50. Not combinable with
# BENCH_FROM_VIDEO / BENCH_WITH_AUDIO (single-clip pipelines).
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
# BENCH_SPEC=1 decodes through the batched prompt-lookup speculative
# loop (engine/speculative.py) instead of plain decode — the batched-QA
# lever (VERDICT r4 #4). Greedy-exact: same tokens, fewer weight
# streams when answers echo context.
SPEC = os.environ.get("BENCH_SPEC", "0") == "1"
if BATCH > 1 and (
    os.environ.get("BENCH_FROM_VIDEO", "0") == "1"
    or os.environ.get("BENCH_WITH_AUDIO", "0") == "1"
):
    raise SystemExit(
        "BENCH_BATCH>1 cannot combine with BENCH_FROM_VIDEO/"
        "BENCH_WITH_AUDIO (single-clip pipelines)"
    )
# BENCH_NEW_TOKENS / BENCH_LAYERS: debugging knobs (e.g. validating the
# BENCH_MESH path on a slow virtual CPU mesh); the headline numbers use
# the defaults.
NEW_TOKENS = int(os.environ.get("BENCH_NEW_TOKENS", "128"))
# the speculative verify writes optimistically up to k+1 = 9 past the
# last kept token (engine/speculative.py) — the cache needs that slack
CACHE_LEN = PROMPT_LEN + NEW_TOKENS + (9 if SPEC else 0)
LAYERS = int(os.environ.get("BENCH_LAYERS", "0"))  # 0 = full depth


# LLM weight format: decode is bandwidth-bound, so narrower weights win
# as long as the kernel stays on the HBM roofline. int4 (nibble-packed,
# g=128, W4A8 stacked Pallas matvec with scalar-prefetch layer select —
# zero per-layer slice copies) is the default: measured 8.31 ms/step 7B
# (vs int8's 11.42) and 14.85 ms/step 13B (vs 22.24). BENCH_LLM_DTYPE
# selects int4 (default) / int8 / bf16 / auto ('auto' resolves through
# the quant-preflight record — BENCH_WEIGHTS names the checkpoint dir
# carrying quant_preflight.json; without weights it falls back to int8,
# the checkpoint-independent format). BENCH_FUSE=0 disables the fused
# wqkv / gate_up decode layouts.
LLM_DTYPE = os.environ.get("BENCH_LLM_DTYPE", "int4")
if LLM_DTYPE == "auto":
    from video_llava_tpu.engine.quant_select import resolve_quant

    LLM_DTYPE = resolve_quant(
        "auto", os.environ.get("BENCH_WEIGHTS") or None
    ) or "bf16"
    print(f"# BENCH_LLM_DTYPE=auto -> {LLM_DTYPE}", flush=True)
FUSE = os.environ.get("BENCH_FUSE", "1") == "1"
# BENCH_MODEL=13b benches Vicuna-13B (the reference's larger config);
# int8 weights (~13 GB) are tight on a 16 GB chip, int4 (~6.6 GB) is
# the intended single-chip 13B format.
MODEL_SIZE = os.environ.get("BENCH_MODEL", "7b")
# CLIP tower dtype: bf16 (default) or int8 (W8A8 — activations+weights
# int8 on the MXU at 2x the bf16 rate; the encoder is compute-bound at
# ~91% of the bf16 roofline, so weights-only int8 buys nothing there).
CLIP_DTYPE = os.environ.get("BENCH_CLIP_DTYPE", "bf16")
if CLIP_DTYPE in ("auto", "int8"):
    # vision gate mirrors the LLM one: 'auto' pins the recorded
    # preflight_vision_format (bf16 when absent), explicit int8 against
    # real weights requires an approving record (quant_select).
    from video_llava_tpu.engine.quant_select import resolve_clip_dtype

    CLIP_DTYPE = resolve_clip_dtype(
        CLIP_DTYPE, os.environ.get("BENCH_WEIGHTS") or None
    )
# KV cache dtype: bf16 measures fastest at bench lengths (the int8
# cache pays quantize-on-write + scale-stream overhead that exceeds its
# DMA saving until contexts get long/batched); int8 weights keep the
# int8 cache for 13B HBM headroom. BENCH_KV_DTYPE=int8|bf16 overrides.
_KV_ENV = os.environ.get("BENCH_KV_DTYPE", "")
if _KV_ENV:
    CACHE_DTYPE = "int8" if _KV_ENV == "int8" else "bf16"
else:
    CACHE_DTYPE = "int8" if LLM_DTYPE == "int8" else "bf16"
# BENCH_FROM_VIDEO=1 starts the measured pipeline from an ENCODED VIDEO
# FILE instead of device-resident frames: each iteration runs native
# libav decode -> uniform 100-frame sampling -> swscale resize to 224
# -> one uint8 host->device transfer -> normalize -> CLIP -> pooling ->
# projector -> prefill -> decode (the reference's full inference path,
# model_utils.py:12-52 + inference.py:86-112). The clip is synthesized
# and encoded once (h264, 640x360, 300 frames) at BENCH_VIDEO_PATH.
# The bit-parity extraction path decodes at native size and resizes on
# device (media/loader.load_video_native_size + ops.image); the bench
# uses decode-time swscale scaling — the fast production path.
FROM_VIDEO = os.environ.get("BENCH_FROM_VIDEO", "0") == "1"
# BENCH_MESH=DxM (e.g. 1x8) runs the same pipeline TP/DP-sharded over a
# ('data','model') mesh — the v5e-8 serving configuration. Requires D*M
# visible devices (real chips, or a virtual CPU mesh for correctness
# runs). The metric name stays e2e_video_qa_p50 either way.
# BENCH_WITH_AUDIO=1 measures BASELINE config 4 (audio-augmented
# conversation) alongside: native audio decode of a WAV fixture ->
# log-mel -> Whisper large-v2 encode (with layer states for the TL-TR
# AT head) -> KV-cached greedy decode -> AT speech/music filter ->
# wav2vec2 CTC forced alignment -> transcript splice into the prompt ->
# the same answer pipeline. Stage timings land in detail['audio'];
# the headline metric/value are unchanged. (Reference path:
# chat.py:62-73 + audio_transcript/transcribe.py:51-99.)
WITH_AUDIO = os.environ.get("BENCH_WITH_AUDIO", "0") == "1"
MESH_ENV = os.environ.get("BENCH_MESH")
if MESH_ENV:
    # fused wqkv/gate_up names match no TP sharding rule (they would
    # run fully replicated and mislabel the mesh numbers) — the mesh
    # bench always uses the unfused, spec-sharded layout
    FUSE = False


def _init_quantized_direct(key, cfg):
    """Random params with the LLM directly in quantized layout (no bf16
    intermediate — a 7B bf16 + quantized copy would exceed single-chip
    HBM). Weight values don't affect latency; real checkpoints quantize
    host-side via ops.quant / ops.quant4."""
    from video_llava_tpu.models.llama import fuse_layer_kernels
    from video_llava_tpu.ops.quant import quantize_params
    from video_llava_tpu.ops.quant4 import quantize_params_int4

    quantize = (
        quantize_params_int4 if LLM_DTYPE == "int4" else quantize_params
    )
    shapes = jax.eval_shape(
        lambda k: video_llava.init_params(k, cfg, jnp.bfloat16), key
    )
    # Compute the FINAL layout's shapes abstractly and materialize the
    # random weights directly in it: fusing after materialization would
    # transiently hold two full copies of the LLM on device (13B int8
    # would OOM the chip during init). Real checkpoints quantize+fuse
    # host-side, so serving never sees that peak either.
    to_layout = (
        (lambda t: fuse_layer_kernels(quantize(t["llm"])))
        if FUSE
        else (lambda t: quantize(t["llm"]))
    )
    qshapes = jax.eval_shape(to_layout, shapes)

    def make(leaf):
        if leaf.dtype == jnp.int8:
            return jnp.ones(leaf.shape, jnp.int8) * 3
        return jnp.full(leaf.shape, 0.01, leaf.dtype)

    llm = jax.jit(lambda: jax.tree.map(make, qshapes))()

    import video_llava_tpu.models.clip as clip_mod
    import video_llava_tpu.models.projector as proj_mod

    k1, k2 = jax.random.split(key)

    def make_vision(k):
        v = clip_mod.init_vision_params(k, cfg.vision, jnp.bfloat16)
        if CLIP_DTYPE == "int8":
            from video_llava_tpu.ops.quant import quantize_params as qp

            v = qp(v, a8=True)
        return v

    return {
        "vision": jax.jit(make_vision)(k1),
        "projector": proj_mod.init_params(k2, cfg.projector, jnp.bfloat16),
        "llm": llm,
    }


def build():
    llm_cfg = (
        LlamaConfig.vicuna_13b() if MODEL_SIZE == "13b"
        else LlamaConfig.vicuna_7b()
    )
    if LAYERS:
        llm_cfg = dataclasses.replace(llm_cfg, num_layers=LAYERS)
    cfg = VideoLLaVAConfig(llm=llm_cfg)
    # One compiled program for the whole init: eager init would compile
    # dozens of tiny executables (very slow over a tunneled TPU).
    if LLM_DTYPE in ("int8", "int4"):
        params = _init_quantized_direct(jax.random.PRNGKey(0), cfg)
    else:
        params = jax.jit(
            lambda k: video_llava.init_params(k, cfg, jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        if CLIP_DTYPE == "int8":
            from video_llava_tpu.ops.quant import quantize_params as _qp

            params = dict(params)
            params["vision"] = jax.jit(
                lambda v: _qp(v, a8=True)
            )(params["vision"])

    mesh = None
    if MESH_ENV:
        from video_llava_tpu.parallel import (
            make_mesh,
            shard_params,
            videollava_param_specs,
        )

        d, m = (int(x) for x in MESH_ENV.lower().split("x"))
        mesh = make_mesh(d, m)
        # Pad the vocab so embed/lm_head shard over 'model' (32006 is not
        # divisible by 8; padded logit columns are masked to -inf in
        # llama.forward). m*128 keeps each chip's vocab shard lane-
        # aligned for the MXU.
        from video_llava_tpu.models import llama as llama_mod

        params = dict(params)
        params["llm"] = jax.jit(
            lambda t: llama_mod.pad_vocab(t, m * 128)
        )(params["llm"])
        # Redistribute into the TP layout (quant-aware specs). Production
        # sharded serving loads checkpoints directly into this layout via
        # engine/weights; here the transient device-0 copy is acceptable
        # (13B int8 = 12.8 GB still fits one 16 GB chip).
        params = shard_params(params, videollava_param_specs(params), mesh)
        # Register the mesh so the Pallas attention/pooling kernels stay
        # fused per-shard (auto dispatch still requires the TPU backend;
        # virtual CPU meshes keep the XLA attention path and run the
        # sharded pooling in interpret mode).
        from video_llava_tpu.ops.attention import set_attention_mesh
        from video_llava_tpu.ops.pooling import set_pooling_mesh

        set_attention_mesh(mesh)
        set_pooling_mesh(mesh)

    rng = np.random.default_rng(0)
    fshape = (NUM_FRAMES, cfg.vision.image_size, cfg.vision.image_size, 3)
    if BATCH > 1:
        fshape = (BATCH,) + fshape
    frames = jnp.asarray(rng.integers(0, 256, size=fshape), jnp.uint8)
    b = max(BATCH, 1)
    ids = rng.integers(3, 30000, size=(b, PROMPT_LEN))
    n = cfg.video_token_len
    ids[:, 8] = cfg.vid_start_token_id
    ids[:, 9 : 9 + n] = cfg.vid_patch_token_id
    ids[:, 9 + n] = cfg.vid_end_token_id
    input_ids = jnp.asarray(ids, jnp.int32)
    seq_lens = jnp.asarray([PROMPT_LEN] * b, jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from video_llava_tpu.parallel import batch_spec

        # b=1 pipeline: batch axes effectively replicate over 'data';
        # frames stay replicated (the CLIP tower runs TP over 'model').
        input_ids = jax.device_put(
            input_ids, NamedSharding(mesh, batch_spec(2))
        )
        seq_lens = jax.device_put(seq_lens, NamedSharding(mesh, batch_spec(1)))

    gen = GenerationConfig(
        max_new_tokens=NEW_TOKENS,
        do_sample=False,
        eos_token_id=-1,  # fixed-length workload: never stop early
        pad_token_id=0,
    )

    def encode(params, frames):
        if BATCH > 1:
            # sequential per-clip encode inside one program: 100 frames
            # already saturate the MXU, so clip batching buys nothing on
            # the vision tower — the batching win is in prefill/decode.
            return jax.lax.map(
                lambda f: video_llava.encode_video(
                    params, normalize_clip(f, dtype=jnp.bfloat16), cfg
                ),
                frames,
            )
        pixels = normalize_clip(frames, dtype=jnp.bfloat16)
        return video_llava.encode_video(params, pixels, cfg)

    encode_jit = jax.jit(encode)

    def prefill(params, input_ids, seq_lens, feats):
        return video_llava.prefill(
            params, cfg, input_ids, seq_lens,
            feats if BATCH > 1 else feats[None], CACHE_LEN,
            jnp.int8 if CACHE_DTYPE == "int8" else jnp.bfloat16,
            mesh=mesh,
        )

    prefill_jit = jax.jit(prefill)

    def e2e(params, frames, input_ids, seq_lens, rng):
        feats = encode(params, frames)
        res = prefill(params, input_ids, seq_lens, feats)
        if SPEC:
            from video_llava_tpu.engine.speculative import (
                _decode_loop_pld, _init_ctx,
            )

            spec_k = 8
            ctx = _init_ctx(
                input_ids, PROMPT_LEN + NEW_TOKENS + spec_k + 1,
                jnp.int32(gen.pad_token_id),
            )
            out, _, _ = _decode_loop_pld(
                params, cfg, gen, res.logits_last, res.cache, ctx,
                seq_lens, rng, NEW_TOKENS, 3, spec_k,
            )
            return out.tokens
        out = _decode_loop(params, cfg, gen, res.logits_last, res.cache, rng,
                           NEW_TOKENS, mesh=mesh)
        return out.tokens

    e2e_jit = jax.jit(e2e)
    decode_rng = jax.random.PRNGKey(0)
    return cfg, params, frames, input_ids, seq_lens, decode_rng, (
        encode_jit, prefill_jit, e2e_jit,
    )


def _make_clip(path: str, src_h: int = 360, src_w: int = 640,
               n: int = 300, fps: float = 25.0) -> None:
    """Synthesize + h264-encode a test clip once (structured content so
    the encode is fast and the decode workload realistic)."""
    from video_llava_tpu.media.loader import encode_video

    yy, xx = np.mgrid[0:src_h, 0:src_w]
    base = np.stack(
        [
            (xx * 255 // src_w).astype(np.uint8),
            (yy * 255 // src_h).astype(np.uint8),
            ((xx + yy) * 255 // (src_h + src_w)).astype(np.uint8),
        ],
        axis=-1,
    )
    frames = np.empty((n, src_h, src_w, 3), np.uint8)
    for i in range(n):
        f = np.roll(base, 5 * i, axis=1)
        y0 = (7 * i) % (src_h - 40)
        f[y0 : y0 + 32, 32:96] = 255  # moving box: some temporal detail
        frames[i] = f
    encode_video(path, frames, fps=fps)


def _make_wav(path: str, seconds: int = 60, rate: int = 16000) -> None:
    """Synthesize a speech-band WAV fixture (chirps + tones; the ASR
    compute cost is content-independent)."""
    import wave

    t = np.arange(seconds * rate) / rate
    x = 0.4 * np.sin(2 * np.pi * (200 + 60 * (t % 3)) * t)
    x += 0.2 * np.sin(2 * np.pi * 440 * t) * (np.sin(0.7 * t) > 0)
    pcm = (x * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())


def _build_transcriber():
    """Whisper large-v2 (the reference's whisperX model) + random TL-TR
    AT head + wav2vec2-BASE CTC aligner, all random weights, bf16
    towers — the exact compute/transfer shape of the shipped audio
    stack (audio/builders.build_default_transcriber with checkpoints).
    BENCH_AUDIO_SIZE=tiny-test shrinks everything for CPU smoke runs."""
    from video_llava_tpu.audio.align import ForcedAligner
    from video_llava_tpu.audio.transcribe import Transcriber
    from video_llava_tpu.models import wav2vec2 as w2v
    from video_llava_tpu.models import whisper as whisper_mod

    tiny = os.environ.get("BENCH_AUDIO_SIZE") == "tiny-test"
    dtype = jnp.float32 if tiny else jnp.bfloat16
    cfg = (
        whisper_mod.WhisperConfig.tiny_test() if tiny
        else whisper_mod.WhisperConfig.large_v2()
    )
    params = jax.jit(
        lambda k: whisper_mod.init_params(k, cfg, dtype)
    )(jax.random.PRNGKey(11))
    atc = (
        whisper_mod.WhisperATConfig.tiny_test(rep_dim=cfg.d_model)
        if tiny else whisper_mod.WhisperATConfig(rep_dim=cfg.d_model)
    )
    params = dict(params)
    params["at_head"] = jax.jit(
        lambda k: whisper_mod.init_at_head_tltr(k, atc, dtype)
    )(jax.random.PRNGKey(12))

    w2v_cfg = (
        w2v.Wav2Vec2Config.tiny_test() if tiny
        else w2v.Wav2Vec2Config.base()
    )
    w2v_params = jax.jit(
        lambda k: w2v.init_params(k, w2v_cfg, dtype)
    )(jax.random.PRNGKey(13))
    n_letters = min(26, w2v_cfg.vocab_size - 5)
    vocab = {"<pad>": 0, "|": 4, **{chr(ord("A") + i): 5 + i
                                    for i in range(n_letters)}}
    aligner = ForcedAligner(w2v_params, w2v_cfg, vocab)

    # random-weight decode emits no real text; map ids to letter codes
    # (within the aligner vocab) so alignment/splice get
    # realistic-length transcripts
    def decode_text(ids):
        return " ".join(
            "".join(chr(ord("A") + (int(i) >> (4 * s)) % n_letters)
                    for s in range(3))
            for i in ids
        )

    # music_tags=(): with random AT-head logits the speech-beats-music
    # margin drops ~all segments, zeroing the transcript; keeping every
    # segment makes alignment/splice costs representative (the AT
    # logits themselves are still computed and timed)
    return Transcriber(
        params, cfg, decode_text, start_tokens=(1,), eot_token=2,
        max_new_tokens=112, at_cfg=atc, music_tags=(),
        aligner=aligner,
    )


def _bench_audio(e2e_jit, params, frames, input_ids, seq_lens):
    """BASELINE config 4: audio stages + transcript splice + answer.
    Returns the detail dict (medians of AUDIO_ITERS runs)."""
    import time as _time

    from video_llava_tpu.media.audio import load_audio

    wav = os.environ.get("BENCH_AUDIO_PATH", "/tmp/bench_audio.wav")
    if not os.path.exists(wav):
        _make_wav(wav)
    tr = _build_transcriber()

    def once():
        st = {}
        t0 = _time.perf_counter()
        audio = load_audio(wav)
        st["audio_decode_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        segments = tr.transcribe_audio(audio)
        st["asr_s"] = _time.perf_counter() - t0  # mel+encode+decode+AT

        t0 = _time.perf_counter()
        kept = [s for s in segments if s.keep and s.text]
        words = tr.aligner.align_segments(audio, kept) if (
            tr.aligner and kept
        ) else []
        st["align_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        text = " ".join(s.text for s in kept)
        # transcript splice: the reference appends the transcript text
        # to the prompt before tokenization (chat.py:89-104); with the
        # bench's synthetic ids the equivalent is writing hashed word
        # ids into the prompt tail
        ids = np.asarray(input_ids).copy()
        cap = min(64, max(ids.shape[1] // 4, 1))
        wordids = [
            3 + (hash(wd) % 29000) for wd in text.split()[:cap]
        ]
        if wordids:
            ids[0, -len(wordids):] = wordids
        out = e2e_jit(
            params, frames, jnp.asarray(ids), seq_lens,
            jax.random.PRNGKey(0),
        )
        np.asarray(out)  # block
        st["splice_answer_s"] = _time.perf_counter() - t0
        st["_n_words"] = len(words)
        st["_n_chars"] = len(text)
        return st

    once()  # compile whisper/aligner programs
    iters = int(os.environ.get("BENCH_AUDIO_ITERS", "3"))
    runs = [once() for _ in range(iters)]
    med = {
        k: round(float(np.median([r[k] for r in runs])), 4)
        for k in runs[0]
        if not k.startswith("_")
    }
    med["transcript_s"] = round(
        med["audio_decode_s"] + med["asr_s"] + med["align_s"], 4
    )
    med["e2e_with_audio_s"] = round(
        med["transcript_s"] + med["splice_answer_s"], 4
    )
    med["aligned_words"] = runs[-1]["_n_words"]
    med["transcript_chars"] = runs[-1]["_n_chars"]
    med["models"] = (
        "whisper-large-v2 bf16 + tltr-at-head + wav2vec2-base CTC "
        "aligner, 60s wav, random weights"
    )
    return med


def main():
    from video_llava_tpu.utils.timing import measure, sync

    cfg, params, frames, input_ids, seq_lens, rng, fns = build()
    encode_jit, prefill_jit, e2e_jit = fns

    t_media = None
    if FROM_VIDEO:
        import time as _time

        from video_llava_tpu.media.loader import load_video

        clip_path = os.environ.get("BENCH_VIDEO_PATH", "/tmp/bench_clip.mp4")
        if not os.path.exists(clip_path):
            _make_clip(clip_path)
        size = cfg.vision.image_size

        def full(i):
            f = load_video(clip_path, num_frm=NUM_FRAMES, shape=(size, size))
            return e2e_jit(
                params, jnp.asarray(f), input_ids, seq_lens,
                jax.random.PRNGKey(i),
            )

        p50 = measure(full, iters=5)
        # decode+sample+scale alone (host stage of the same pipeline)
        ts = []
        for _ in range(5):
            t0 = _time.perf_counter()
            load_video(clip_path, num_frm=NUM_FRAMES, shape=(size, size))
            ts.append(_time.perf_counter() - t0)
        t_media = float(np.median(ts))
    else:
        p50 = measure(
            lambda i: e2e_jit(
                params, frames, input_ids, seq_lens, jax.random.PRNGKey(i)
            ),
            iters=5,
        )

    # BENCH_PROFILE=DIR captures a jax.profiler trace of one warm e2e
    # iteration (view with tensorboard/xprof or perfetto).
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            sync(
                e2e_jit(params, frames, input_ids, seq_lens,
                        jax.random.PRNGKey(0))
            )
        print(f"# profiler trace written to {profile_dir}")

    # Stage breakdown (diagnostics, not the headline).
    t_encode = measure(lambda i: encode_jit(params, frames), iters=5)
    feats = encode_jit(params, frames)
    t_prefill = measure(
        lambda i: prefill_jit(params, input_ids, seq_lens, feats).logits_last,
        iters=5,
    )
    # In from_video mode the residual also carries the host decode and
    # the uint8 frame transfer; subtract the measured decode stage so
    # decode_tok_per_s stays comparable across modes.
    t_decode = max(p50 - t_encode - t_prefill - (t_media or 0.0), 1e-9)

    result = {
        "metric": (
            "e2e_video_qa_batched_p50" if BATCH > 1 else "e2e_video_qa_p50"
        ),
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / p50, 3),
        "detail": {
            "clip_encode_s": round(t_encode, 4),
            "clip_frames_per_s": round(
                NUM_FRAMES * max(BATCH, 1) / t_encode, 1
            ),
            "prefill_s": round(t_prefill, 4),
            "decode_s": round(t_decode, 4),
            "decode_tok_per_s": round(NEW_TOKENS / t_decode, 1),
            "model": (
                f"vicuna-{MODEL_SIZE} + clip-vit-l/14-224, "
                + (f"mesh {MESH_ENV} (dataxmodel TP)" if MESH_ENV
                   else "1 chip")
                + f", clip {'int8 W8A8' if CLIP_DTYPE == 'int8' else 'bf16'}, llm "
                + {
                    "int4": "int4 W4A8 (g=128, stacked Pallas matvec)",
                    "int8": "int8 weights-only",
                }.get(LLM_DTYPE, "bf16")
                + f" + {CACHE_DTYPE}"
                  " kv cache"
                + ("" if FUSE or LLM_DTYPE == "bf16" else ", unfused")
            ),
            "new_tokens": NEW_TOKENS,
            "prompt_len": PROMPT_LEN,
            "num_frames": NUM_FRAMES,
        },
    }
    if BATCH > 1:
        result["detail"]["batch"] = BATCH
        result["detail"]["qa_samples_per_min"] = round(60.0 * BATCH / p50, 2)
        result["detail"]["decode_tok_per_s"] = round(
            NEW_TOKENS * BATCH / t_decode, 1
        )
    if WITH_AUDIO:
        result["detail"]["audio"] = _bench_audio(
            e2e_jit, params, frames, input_ids, seq_lens
        )
    if t_media is not None:
        result["detail"]["media_decode_s"] = round(t_media, 4)
        result["detail"]["from_video"] = (
            "p50 includes native libav decode of a 640x360 h264 clip, "
            "uniform 100-frame sampling, swscale resize to 224, and the "
            "uint8 host->device transfer"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()

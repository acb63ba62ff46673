"""Grounding-pipeline benchmark (BASELINE.md config 5) on real TPU.

Headline: a MEASURED wall-clock run of the real
`GroundedTracker.run_on_list_of_images` over a 100-frame clip — under
this build (learned propagator + device-capable crop filter) that
dispatches to the FUSED whole-clip device program: batched
GroundingDINO detection, NMS, the batched-on-device CLIP ViT-B/32
zero-shot crop filter, MobileSAM masks, IoU detection<->track
association, chunked XMem propagation (the reference's per-frame hot
loop, grounding_evaluation/grounding_new_api.py:448-521, with its
always-on crop filter :373-445). The per-segment host loop is measured
alongside (`hostloop_s`), as are RAM tagging over all frames
(reference chat.py:261) and the (network-bound, here stub-timed)
entity matching (chat.py:265), so the full grounded-chat pipeline
(BASELINE config 5) is costed end to end.

A per-stage device-program PROJECTION of the same clip is kept in the
detail fields (`projected_clip_s`): the gap between it and the
measured number is host orchestration + host<->device transfer — on
this TUNNELED chip the link (~26 ms RTT, ~MB/s bandwidth, reported in
`link` detail) dominates that gap; a local TPU host pays microseconds
for the same transfers.

Weights are random (zero-egress environment) — latency is weight-value
independent, except detection counts: random detector logits fire on
~all 900 queries, so the measured run truncates raw detections to the
top `PRE_NMS_BOXES` per frame before NMS (what the 0.35 confidence
threshold does with real weights). Prints one JSON line with metric
`grounding_clip_p50` (bench.py's `e2e_video_qa_p50` is unaffected).
Run manually:
    python bench_grounding.py
Stage sizes follow the reference config (grounding_new_api.py:40-108):
shorter side 480 (frames padded to 480x832 for the stride-16 tracker),
detector at 800px, detect_every=5, SAM best-of-3 masks.
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

import os

# Env overrides exist for cheap CPU smoke runs (tests); the headline
# numbers use the defaults.
NUM_FRAMES = int(os.environ.get("GROUNDING_FRAMES", "100"))
DETECT_EVERY = 5
# shorter-side-480, stride-16 aligned
H = int(os.environ.get("GROUNDING_H", "480"))
W = int(os.environ.get("GROUNDING_W", "832"))
N_BOXES = 4  # typical per-frame detections after NMS
PRE_NMS_BOXES = 8  # raw detections kept per frame in the measured run
MEASURED_RUNS = int(os.environ.get("GROUNDING_RUNS", "3"))
# GROUNDING_DTYPE=bf16 casts detector/SAM/XMem weights to bfloat16
# (halves HBM stream + doubles MXU rate; parity validated by the
# bf16-checkpoint smoke tests).
DTYPE = os.environ.get("GROUNDING_DTYPE", "f32")


def _cast(params):
    import jax.numpy as jnp

    if DTYPE != "bf16":
        return params
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )


def _measure_link():
    """RTT + effective bandwidth of the host<->device link (over the
    tunneled TPU this is the dominant term of the measured-vs-projected
    gap; a local PCIe host makes it negligible)."""
    import time

    from video_llava_tpu.utils.timing import fetch_rtt

    rtt = fetch_rtt()
    buf = np.zeros((12 * 1024 * 1024,), np.uint8)
    x = jnp.asarray(buf)  # warm any allocator path
    np.asarray(x[:1])
    t0 = time.perf_counter()
    x = jnp.asarray(buf)
    np.asarray(x[:1])
    up_s = max(time.perf_counter() - t0 - rtt, 1e-9)
    t0 = time.perf_counter()
    np.asarray(x)
    down_s = max(time.perf_counter() - t0 - rtt, 1e-9)
    return {
        "rtt_ms": round(rtt * 1e3, 1),
        "up_mbps": round(12.0 / up_s, 1),
        "down_mbps": round(12.0 / down_s, 1),
    }


class _TopKDetector:
    """Bench shim: truncate raw detections to the top `k` per frame.
    With random weights every one of the 900 queries clears the 0.35
    confidence threshold; with real weights the threshold leaves a
    handful. The device forward is untouched — only the host-side
    post-threshold count is made representative."""

    def __init__(self, det, k: int):
        self._det, self._k = det, k

    def detect_batch(self, images, prompts):
        out = []
        for boxes, conf, cids in self._det.detect_batch(images, prompts):
            order = np.argsort(-conf)[: self._k]
            out.append((boxes[order], conf[order], cids[order]))
        return out

    def __call__(self, image, prompts):
        return self.detect_batch(np.asarray(image)[None], prompts)[0]


class _Timed:
    """Wrap a callable, accumulating host-blocking wall time (transfer
    + dispatch + device + fetch — the calls all fetch results, so the
    timer sees the true cost)."""

    def __init__(self, fn):
        self.fn, self.t, self.n = fn, 0.0, 0

    def reset(self):
        self.t, self.n = 0.0, 0

    def __call__(self, *a, **k):
        import time

        t0 = time.perf_counter()
        out = self.fn(*a, **k)
        self.t += time.perf_counter() - t0
        self.n += 1
        return out


class _TimedSegmenter:
    """Delegating segmenter wrapper timing __call__ (the decoder path)
    and precompute_embeddings (the batched encoder) separately."""

    def __init__(self, seg):
        self._seg = seg
        self.call = _Timed(seg.__call__)
        self.pre = _Timed(seg.precompute_embeddings)

    def __call__(self, *a, **k):
        return self.call(*a, **k)

    def precompute_embeddings(self, *a, **k):
        return self.pre(*a, **k)

    def __getattr__(self, name):
        return getattr(self._seg, name)


class _TimedFilter:
    """Delegating crop-filter wrapper timing the host per-frame path
    and the batched device path separately."""

    def __init__(self, f):
        self._f = f
        self.call = _Timed(f.__call__)
        self.batch = _Timed(f.filter_frames_device)

    supports_batch_device = True

    def __call__(self, *a, **k):
        return self.call(*a, **k)

    def filter_frames_device(self, *a, **k):
        return self.batch(*a, **k)

    def __getattr__(self, name):
        return getattr(self._f, name)


def measured_pipeline(detector, segmenter, xparams, xcfg, tagger):
    """Wall-clock the REAL grounded pipeline (no projections): tracker
    over a 100-frame clip + RAM tagging + (stubbed) entity matching.
    Per-stage host-blocking time is accumulated for the LAST run so the
    measured-vs-projected gap decomposes into stages + glue."""
    import time

    from video_llava_tpu.grounding.builders import random_clip_filter
    from video_llava_tpu.grounding.entity_matching import (
        EntityMatchingModule,
    )
    from video_llava_tpu.grounding.memory_tracker import (
        LearnedMemoryTracker, TrackerConfig,
    )
    from video_llava_tpu.grounding.tracker import GroundedTracker

    rng = np.random.default_rng(1)
    frames = rng.integers(
        0, 255, size=(NUM_FRAMES, H, W, 3)
    ).astype(np.uint8)
    classes = ["person", "dog"]

    seg_wrap = (
        _TimedSegmenter(segmenter)
        if hasattr(segmenter, "precompute_embeddings") else segmenter
    )
    # CLIP ViT-B/32 crop filter, random weights (real ones are
    # unreachable here; latency is weight-value independent). The
    # reference filters inside EVERY detection step
    # (grounding_new_api.py:373-445), so the measured config keeps it
    # ON. Thresholds at 0/0 keep ~half the random-score detections —
    # representative object counts downstream (the shipped 0.1/0.2
    # thresholds would reject noise-scored crops wholesale).
    crop_filter = _TimedFilter(
        random_clip_filter(prob_threshold=0.0, score_threshold=0.0)
    )
    crop_filter._f.vision_params = _cast(crop_filter._f.vision_params)
    crop_filter._f.text_params = _cast(crop_filter._f.text_params)
    crop_filter._f.visual_projection = _cast(
        crop_filter._f.visual_projection
    )
    prop = LearnedMemoryTracker(xparams, xcfg)
    tracker = GroundedTracker(
        detector=_TopKDetector(detector, PRE_NMS_BOXES),
        segmenter=seg_wrap,
        crop_filter=crop_filter,
        detection_every=DETECT_EVERY,
        box_threshold=0.0,  # _TopKDetector already applied the cut
        tracker_cfg=TrackerConfig(max_objects=N_BOXES),
        propagator=prop,
        binary_masks=True,
    )
    stage_timers = {
        "detect": _Timed(tracker.detector.detect_batch),
        "propagate_step": _Timed(prop.step),
        "propagate_chunk": _Timed(prop.step_chunk),
        "memory_write": _Timed(prop.add_reference),
        "crop_filter_host": crop_filter.call,
    }
    tracker.detector.detect_batch = stage_timers["detect"]
    prop.step = stage_timers["propagate_step"]
    prop.step_chunk = stage_timers["propagate_chunk"]
    prop.add_reference = stage_timers["memory_write"]
    if isinstance(seg_wrap, _TimedSegmenter):
        stage_timers["sam_decode"] = seg_wrap.call
        stage_timers["sam_encode"] = seg_wrap.pre

    # -- per-segment host loop (the fallback path), filter ON
    t0 = time.perf_counter()
    res = tracker.run_host_loop(list(frames), classes)
    first_run_s = time.perf_counter() - t0
    assert len(res) == NUM_FRAMES
    times = []
    for _ in range(MEASURED_RUNS):
        for tm in stage_timers.values():
            tm.reset()
        t0 = time.perf_counter()
        tracker.run_host_loop(list(frames), classes)
        times.append(time.perf_counter() - t0)
    measured_s = float(np.median(times))
    stage_s = {k: round(v.t, 3) for k, v in stage_timers.items()}
    stage_s["glue"] = round(times[-1] - sum(
        v.t for v in stage_timers.values()
    ), 3)

    # -- the FUSED whole-clip path (grounding/fused_clip.py): the
    # pipeline as one device program — frames up once, bit-packed masks
    # down once. This IS the path run_on_list_of_images dispatches to
    # under this build (learned propagator + device-capable filter):
    # the headline measures what chat/eval actually run
    # (tests/test_fused_clip.py pins parity + dispatch). Grounded chat
    # shares ONE device clip upload across tagging and tracking
    # (chat.py answer()), so the measured flow does the same: upload
    # timed once, then device-resident frames feed both stages.
    assert tracker.fused_eligible()
    t0 = time.perf_counter()
    dev_frames = jnp.asarray(frames)
    np.asarray(dev_frames[0, 0, 0])  # block until resident
    upload_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    fres = tracker.run_on_list_of_images(dev_frames, classes)
    fused_first_s = time.perf_counter() - t0
    assert len(fres) == NUM_FRAMES
    fused_times = []
    filter_batch_s = []
    for _ in range(MEASURED_RUNS):
        crop_filter.batch.reset()
        t0 = time.perf_counter()
        tracker.run_on_list_of_images(dev_frames, classes)
        fused_times.append(time.perf_counter() - t0)
        filter_batch_s.append(crop_filter.batch.t)
    fused_s = float(np.median(fused_times))

    # filter-OFF fused run: isolates the batched filter's cost
    tracker.crop_filter = None
    tracker.run_on_list_of_images(dev_frames, classes)  # compile
    nofilter_times = []
    for _ in range(MEASURED_RUNS):
        t0 = time.perf_counter()
        tracker.run_on_list_of_images(dev_frames, classes)
        nofilter_times.append(time.perf_counter() - t0)
    tracker.crop_filter = crop_filter
    fused_nofilter_s = float(np.median(nofilter_times))

    # RAM tagging over all frames (reference chat.py:261 runs this
    # before tracking even starts); device-side resize/normalize, fed
    # from the SHARED device clip (no second 120 MB upload).
    tagger.run_on_video(dev_frames[:20], top_k=10)  # compile
    t0 = time.perf_counter()
    tags = tagger.run_on_video(dev_frames, top_k=10)
    tagging_s = time.perf_counter() - t0

    # Entity matching is one chat call to an OpenAI-compatible endpoint
    # (reference entity_matching_openai.py:119-184) — network-bound, so
    # the stub times only our prompt assembly + response parsing.
    class _StubClient:
        def chat_text(self, model, messages):
            return "person - person\ndog - dog"

    matcher = EntityMatchingModule(client=_StubClient())
    t0 = time.perf_counter()
    matcher("A person walks a dog across the field.",
            tags or ["person", "dog"])
    entity_stub_s = time.perf_counter() - t0

    return {
        # run_on_list_of_images dispatch (= fused program, crop filter
        # ON — the config chat/eval run under this build)
        "measured_s": round(fused_s, 3),
        "fused_runs": [round(t, 3) for t in fused_times],
        "fused_first_run_s": round(fused_first_s, 3),  # incl. compiles
        "fused_nofilter_s": round(fused_nofilter_s, 3),
        "crop_filter_batch_s": round(float(np.median(filter_batch_s)), 3),
        "clip_upload_s": round(upload_s, 3),  # the ONE shared upload
        "hostloop_s": round(measured_s, 3),  # per-segment dispatch path
        "hostloop_runs": [round(t, 3) for t in times],
        "stage_s": stage_s,  # host-blocking decomposition, host loop
        "first_run_s": round(first_run_s, 3),  # includes compiles
        "tagging_s": round(tagging_s, 3),
        "entity_match_stub_s": round(entity_stub_s, 4),
        # the grounded-chat answer flow: ONE clip upload shared by
        # tagging + fused tracking, then entity matching
        "full_pipeline_s": round(
            upload_s + fused_s + tagging_s + entity_stub_s, 3
        ),
    }


def main():
    # GROUNDING_MEASURED_ONLY=1 skips the per-stage device timings (and
    # the ViT-B comparison build entirely) and runs just the measured
    # end-to-end pipeline — the fast path for iterating on host glue.
    measured_only = os.environ.get("GROUNDING_MEASURED_ONLY", "0") == "1"

    from video_llava_tpu.grounding.builders import build_sam
    from video_llava_tpu.models import grounding_dino as gdino_mod
    from video_llava_tpu.models import sam as sam_mod
    from video_llava_tpu.models import xmem
    from video_llava_tpu.ops.image import normalize_clip, resize_bicubic
    from video_llava_tpu.utils.timing import measure

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
    frame_f = frame.astype(np.float32) / 255.0
    det_bs = 4
    gap = DETECT_EVERY - 1
    stage: dict = {}

    # Two numbers per detection stage: `device` = the jitted program with
    # device-resident inputs (the TPU cost that matters for design), and
    # `pipeline` = the shipped __call__ including host I/O — inflated
    # here by the tunneled link (~26 ms RTT, ~MB/s-scale transfers), not
    # representative of a local TPU host.

    # -- GroundingDINO (SwinT-OGC size, 800px) -------------------------------
    print("building detector...", flush=True)
    detector = gdino_mod.build_detector(None)
    detector.params = _cast(detector.params)
    if not measured_only:
        det = lambda: detector(frame, ["person", "dog"])  # noqa: E731
        det()  # compile
        t_detect = measure(
            lambda i: jnp.float32(det()[1].sum() + 0 * i), iters=3
        )
        # device-only: precomputed pixels/ids through the jitted forward
        dsize = detector.image_size
        pixels = normalize_clip(
            jnp.clip(jnp.round(resize_bicubic(
                jnp.asarray(frame.astype(np.float32)), dsize, dsize
            )), 0, 255)
        )[None].astype(detector.params["level_embed"].dtype)
        ids = np.asarray([detector.tokenize("person . dog .")], np.int64)
        t_detect_dev = measure(
            lambda i: gdino_mod.forward(
                detector.params, detector.cfg, pixels + 0.0 * i, ids
            )[0],
            iters=3,
        )
        # batched detection (tracker.precompute_detections batches the
        # known-upfront detection frames, detect_batch_size=4 default) —
        # amortizes the text tower, the 900-query head and kernel launch
        # overheads over the MXU batch dim
        pixels_b = jnp.tile(pixels, (det_bs, 1, 1, 1))
        ids_b = np.repeat(ids, det_bs, axis=0)
        t_detect_b = measure(
            lambda i: gdino_mod.forward(
                detector.params, detector.cfg, pixels_b + 0.0 * i, ids_b
            )[0],
            iters=3,
        )
        t_detect_amort = t_detect_b / det_bs
        stage.update(
            detect_device_ms=round(t_detect_dev * 1e3, 1),
            detect_batch4_per_frame_ms=round(t_detect_amort * 1e3, 1),
            detect_pipeline_ms=round(t_detect * 1e3, 1),
        )

        # GROUNDING_PROFILE=DIR captures a jax.profiler trace of one
        # warm batched detector forward (the dominant device program).
        profile_dir = os.environ.get("GROUNDING_PROFILE")
        if profile_dir:
            from video_llava_tpu.utils.timing import sync as _sync

            with jax.profiler.trace(profile_dir):
                _sync(gdino_mod.forward(
                    detector.params, detector.cfg, pixels_b, ids_b
                )[0])
            print(f"# profiler trace written to {profile_dir}", flush=True)

    # -- SAM (ViT-B, 1024px, best-of-3) — timed for comparison only ----------
    boxes = np.asarray(
        [[40 + 10 * i, 60, 240 + 10 * i, 300] for i in range(N_BOXES)],
        np.float32,
    )
    sboxes = jnp.asarray(boxes)[None]
    if not measured_only:
        print("building sam...", flush=True)
        sam = build_sam(None, variant="vit_b")
        sam.params = _cast(sam.params)
        seg = lambda: sam(frame, boxes)  # noqa: E731
        seg()
        t_sam = measure(
            lambda i: jnp.float32(seg().sum() + 0 * i), iters=3
        )
        ssz = sam.cfg.vision.image_size
        spix = normalize_clip(
            jnp.clip(jnp.round(resize_bicubic(
                jnp.asarray(frame.astype(np.float32)), ssz, ssz
            )), 0, 255)
        )[None].astype(next(iter(jax.tree.leaves(sam.params))).dtype)
        predict_jit = jax.jit(
            lambda p, px, bx: sam_mod.predict_boxes(p, px, bx, sam.cfg)
        )
        t_sam_dev = measure(
            lambda i: predict_jit(sam.params, spix + 0.0 * i, sboxes)[0],
            iters=3,
        )
        # split pipeline: detection frames are known upfront, so their
        # SAM image embeddings batch-encode (precompute_detections);
        # the per-frame call then runs only the prompt+mask decoder.
        spix_b = jnp.tile(spix, (det_bs, 1, 1, 1))
        t_sam_enc_b = measure(
            lambda i: sam._encode(sam.params, spix_b + 0.0 * i), iters=3
        )
        emb1 = sam._encode(sam.params, spix)
        t_sam_dec = measure(
            lambda i: sam._decode(sam.params, emb1 + 0.0 * i, sboxes)[0],
            iters=3,
        )
        t_sam_amort = t_sam_enc_b / det_bs + t_sam_dec
        stage.update(
            sam_device_ms=round(t_sam_dev * 1e3, 1),
            sam_enc_batch4_per_frame_ms=round(
                t_sam_enc_b / det_bs * 1e3, 1
            ),
            sam_decode_ms=round(t_sam_dec * 1e3, 1),
            sam_amortized_per_frame_ms=round(t_sam_amort * 1e3, 1),
            sam_pipeline_ms=round(t_sam * 1e3, 1),
        )

    # -- MobileSAM (TinyViT-5M, 1024px) — the SHIPPED default segmenter
    # (build_sam variant='mobile'; reference live config
    # grounding_new_api.py:104). Same prompt/mask decoder; ~10x cheaper
    # encoder than ViT-B.
    print("building mobile-sam...", flush=True)
    msam = build_sam(None, variant="mobile")
    msam.params = _cast(msam.params)
    if not measured_only:
        mpix = spix.astype(next(iter(jax.tree.leaves(msam.params))).dtype)
        mpix_b = jnp.tile(mpix, (det_bs, 1, 1, 1))
        msam._encode(msam.params, mpix_b)  # compile
        t_msam_enc_b = measure(
            lambda i: msam._encode(msam.params, mpix_b + 0.0 * i), iters=3
        )
        memb1 = msam._encode(msam.params, mpix)
        msam._decode(msam.params, memb1, sboxes)
        t_msam_dec = measure(
            lambda i: msam._decode(msam.params, memb1 + 0.0 * i, sboxes)[0],
            iters=3,
        )
        t_msam_amort = t_msam_enc_b / det_bs + t_msam_dec
        stage.update(
            mobile_sam_enc_batch4_per_frame_ms=round(
                t_msam_enc_b / det_bs * 1e3, 1
            ),
            mobile_sam_decode_ms=round(t_msam_dec * 1e3, 1),
            mobile_sam_amortized_per_frame_ms=round(t_msam_amort * 1e3, 1),
        )

    # -- learned propagation (XMem) ------------------------------------------
    print("building xmem...", flush=True)
    xcfg = xmem.XMemConfig(max_objects=N_BOXES)
    # XMem stays f32: at ~19 ms/frame it is not the bottleneck, and its
    # state/frame plumbing is f32.
    xparams = jax.jit(
        lambda k: xmem.init_params(k, xcfg, jnp.float32)
    )(jax.random.PRNGKey(0))
    if not measured_only:
        state = xmem.init_state(xcfg, H // 16, W // 16)
        masks = np.zeros((N_BOXES, H, W), np.float32)
        masks[:, 100:300, 100:400] = 1.0
        state = xmem.add_reference_step(
            xparams, state, jnp.asarray(frame_f), jnp.asarray(masks),
            jnp.int32(N_BOXES), xcfg,
        )
        fj = jnp.asarray(frame_f)

        def prop(i, update):
            out, _ = xmem.propagate_step(
                xparams, state, fj + 0.0 * i, xcfg, update_memory=update,
                deep_update=update,
            )
            return out

        prop(0, False)
        prop(0, True)
        t_prop = measure(lambda i: prop(i, False), iters=3)
        t_prop_write = measure(lambda i: prop(i, True), iters=3)

        # chunked propagation: the tracker propagates each
        # inter-detection gap (DETECT_EVERY-1 frames) as ONE program —
        # batched key encode + on-device scan (xmem.propagate_chunk).
        frames_gap = jnp.stack([fj] * gap)
        # Representative memory-write cadence: the shipped mem_every=5
        # fires roughly one value-encode+write inside each
        # inter-detection gap, so the chunk is timed with one update
        # flag set (not all-False).
        flags = jnp.zeros((gap,), bool).at[gap // 2].set(True)
        deep_flags = jnp.zeros((gap,), bool)

        def prop_chunk(i):
            out, _ = xmem.propagate_chunk(
                xparams, state, frames_gap + 0.0 * i, flags, deep_flags,
                xcfg,
            )
            return out

        prop_chunk(0)
        t_chunk = measure(prop_chunk, iters=3)

        # memory write at each detection frame (tracker._incorporate ->
        # add_reference: key+value encode + ring write)
        masks_j = jnp.asarray(masks)

        def addref(i):
            return xmem.add_reference_step(
                xparams, state, fj + 0.0 * i, masks_j, jnp.int32(N_BOXES),
                xcfg,
            ).hidden

        addref(0)
        t_addref = measure(addref, iters=3)

        # -- handcrafted STM (comparison) --------------------------------
        from video_llava_tpu.grounding.memory_tracker import (
            MemoryTracker, TrackerConfig, _default_step,
        )

        stm = MemoryTracker(TrackerConfig(max_objects=N_BOXES))
        stm.add_reference(frame_f, masks)
        fj32 = jnp.asarray(frame_f, jnp.float32)
        _default_step(stm.state, fj32, stm.cfg, False)
        t_stm = measure(
            lambda i: _default_step(
                stm.state, fj32 + 0.0 * i, stm.cfg, False
            )[0],
            iters=3,
        )

        n_det = -(-NUM_FRAMES // DETECT_EVERY)
        n_prop = NUM_FRAMES - n_det
        n_chunks = -(-n_prop // gap)
        # Device-program projection (the TPU cost alone). Models the
        # shipped online orchestration: per detection frame one batched
        # detect + SAM decode (encoders amortized), one propagate
        # (update_memory=False) inside _incorporate's match step (all
        # detection frames after the first), and one memory write
        # (add_reference); per gap one chunked propagation program
        # timed with the representative in-chunk memory-write flag.
        clip_s = (
            n_det * (t_detect_amort + t_msam_amort + t_addref)
            + (n_det - 1) * t_prop
            + n_chunks * t_chunk
        )
        clip_s_vitb = (
            n_det * (t_detect_amort + t_sam_amort + t_addref)
            + (n_det - 1) * t_prop
            + n_chunks * t_chunk
        )
        stage.update(
            projected_clip_s=round(clip_s, 3),
            clip_s_vitb=round(clip_s_vitb, 3),
            xmem_propagate_ms=round(t_prop * 1e3, 1),
            xmem_propagate_write_ms=round(t_prop_write * 1e3, 1),
            xmem_chunk4_per_frame_ms=round(t_chunk / gap * 1e3, 1),
            xmem_add_reference_ms=round(t_addref * 1e3, 1),
            handcrafted_stm_ms=round(t_stm * 1e3, 1),
        )

    # -- MEASURED end-to-end pipeline (the headline) --------------------------
    print("measuring real pipeline...", flush=True)
    from video_llava_tpu.grounding.builders import build_tagger

    tagger = build_tagger(None)
    tagger.backbone_params = _cast(tagger.backbone_params)
    tagger.head_params = _cast(tagger.head_params)
    measured = measured_pipeline(detector, msam, xparams, xcfg, tagger)
    link = _measure_link()

    result = {
        "metric": "grounding_clip_p50",
        "value": measured["measured_s"],
        "unit": "s/100-frame clip (measured wall clock)",
        "detail": {
            **measured,
            "link": link,
            **stage,
            "detect_every": DETECT_EVERY,
            "frames": NUM_FRAMES,
            "boxes_per_detection": N_BOXES,
            "models": f"gdino-swint-800px + clip-b32-filter + "
                      f"mobile-sam(tinyvit-5m) 1024px "
                      f"(vit-b timed for comparison) + "
                      f"xmem r50/r18 {H}x{W}, {DTYPE}",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Grounded tracking orchestrator: detect + segment + propagate.

Parity: reference Tracker_with_GroundingDINO
(grounding_evaluation/grounding_new_api.py:242-598):
  * `detect_and_segment_on_frame` (:373-445): text-prompted detection ->
    NMS -> SAM box masks -> CLIP zero-shot crop filtering -> an id mask
    built in descending-area order so the smallest object survives;
  * `process_frame` (:448-521): 'online' (detect every N frames,
    propagate otherwise) and 'semionline' (buffer num_voting_frames,
    vote, incorporate) temporal settings;
  * `run_on_video` / `run_on_list_of_images` (:574-598).

The detector / segmenter / crop-filter are injected callables so the
orchestrator composes our JAX GroundingDINO, SAM and CLIP — or test
stubs — without code changes. Propagation is the JAX memory tracker.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

import jax

from video_llava_tpu.grounding.memory_tracker import MemoryTracker, TrackerConfig
from video_llava_tpu.ops.box_ops import box_iou, masks_to_boxes, nms


# all detection frames' NMS in ONE program (the per-frame jit costs a
# tunnel round trip each over the fused path's 20 detection frames)
_nms_frames = jax.jit(
    jax.vmap(nms, in_axes=(0, 0, None)), static_argnums=()
)


@jax.jit
def _mask_match_iou(det_masks, prev_masks):
    """detection/track association scores in ONE device program:
    masks -> boxes for both sides + pairwise IoU (the eager composition
    costs 3 dispatches + fetches per detection frame)."""
    det_boxes = masks_to_boxes(det_masks > 0)
    prev_boxes = masks_to_boxes(prev_masks > 0.5)
    return box_iou(det_boxes, prev_boxes)[0]

Detector = Callable[[np.ndarray, Sequence[str]], Tuple[np.ndarray, np.ndarray, np.ndarray]]
Segmenter = Callable[[np.ndarray, np.ndarray], np.ndarray]
CropFilter = Callable[[np.ndarray, np.ndarray, np.ndarray, Sequence[str]], np.ndarray]


class ObjectInfo(NamedTuple):
    id: int
    category_id: int
    score: float


class FrameResult(NamedTuple):
    frame_index: int
    masks: np.ndarray  # (max_objects, H, W) soft masks
    objects: List[ObjectInfo]


@dataclasses.dataclass
class GroundedTracker:
    detector: Detector
    segmenter: Segmenter
    crop_filter: Optional[CropFilter] = None
    classes: Sequence[str] = ()
    detection_every: int = 5
    temporal_setting: str = "online"  # or 'semionline'
    num_voting_frames: int = 3
    box_threshold: float = 0.35
    nms_threshold: float = 0.5
    iou_match_threshold: float = 0.5
    tracker_cfg: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    # Optional propagation engine override (same lifecycle as
    # MemoryTracker): pass a memory_tracker.LearnedMemoryTracker built
    # from converted XMem/DEVA weights to use the trained propagation
    # network instead of the handcrafted-feature STM.
    propagator: Optional[object] = None
    # Frames per batched detector forward in run_on_list_of_images.
    # Detection frames are known upfront (every Nth), and raw detection
    # is state-free, so they batch onto the MXU — the reference's
    # per-frame loop (grounding_new_api.py:448-521) cannot. The last
    # chunk pads by repeating frames so every chunk compiles once.
    detect_batch_size: int = 4
    # Max SAM image embeddings resident at once: embeddings are ~4 MB
    # each (64x64x256 f32), so precomputing ALL detection frames of a
    # long clip upfront grows HBM linearly with video length. Instead a
    # sliding window of this many detection frames is kept encoded ahead
    # of the processing cursor (run_on_list_of_images tops it up before
    # each detection frame; consumed embeddings are popped on use).
    emb_prefetch_frames: int = 8
    # binary_masks=True: propagators threshold at 0.5 ON DEVICE and
    # return uint8 {0,1} masks — 4x less device->host mask traffic per
    # frame (the dominant PCIe cost of the pipeline) at the price of
    # losing sub-threshold soft values in FrameResult.masks.
    binary_masks: bool = False
    # prefer_fused=True routes run_on_list_of_images through the fused
    # whole-clip program whenever the build supports it (online mode +
    # learned propagator + device-capable or absent crop filter) — the
    # per-segment host loop stays as run_host_loop for other configs.
    prefer_fused: bool = True

    def __post_init__(self):
        self.tracker = self.propagator or MemoryTracker(self.tracker_cfg)
        self._objects: List[ObjectInfo] = []
        self._buffer: List[Tuple[int, np.ndarray, np.ndarray, List[ObjectInfo]]] = []
        self._det_cache: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._emb_plan: List[int] = []

    # -- lifecycle (reference init_tracker/clear_tracker) --------------------

    def clear(self):
        self.tracker.clear()
        self._objects = []
        self._buffer = []
        self._det_cache = {}
        self._emb_plan = []
        clear_cache = getattr(self.segmenter, "clear_cache", None)
        if clear_cache is not None:
            clear_cache()

    # -- detection ------------------------------------------------------------

    def precompute_detections(
        self, frames: Sequence[np.ndarray], frame_indices: Sequence[int],
        prompts: Sequence[str],
    ) -> None:
        """Run the raw detector over `frame_indices` in fixed-size
        batches, filling the per-frame cache that detect_and_segment
        consumes. No-op for detectors without `detect_batch`."""
        detect_batch = getattr(self.detector, "detect_batch", None)
        if detect_batch is not None and self.detect_batch_size > 1:
            idx = [i for i in frame_indices if i not in self._det_cache]
            k = self.detect_batch_size
            for start in range(0, len(idx), k):
                chunk = idx[start : start + k]
                # pad to the static chunk size by repeating the last frame
                padded = chunk + [chunk[-1]] * (k - len(chunk))
                batch = np.stack([frames[i] for i in padded])
                results = detect_batch(batch, prompts)
                for i, res in zip(chunk, results[: len(chunk)]):
                    self._det_cache[i] = res
        # SAM's image encoder is frame-independent too: batch-encode the
        # detection frames so detect_and_segment only runs the light
        # prompt+mask decoder per frame. Gated on the SEGMENTER's own
        # batching knob (independent of detect_batch_size: disabling
        # detector batching must not silently disable SAM amortization),
        # and bounded: only the first emb_prefetch_frames frames encode
        # here; the rest stream in as the cursor advances.
        precompute_emb = getattr(self.segmenter, "precompute_embeddings", None)
        if (
            precompute_emb is not None
            and getattr(self.segmenter, "encode_batch_size", 1) > 1
        ):
            self._emb_plan = [
                i for i in frame_indices
                if i not in getattr(self.segmenter, "_emb_cache", {})
            ]
            self._prefetch_embeddings(frames)

    def _prefetch_embeddings(self, frames: Sequence[np.ndarray]) -> None:
        """Top up the sliding window of precomputed SAM embeddings: keep
        up to `emb_prefetch_frames` detection frames encoded ahead of the
        cursor (bounds HBM at ~4 MB x window instead of growing with
        video length)."""
        if not self._emb_plan:
            return
        precompute_emb = getattr(self.segmenter, "precompute_embeddings", None)
        if precompute_emb is None:
            return
        count = getattr(self.segmenter, "num_cached_embeddings", None)
        cached = count() if callable(count) else 0
        room = self.emb_prefetch_frames - cached
        if room <= 0:
            return
        batch, self._emb_plan = (
            self._emb_plan[:room], self._emb_plan[room:]
        )
        precompute_emb(frames, batch)

    def detect_and_segment(
        self, image: np.ndarray, prompts: Sequence[str],
        frame_index: Optional[int] = None,
    ) -> Tuple[np.ndarray, List[ObjectInfo]]:
        """-> (masks (n, H, W) float in {0,1} sorted by descending area,
        object infos). Mirrors grounding_new_api.py:373-445."""
        cached = (
            self._det_cache.pop(frame_index, None)
            if frame_index is not None else None
        )
        if cached is not None:
            boxes, conf, class_ids = cached
        else:
            boxes, conf, class_ids = self.detector(image, prompts)
        if len(boxes):
            keep = conf >= self.box_threshold
            boxes, conf, class_ids = boxes[keep], conf[keep], class_ids[keep]
        if len(boxes) == 0:
            # release any precomputed SAM embedding for this frame
            discard = getattr(self.segmenter, "discard_embedding", None)
            if discard is not None and frame_index is not None:
                discard(frame_index)
            return np.zeros((0,) + image.shape[:2], np.float32), []
        keep = np.asarray(
            nms(jnp.asarray(boxes), jnp.asarray(conf), self.nms_threshold)
        )
        boxes, conf, class_ids = boxes[keep], conf[keep], class_ids[keep]

        if getattr(self.segmenter, "supports_frame_cache", False):
            masks = self.segmenter(image, boxes, frame_index=frame_index)
        else:
            masks = self.segmenter(image, boxes)  # (n, H, W)
        if self.crop_filter is not None and len(boxes):
            keep = self.crop_filter(image, boxes, class_ids, prompts)
            boxes, conf, class_ids, masks = (
                boxes[keep], conf[keep], class_ids[keep], masks[keep],
            )

        # descending area so the smallest object is painted last
        areas = masks.reshape(len(masks), -1).sum(axis=1)
        order = np.argsort(-areas)
        infos = [
            ObjectInfo(id=i + 1, category_id=int(class_ids[j]),
                       score=float(conf[j]))
            for i, j in enumerate(order)
        ]
        return masks[order].astype(np.float32), infos

    # -- propagation plumbing --------------------------------------------------

    def _mask_dtype(self):
        return np.uint8 if self.binary_masks else np.float32

    def _step(self, frame: np.ndarray, **kw) -> np.ndarray:
        """tracker.step with the binary-mask flag threaded only when
        enabled (custom/stub propagators need not accept it)."""
        if self.binary_masks:
            kw["binary"] = True
        return self.tracker.step(frame, **kw)

    # -- detection <-> propagation association --------------------------------

    def _incorporate(
        self, frame01: np.ndarray, det_masks: np.ndarray,
        det_infos: List[ObjectInfo],
    ) -> np.ndarray:
        """Match detections to tracked objects by mask IoU; matched
        detections refresh their object's mask, unmatched spawn new ids
        (DEVA incorporate_detection semantics)."""
        max_o = self.tracker_cfg.max_objects
        H, W = frame01.shape[:2]
        if self.tracker.state is None or not self._objects:
            n = min(len(det_masks), max_o)
            self._objects = [
                ObjectInfo(i + 1, det_infos[i].category_id, det_infos[i].score)
                for i in range(n)
            ]
            slots = np.zeros((max_o, H, W), self._mask_dtype())
            slots[:n] = det_masks[:n]
            self.tracker.clear()
            if n:
                self.tracker.add_reference(
                    frame01, slots, num_objects=len(self._objects)
                )
            return slots

        prev = self._step(frame01, update_memory=False)  # (max_o, H, W)
        slots = prev.copy()
        used = set()
        if len(det_masks):
            up = (
                det_masks.astype(np.uint8)
                if self.binary_masks else det_masks
            )
            iou = np.asarray(
                _mask_match_iou(jnp.asarray(up), jnp.asarray(prev))
            )
            for d in range(len(det_masks)):
                j = int(np.argmax(iou[d])) if iou.shape[1] else -1
                if j >= 0 and iou[d, j] >= self.iou_match_threshold and (
                    j < len(self._objects) and j not in used
                ):
                    slots[j] = det_masks[d]
                    used.add(j)
                elif len(self._objects) < self.tracker_cfg.max_objects:
                    new_id = len(self._objects)
                    self._objects.append(
                        ObjectInfo(new_id + 1, det_infos[d].category_id,
                                   det_infos[d].score)
                    )
                    slots[new_id] = det_masks[d]
        self.tracker.add_reference(
            frame01, slots, num_objects=len(self._objects)
        )
        return slots

    # -- per-frame processing ---------------------------------------------------

    def process_frame(self, ti: int, image: np.ndarray) -> Optional[List[FrameResult]]:
        """image: (H, W, 3) uint8 RGB. Returns results ready at this
        step (semionline buffers frames; online returns one result).

        Frames flow to the propagators/detector as raw uint8 — the /255
        float conversion happens on DEVICE inside their jitted programs
        (4x less host->device traffic than converting on host)."""
        frame01 = image
        prompts = list(self.classes)

        if self.temporal_setting == "online":
            if ti % self.detection_every == 0:
                det_masks, infos = self.detect_and_segment(
                    image, prompts, frame_index=ti
                )
                slots = self._incorporate(frame01, det_masks, infos)
            else:
                slots = self._step(frame01) if self.tracker.state is not None else np.zeros(
                    (self.tracker_cfg.max_objects,) + image.shape[:2],
                    self._mask_dtype(),
                )
            return [FrameResult(ti, slots, list(self._objects))]

        # semionline: collect detections for num_voting_frames, vote.
        det_masks, infos = self.detect_and_segment(
            image, prompts, frame_index=ti
        )
        self._buffer.append((ti, frame01, det_masks, infos))
        if len(self._buffer) < self.num_voting_frames:
            return None
        results: List[FrameResult] = []
        # keyframe = first buffered frame; majority-vote its detections
        t0, f0, m0, i0 = self._buffer[0]
        voted_masks, voted_infos = self._vote()
        slots = self._incorporate(f0, voted_masks, voted_infos)
        results.append(FrameResult(t0, slots, list(self._objects)))
        for tj, fj, _, _ in self._buffer[1:]:
            slots = self._step(fj)
            results.append(FrameResult(tj, slots, list(self._objects)))
        self._buffer = []
        return results

    def _vote(self) -> Tuple[np.ndarray, List[ObjectInfo]]:
        """Keep keyframe detections confirmed (IoU>=0.5) in a majority
        of the buffered frames (DEVA's spatio-temporal voting)."""
        t0, f0, m0, i0 = self._buffer[0]
        if len(m0) == 0:
            return m0, i0
        votes = np.zeros(len(m0), np.int32)
        b0 = np.asarray(masks_to_boxes(jnp.asarray(m0)))
        for _, _, mj, _ in self._buffer[1:]:
            if len(mj) == 0:
                continue
            bj = np.asarray(masks_to_boxes(jnp.asarray(mj)))
            iou = np.asarray(box_iou(jnp.asarray(b0), jnp.asarray(bj))[0])
            votes += (iou.max(axis=1) >= 0.5).astype(np.int32)
        need = (len(self._buffer) - 1 + 1) // 2
        keep = votes >= need
        return m0[keep], [info for k, info in zip(keep, i0) if k]

    # -- public APIs (reference :574-598) ----------------------------------------

    def fused_eligible(self) -> bool:
        """True when this build can take the fused whole-clip program:
        online or semionline mode (semionline votes on device —
        fused_clip.vote_detections — and runs the same program with
        detect_every=num_voting_frames), a fusable propagator (learned
        XMem, or the default-feature handcrafted STM — i.e. both
        configurations build_grounding_stack produces), and a crop
        filter that either is absent or scores box batches on device."""
        fusable_prop = hasattr(self.tracker, "_xmem") or (
            isinstance(self.tracker, MemoryTracker)
            and getattr(self.tracker, "_fused", False)
        )
        return (
            self.prefer_fused
            and self.temporal_setting in ("online", "semionline")
            and fusable_prop
            and (
                self.crop_filter is None
                or getattr(self.crop_filter, "supports_batch_device",
                           False)
            )
        )

    def run_on_list_of_images(
        self, frames: Sequence[np.ndarray], classes: Sequence[str]
    ) -> List[FrameResult]:
        """Reference run_on_list_of_images (grounding_new_api.py:
        592-598). Dispatches to the fused whole-clip device program
        when the build supports it (chat/eval take this path under a
        learned propagator), else the per-segment host loop."""
        if self.fused_eligible():
            # binary mirrors binary_masks so the FrameResult contract
            # (uint8 {0,1} vs f32 soft masks) matches the host loop's.
            return self.run_on_list_of_images_fused(
                frames, classes, binary=self.binary_masks
            )
        return self.run_host_loop(frames, classes)

    def run_host_loop(
        self, frames: Sequence[np.ndarray], classes: Sequence[str]
    ) -> List[FrameResult]:
        self.classes = list(classes)
        self.clear()
        det_frames = (
            range(0, len(frames), self.detection_every)
            if self.temporal_setting == "online"
            else range(len(frames))
        )
        self.precompute_detections(frames, list(det_frames), list(classes))
        results: List[FrameResult] = []
        chunk_step = (
            getattr(self.tracker, "step_chunk", None)
            if self.temporal_setting == "online" else None
        )
        if chunk_step is not None:
            # Online mode with a chunk-capable propagator: the frames
            # between two detections propagate as ONE device program
            # (batched key encode + on-device scan) instead of one
            # dispatch per frame.
            n = len(frames)
            ti = 0
            while ti < n:
                if ti % self.detection_every == 0:
                    self._prefetch_embeddings(frames)
                    results.extend(self.process_frame(ti, frames[ti]))
                    ti += 1
                    continue
                gap_end = min(
                    n,
                    (ti // self.detection_every + 1) * self.detection_every,
                )
                gap = list(range(ti, gap_end))
                if self.tracker.state is None:
                    zeros = np.zeros(
                        (self.tracker_cfg.max_objects,)
                        + frames[gap[0]].shape[:2],
                        self._mask_dtype(),
                    )
                    results.extend(
                        FrameResult(tj, zeros, list(self._objects))
                        for tj in gap
                    )
                else:
                    chunk_kw = (
                        {"binary": True} if self.binary_masks else {}
                    )
                    masks = chunk_step(
                        [frames[tj] for tj in gap],
                        pad_to=self.detection_every - 1,
                        **chunk_kw,
                    )
                    results.extend(
                        FrameResult(tj, masks[j], list(self._objects))
                        for j, tj in enumerate(gap)
                    )
                ti = gap_end
        else:
            for ti, frame in enumerate(frames):
                self._prefetch_embeddings(frames)
                out = self.process_frame(ti, frame)
                if out:
                    results.extend(out)
        # flush semionline remainder by propagation
        for tj, fj, _, _ in self._buffer:
            if self.tracker.state is not None:
                results.append(
                    FrameResult(tj, self._step(fj), list(self._objects))
                )
        self._buffer = []
        results.sort(key=lambda r: r.frame_index)
        return results

    def run_on_list_of_images_fused(
        self, frames: Sequence[np.ndarray], classes: Sequence[str],
        max_dets: int = 8, binary: bool = True,
    ) -> List[FrameResult]:
        """Whole-clip fused path: the detect->associate->write->propagate
        chain runs as ONE device program (grounding/fused_clip.py), with
        frames uploaded once and bit-packed masks fetched once — vs the
        regular path's per-segment dispatches and mask transfers (which
        dominate wall clock on any host, catastrophically so on a
        tunneled TPU).

        Semantics match run_host_loop for the supported config: online
        mode, a LearnedMemoryTracker propagator, optionally a
        batch-device-capable crop filter (parity-tested in
        tests/test_fused_clip.py). `max_dets` bounds detections per
        frame post-NMS (top-scoring kept; the reference's 0.35
        threshold leaves a handful with real weights).

        The clip uploads to the device ONCE (uint8); detection
        batches, SAM encodes and the crop filter all consume
        device-resident slices of that one buffer (the r3 path
        re-uploaded the detection frames twice on top of the clip —
        ~2x the required host->device traffic, seconds on a tunneled
        link). Callers may also pass `frames` as an already
        device-resident (T, H, W, 3) jax array (chat shares one upload
        across tagging and tracking).
        """
        from video_llava_tpu.grounding import fused_clip
        from video_llava_tpu.models import xmem as xmem_mod

        semi = self.temporal_setting == "semionline"
        if self.crop_filter is not None and not getattr(
            self.crop_filter, "supports_batch_device", False
        ):
            raise NotImplementedError(
                "crop filter lacks filter_frames_device; use "
                "run_host_loop"
            )
        prop = self.tracker
        is_stm = isinstance(prop, MemoryTracker) and getattr(
            prop, "_fused", False
        )
        if not (hasattr(prop, "_xmem") or is_stm):
            raise NotImplementedError(
                "fused path needs a LearnedMemoryTracker or a "
                "default-feature MemoryTracker propagator"
            )
        self.classes = list(classes)
        self.clear()

        # semionline (DEVA 3-frame voting, ref grounding_new_api.py:
        # 448-521): every frame is detected, voting gates which
        # keyframe detections incorporate, and the segment length is
        # the voting window — the SAME fused program runs with
        # detect_every=num_voting_frames and pre-voted detections.
        E = self.num_voting_frames if semi else self.detection_every
        t0 = len(frames)
        n_seg = -(-t0 // E)
        t_pad = n_seg * E
        on_device = isinstance(frames, jax.Array)
        xp = jnp if on_device else np
        arr = frames if on_device else np.asarray(frames)
        if t_pad > t0:
            arr = xp.concatenate(
                [arr, xp.repeat(arr[-1:], t_pad - t0, axis=0)]
            )
        h, w = arr.shape[1:3]
        # XMem needs stride-16 frame padding; the STM runs at native
        # size (its packed transport pads width to bytes internally)
        ph, pw = (0, 0) if is_stm else (-h % 16, -w % 16)
        padded = (
            xp.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            if (ph or pw) else arr
        )
        frame_valid = np.arange(t_pad) < t0
        # THE one clip upload: every downstream consumer (detector, crop
        # filter, SAM, the fused scan) slices this device buffer.
        dev_clip = jnp.asarray(padded)

        # -- detection: batched forwards, host threshold, ONE vmapped NMS
        # (not precompute_detections: its SAM-embedding prefetch would
        # encode frames decode_masks_batch_device re-encodes anyway)
        det_idx = (
            list(range(t0)) if semi
            else [s * E for s in range(n_seg) if s * E < t0]
        )
        n_det = len(det_idx)
        # detection frames as device slices of the clip buffer (one
        # gather program; no second host->device transfer)
        dev_det = dev_clip[jnp.asarray(det_idx, jnp.int32), :h, :w]
        detect_batch = getattr(self.detector, "detect_batch", None)
        raw = []
        if detect_batch is not None and self.detect_batch_size > 1:
            kb = self.detect_batch_size
            for start in range(0, len(det_idx), kb):
                n_chunk = min(kb, len(det_idx) - start)
                chunk = dev_det[start : start + n_chunk]
                if n_chunk < kb:  # pad by repeating the last frame
                    chunk = jnp.concatenate(
                        [chunk, jnp.repeat(chunk[-1:], kb - n_chunk,
                                           axis=0)]
                    )
                out = detect_batch(chunk, list(classes))
                raw.extend(out[:n_chunk])
        else:
            det_host = np.asarray(dev_det)  # stub detectors (tests)
            raw = [self.detector(det_host[i], classes)
                   for i in range(len(det_idx))]
        k_det = max_dets
        boxes = np.zeros((n_det, k_det, 4), np.float32)
        score = np.zeros((n_det, k_det), np.float32)
        cat = np.zeros((n_det, k_det), np.int64)
        nms_in = np.zeros((len(raw), k_det, 4), np.float32)
        nms_sc = np.full((len(raw), k_det), -np.inf, np.float32)
        pre = []
        for s, (b, c, ids) in enumerate(raw):
            keep = c >= self.box_threshold
            b, c, ids = b[keep], c[keep], ids[keep]
            order = np.argsort(-c)[:k_det]
            b, c, ids = b[order], c[order], ids[order]
            pre.append((b, c, ids))
            nms_in[s, : len(b)] = b
            nms_sc[s, : len(b)] = c
        if raw:
            keep_all = np.asarray(
                _nms_frames(
                    jnp.asarray(nms_in), jnp.asarray(nms_sc),
                    self.nms_threshold,
                )
            )
        det_valid = np.zeros((n_det, k_det), bool)
        for s, (b, c, ids) in enumerate(pre):
            kept = np.nonzero(keep_all[s, : len(b)])[0]
            n = len(kept)
            boxes[s, :n] = b[kept]
            score[s, :n] = c[kept]
            cat[s, :n] = ids[kept]
            det_valid[s, :n] = True
        # NMS-survivor counts per segment (a prefix of the slots) —
        # the crop filter below may invalidate mid-prefix slots, but
        # mask decode keeps slot correspondence over the full prefix
        n_nms = det_valid.sum(axis=1)

        # -- CLIP zero-shot crop filter, batched over ALL detection
        # frames as device matmul crops (host path: detect_and_segment
        # filters after NMS per frame; filter decisions depend only on
        # boxes, so running it before SAM skips mask decodes for
        # rejected detections — same results, less device work)
        if self.crop_filter is not None and det_valid.any():
            keep = self.crop_filter.filter_frames_device(
                dev_det, boxes, det_valid, cat, list(classes),
            )
            det_valid &= np.asarray(keep, bool)

        # -- SAM masks for all detection frames, device-resident
        seg = self.segmenter
        if hasattr(seg, "decode_masks_batch_device"):
            det_masks = seg.decode_masks_batch_device(
                dev_det, boxes, out_hw=(h + ph, w + pw),
            )
        else:  # stub segmenters (tests): host masks, one upload
            det_host = np.asarray(dev_det)
            m = np.zeros((n_det, k_det, h + ph, w + pw), np.uint8)
            for s in range(n_det):
                nv = int(n_nms[s])
                if nv:
                    m[s, :nv, :h, :w] = (
                        seg(det_host[s], boxes[s, :nv]) > 0.5
                    )
            det_masks = jnp.asarray(m)

        seg_is_det = None
        if semi:
            # vote on device over every frame's SAM-mask boxes, then
            # keep only the keyframe rows (frames s*E) for the program.
            # The trailing PARTIAL window never votes: the host loop
            # flushes it by pure propagation, so its keyframe
            # detections are disabled AND seg_is_det marks the segment
            # so the program applies gap-frame write rules there.
            if n_det < t_pad:
                det_masks = jnp.concatenate(
                    [det_masks,
                     jnp.zeros((t_pad - n_det,) + det_masks.shape[1:],
                               det_masks.dtype)]
                )
            dv_pad = np.zeros((t_pad, k_det), bool)
            dv_pad[:n_det] = det_valid
            keep_key = np.array(
                fused_clip.vote_detections(
                    det_masks, jnp.asarray(dv_pad), E
                )
            )
            keep_key[t0 // E:] = False
            det_masks = det_masks.reshape(
                (n_seg, E) + det_masks.shape[1:]
            )[:, 0]
            key_rows = [s * E for s in range(n_seg)]
            det_valid = keep_key
            cat = cat[key_rows]
            score = score[key_rows]
            # the trailing partial window's keyframe is a plain
            # propagate frame in the host loop (flush), not a
            # detection frame — the program applies gap-write rules
            seg_is_det = jnp.asarray(
                [(s + 1) * E <= t0 for s in range(n_seg)]
            )
        elif n_det < n_seg:  # defensive: padded tail segments
            det_masks = jnp.concatenate(
                [det_masks,
                 jnp.zeros((n_seg - n_det,) + det_masks.shape[1:],
                           det_masks.dtype)]
            )
            det_valid = np.concatenate(
                [det_valid, np.zeros((n_seg - n_det, k_det), bool)]
            )
            cat = np.concatenate(
                [cat, np.zeros((n_seg - n_det, k_det), np.int64)]
            )
            score = np.concatenate(
                [score, np.zeros((n_seg - n_det, k_det), np.float32)]
            )

        if is_stm:
            from video_llava_tpu.grounding import memory_tracker as mt

            cfg = prop.cfg
            fshape = jax.eval_shape(
                lambda f: mt.default_features(f, cfg),
                jax.ShapeDtypeStruct((h, w, 3), jnp.uint8),
            )
            state = mt.init_state(cfg, fshape.shape[0], fshape.shape[1])
            table = fused_clip.init_table(cfg)
            masks, cats, scores_out, counts, state = (
                fused_clip.run_clip_fused_stm(
                    state, dev_clip, det_masks,
                    jnp.asarray(det_valid),
                    jnp.asarray(cat.astype(np.int32)),
                    jnp.asarray(score), jnp.asarray(frame_valid),
                    table, cfg, detect_every=E,
                    iou_threshold=self.iou_match_threshold,
                    binary=binary, pack=binary,
                    seg_is_det=seg_is_det,
                )
            )
            prop.state = state
            prop._hw = (h, w)
            unpack_w = w + (-w % 8)
        else:
            cfg = prop.cfg
            state = xmem_mod.init_state(
                cfg, (h + ph) // 16, (w + pw) // 16
            )
            table = fused_clip.init_table(cfg)
            masks, cats, scores_out, counts, state = (
                fused_clip.run_clip_fused(
                    prop.params, state, dev_clip, det_masks,
                    jnp.asarray(det_valid),
                    jnp.asarray(cat.astype(np.int32)),
                    jnp.asarray(score), jnp.asarray(frame_valid),
                    table, cfg,
                    detect_every=E,
                    iou_threshold=self.iou_match_threshold,
                    # binary=False (tests/debug): soft f32 masks,
                    # unpacked — 32x more device->host traffic than
                    # the packed default
                    binary=binary, pack=binary,
                    seg_is_det=seg_is_det,
                )
            )
            prop.state = state
            prop._hw = (h, w)
            prop._frame_idx = t_pad
            unpack_w = w + pw
        packed = np.asarray(masks)  # (T, O, Hp, Wp/8) — ONE fetch
        cats = np.asarray(cats)
        scores_out = np.asarray(scores_out)
        counts = np.asarray(counts)

        results: List[FrameResult] = []
        obj_cache: Dict[int, List[ObjectInfo]] = {}
        for t in range(t0):
            s = t // E
            objs = obj_cache.get(s)
            if objs is None:
                objs = [
                    ObjectInfo(i + 1, int(cats[s, i]),
                               float(scores_out[s, i]))
                    for i in range(int(counts[s]))
                ]
                obj_cache[s] = objs
            full = (
                fused_clip.unpack_mask_bits(packed[t], unpack_w)
                if binary else packed[t]
            )
            results.append(FrameResult(t, full[:, :h, :w], list(objs)))
        self._objects = list(obj_cache.get(n_seg - 1, []))
        return results

    def run_on_video(
        self, video_path: str, classes: Sequence[str], num_frames: int = 100
    ) -> List[FrameResult]:
        from video_llava_tpu.media.loader import load_video_native_size

        frames = load_video_native_size(video_path, num_frm=num_frames)
        return self.run_on_list_of_images(list(frames), classes)

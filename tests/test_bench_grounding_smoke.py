"""Smoke test of bench_grounding's MEASURED pipeline harness.

Runs `measured_pipeline` (the real GroundedTracker wall-clock loop the
bench headline comes from) at toy scale with stub detector/segmenter
and a real (random) XMem propagator, so the measurement harness itself
is CI-covered — the on-chip bench only changes the component sizes.
"""

import importlib
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _StubDetector:
    """12 fixed boxes per frame (> PRE_NMS_BOXES so the bench's top-k
    truncation path is exercised)."""

    def detect_batch(self, images, prompts):
        h, w = np.asarray(images).shape[1:3]
        boxes = np.stack(
            [
                np.asarray(
                    [4 + 2 * i, 4 + i, 4 + 2 * i + w // 3, 4 + i + h // 3],
                    np.float32,
                )
                for i in range(12)
            ]
        )
        conf = np.linspace(0.9, 0.3, 12).astype(np.float32)
        cids = np.zeros(12, np.int64)
        return [(boxes, conf, cids) for _ in range(len(images))]

    def __call__(self, image, prompts):
        return self.detect_batch(np.asarray(image)[None], prompts)[0]


class _StubSegmenter:
    supports_frame_cache = False
    encode_batch_size = 1

    def __call__(self, image, boxes):
        h, w = image.shape[:2]
        m = np.zeros((len(boxes), h, w), np.float32)
        for i, b in enumerate(boxes):
            x0, y0, x1, y1 = (int(v) for v in b)
            m[i, max(y0, 0) : y1, max(x0, 0) : x1] = 1.0
        return m


@pytest.mark.slow
def test_measured_pipeline_smoke(monkeypatch):
    monkeypatch.setenv("GROUNDING_FRAMES", "6")
    monkeypatch.setenv("GROUNDING_H", "64")
    monkeypatch.setenv("GROUNDING_W", "96")
    monkeypatch.setenv("GROUNDING_RUNS", "1")
    monkeypatch.syspath_prepend(REPO_ROOT)
    sys.modules.pop("bench_grounding", None)
    bg = importlib.import_module("bench_grounding")
    assert bg.NUM_FRAMES == 6 and bg.H == 64 and bg.W == 96

    from video_llava_tpu.grounding.tagging import TaggingModule
    from video_llava_tpu.models import xmem
    from video_llava_tpu.models.swin import SwinConfig

    xcfg = xmem.XMemConfig(max_objects=bg.N_BOXES, mem_slots=3, top_k=8)
    xparams = xmem.init_params(jax.random.PRNGKey(0), xcfg)
    tagger = TaggingModule(
        {}, {}, SwinConfig(), ["person", "dog"], threshold=0.5,
        logits_fn=lambda bp, hp, px: jnp.zeros((px.shape[0], 2)),
    )

    out = bg.measured_pipeline(
        _StubDetector(), _StubSegmenter(), xparams, xcfg, tagger
    )
    assert out["measured_s"] > 0  # fused whole-clip path
    assert out["hostloop_s"] > 0
    assert out["first_run_s"] > 0
    assert len(out["fused_runs"]) == len(out["hostloop_runs"]) == 1
    assert out["full_pipeline_s"] >= out["measured_s"]
    assert out["tagging_s"] > 0 and out["entity_match_stub_s"] >= 0

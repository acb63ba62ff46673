"""Grounding utilities: entity-match parsing, tagging, scene detection."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.grounding.entity_matching import parse_match_response
from video_llava_tpu.grounding.tagging import (
    TaggingModule,
    get_unique_tags,
    init_tag_head,
)
from video_llava_tpu.media.scene import content_values, detect_scenes
from video_llava_tpu.models import swin
from video_llava_tpu.models.swin import SwinConfig


def test_parse_match_response():
    text = "A brown dog running in the grassy field"
    answer = "brown dog - dog\ngrassy field - field\nunicorn - unicorn"
    highlight, state = parse_match_response(
        answer, text, ["dog", "field", "grass"]
    )
    assert state == {"brown dog": "dog", "grassy field": "field"}
    tagged = [h for h in highlight if h[1] is not None]
    assert [h[0] for h in tagged] == ["brown dog", "grassy field"]
    # untagged spans reconstruct the full text
    assert "".join(h[0] for h in highlight) == text


def test_get_unique_tags_frequency_sorted_and_per_call():
    tags = [["dog", "cat"], ["dog"], ["dog", "bird"]]
    assert get_unique_tags(tags)[0] == "dog"
    # per-call counts: a second call is independent (reference bug fixed)
    assert get_unique_tags([["x"]]) == ["x"]


def test_tagging_module_batched():
    cfg = SwinConfig.tiny_test()
    bp = swin.init_params(jax.random.PRNGKey(0), cfg)
    hp = init_tag_head(jax.random.PRNGKey(1), cfg.num_features, 8)
    tm = TaggingModule(bp, hp, cfg, [f"tag{i}" for i in range(8)],
                       threshold=0.4)
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(3, 64, 64, 3)).astype(np.float32)
    per_frame = tm.run_on_frames(frames)
    assert len(per_frame) == 3
    top = tm.run_on_video(frames, top_k=5)
    assert len(top) <= 5


def test_scene_detection_finds_hard_cut():
    rng = np.random.default_rng(0)
    a = np.full((10, 32, 32, 3), 30, np.uint8)
    b = np.full((10, 32, 32, 3), 220, np.uint8)
    frames = np.concatenate([a, b])
    scenes = detect_scenes(frames, threshold=27.0)
    assert scenes == [(0, 10), (10, 20)]


def test_scene_detection_stable_video():
    frames = np.full((12, 16, 16, 3), 128, np.uint8)
    assert detect_scenes(frames) == [(0, 12)]
    assert content_values(frames).max() < 1.0

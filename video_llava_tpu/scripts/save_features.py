"""Batch CLIP spatio-temporal feature pre-extraction.

Parity: reference scripts/save_spatio_temporal_clip_features.py:74-139
— for every video in a directory: uniform-sample 100 frames, CLIP
ViT-L/14 penultimate features, spatio-temporal pooling, one pickle per
video; resume by output existence; per-video fault tolerance.

TPU design: the whole 100-frame clip encodes as one jitted program (the
reference chunks through the GPU in batches of 32); IO runs through the
native decoder.

Run: python -m video_llava_tpu.scripts.save_features \
    --video_dir_path vids/ --clip_feat_path feats/ [--clip_path ckpt]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.config import CLIPVisionConfig
from video_llava_tpu.media.loader import load_video
from video_llava_tpu.models import clip as clip_mod
from video_llava_tpu.ops.image import normalize_clip
from video_llava_tpu.ops.pooling import spatio_temporal_pool


def build_extractor(clip_path=None, image_size: int = 224, dtype=jnp.float32):
    cfg = CLIPVisionConfig(image_size=image_size)
    if clip_path and os.path.isdir(clip_path):
        from video_llava_tpu.engine.weights import (
            convert_clip_vision,
            load_checkpoint_dir,
        )

        params = convert_clip_vision(load_checkpoint_dir(clip_path), cfg, dtype)
    else:
        params = jax.jit(
            lambda k: clip_mod.init_vision_params(k, cfg, dtype)
        )(jax.random.PRNGKey(0))

    @jax.jit
    def extract(params, frames_uint8, n_valid):
        pixels = normalize_clip(frames_uint8, dtype=dtype)
        feats = clip_mod.vision_penultimate_patches(params, pixels, cfg)
        return spatio_temporal_pool(
            feats, num_valid_frames=n_valid, out_dtype=jnp.float32
        )

    return cfg, params, extract


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir_path", required=True)
    p.add_argument("--clip_feat_path", required=True)
    p.add_argument("--clip_path", default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_frames", type=int, default=100)
    args = p.parse_args(argv)

    cfg, params, extract = build_extractor(args.clip_path, args.image_size)
    os.makedirs(args.clip_feat_path, exist_ok=True)

    all_videos = sorted(os.listdir(args.video_dir_path))
    done = 0
    for video_name in all_videos:
        video_id = video_name.rsplit(".", 1)[0]
        out_path = os.path.join(args.clip_feat_path, f"{video_id}.pkl")
        if os.path.exists(out_path):  # resume-by-existence
            continue
        try:
            frames = load_video(
                os.path.join(args.video_dir_path, video_name),
                num_frm=args.num_frames,
                shape=(args.image_size, args.image_size),
            )
            t = frames.shape[0]
            # pad frames to the static 100 (masked in pooling)
            if t < args.num_frames:
                frames = np.pad(
                    frames, ((0, args.num_frames - t), (0, 0), (0, 0), (0, 0))
                )
            feats = extract(params, jnp.asarray(frames), jnp.int32(t))
            with open(out_path, "wb") as f:
                pickle.dump(np.asarray(feats), f)
            done += 1
            if done % 50 == 0:
                print(f"{done} videos processed")
        except Exception as e:  # noqa: BLE001 — reference behavior
            print(f"Can't process {video_name}: {e}")
    print(f"finished: {done} new feature files")


if __name__ == "__main__":
    main()

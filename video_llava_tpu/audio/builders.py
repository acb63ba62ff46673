"""Transcriber / aligner factories."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

from video_llava_tpu.audio.transcribe import Transcriber
from video_llava_tpu.models import whisper as whisper_mod
from video_llava_tpu.models.whisper import WhisperConfig


def build_default_transcriber(
    checkpoint_dir: Optional[str] = None,
    size: str = "base",
    align_checkpoint_dir: Optional[str] = None,
    at_checkpoint: Optional[str] = None,
    at_cfg=None,
) -> Transcriber:
    """Whisper transcriber from an HF checkpoint dir when available,
    random-init otherwise (air-gapped tests).

    at_checkpoint: optional whisper-at TL-TR head .pth (released
    separately from the ASR weights) — attaches the trained tagging
    head and switches the segment filter to the AudioSet speech/music
    ids (reference transcribe.py:79-95). Without it the filter keeps
    every segment.

    When the checkpoint dir ships tokenizer assets (vocab.json +
    merges.txt) we use our standalone byte-level BPE
    (audio/tokenizer.py) — no transformers dependency at runtime — and
    enable timestamp decoding; otherwise fall back to HF AutoTokenizer
    when importable. align_checkpoint_dir optionally attaches a
    wav2vec2 CTC forced aligner for word-level timings.
    """
    cfg = {
        "base": WhisperConfig.base,
        "large-v2": WhisperConfig.large_v2,
        "tiny-test": WhisperConfig.tiny_test,
    }[size]()
    kw = {}
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        from video_llava_tpu.engine.weights import load_checkpoint_dir

        sd = load_checkpoint_dir(checkpoint_dir)
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
        params = whisper_mod.convert_hf_whisper(sd, cfg)
        if os.path.exists(os.path.join(checkpoint_dir, "vocab.json")):
            from video_llava_tpu.audio.tokenizer import WhisperTokenizer

            tok = WhisperTokenizer(checkpoint_dir)
            decode_text = tok.decode
            start = tok.sot_sequence(timestamps=False)
            eot = tok.eot
            kw.update(
                timestamp_begin=tok.timestamp_begin,
                timestamp_start_tokens=tok.sot_sequence(timestamps=True),
            )
        else:
            decode_text = _hf_whisper_decoder(checkpoint_dir)
            # Whisper start: <|sot|><|en|><|transcribe|><|notimestamps|>
            start = (50258, 50259, 50359, 50363)
            eot = 50257
    else:
        params = whisper_mod.init_params(jax.random.PRNGKey(0), cfg)
        decode_text = lambda ids: ""
        start, eot = (1,), 2
    if at_checkpoint and os.path.exists(at_checkpoint):
        import torch

        from video_llava_tpu.audio.transcribe import (
            AUDIOSET_MUSIC_TAGS,
            AUDIOSET_SPEECH_TAGS,
        )

        at_sd = torch.load(at_checkpoint, map_location="cpu",
                           weights_only=True)
        if isinstance(at_sd, dict) and "state_dict" in at_sd:
            at_sd = at_sd["state_dict"]
        atc = at_cfg or whisper_mod.WhisperATConfig(rep_dim=cfg.d_model)
        params = dict(params)
        params["at_head"] = whisper_mod.convert_whisper_at(at_sd, atc)
        kw.update(
            at_cfg=atc,
            speech_tag=AUDIOSET_SPEECH_TAGS,
            music_tags=AUDIOSET_MUSIC_TAGS,
        )
    if align_checkpoint_dir:
        kw["aligner"] = build_default_aligner(align_checkpoint_dir)
    return Transcriber(params, cfg, decode_text, start_tokens=start,
                       eot_token=eot, **kw)


def build_default_aligner(checkpoint_dir: Optional[str] = None):
    """wav2vec2 CTC forced aligner (whisperX align-model equivalent).
    Random-init with a minimal char vocab when no checkpoint is given."""
    from video_llava_tpu.audio.align import ForcedAligner
    from video_llava_tpu.models import wav2vec2 as w2v

    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        from video_llava_tpu.engine.weights import load_checkpoint_dir

        with open(os.path.join(checkpoint_dir, "vocab.json"),
                  encoding="utf-8") as f:
            vocab = json.load(f)
        import dataclasses

        cfg = dataclasses.replace(
            w2v.Wav2Vec2Config.base(),
            vocab_size=len(vocab), blank_id=vocab.get("<pad>", 0),
        )
        sd = load_checkpoint_dir(checkpoint_dir)
        params = w2v.convert_hf_wav2vec2(sd, cfg)
    else:
        cfg = w2v.Wav2Vec2Config.tiny_test()
        params = w2v.init_params(jax.random.PRNGKey(0), cfg)
        vocab = {"<pad>": 0, "|": 4, **{chr(ord("A") + i): 5 + i
                                        for i in range(cfg.vocab_size - 5)}}
    return ForcedAligner(params, cfg, vocab,
                         unk_id=vocab.get("<unk>"))


def _hf_whisper_decoder(path: str):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path)
    return lambda ids: tok.decode(ids, skip_special_tokens=True)

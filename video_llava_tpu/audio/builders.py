"""Transcriber factory."""

from __future__ import annotations

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
) -> Transcriber:
    """Whisper transcriber from an HF checkpoint dir when available,
    random-init otherwise (air-gapped tests)."""
    cfg = {
        "base": WhisperConfig.base,
        "large-v2": WhisperConfig.large_v2,
        "tiny-test": WhisperConfig.tiny_test,
    }[size]()
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        from video_llava_tpu.engine.weights import load_checkpoint_dir

        sd = load_checkpoint_dir(checkpoint_dir)
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
        params = whisper_mod.convert_hf_whisper(sd, cfg)
        decode_text = _hf_whisper_decoder(checkpoint_dir)
        # Whisper start sequence: <|sot|><|en|><|transcribe|><|notimestamps|>
        start = (50258, 50259, 50359, 50363)
        eot = 50257
    else:
        params = whisper_mod.init_params(jax.random.PRNGKey(0), cfg)
        decode_text = lambda ids: ""
        start, eot = (1,), 2
    return Transcriber(params, cfg, decode_text, start_tokens=start,
                       eot_token=eot)


def _hf_whisper_decoder(path: str):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path)
    return lambda ids: tok.decode(ids, skip_special_tokens=True)

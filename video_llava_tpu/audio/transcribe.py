"""Video -> filtered speech transcript.

Parity: reference Transcriber (video_chatgpt/audio_transcript/
transcribe.py:22-99):
  1. ASR over the audio track (whisperX there; our JAX Whisper here),
     producing timestamped segments;
  2. per-segment audio tagging (whisper-at there; the shared-encoder
     AT head here);
  3. keep only segments whose top tag is Speech, and drop segments
     where a Music tag outscores Speech by a margin (the reference
     keeps a segment when speech_prob - music_prob > 1.1 in logit
     space, transcribe.py:79-95);
  4. concatenate the surviving text.

The heavy stages are batched device programs: all 30 s chunks encode as
one batch; segment tagging reuses the cached encoder states instead of
re-running Whisper per segment as the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models import whisper as whisper_mod
from video_llava_tpu.models.whisper import WhisperConfig
from video_llava_tpu.ops.audio import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
)

# Default AudioSet-style tag ids for the filter (configurable: real
# deployments pass the ontology used by their AT head weights).
SPEECH_TAG = 0
MUSIC_TAGS = (1,)


@dataclasses.dataclass
class Segment:
    start: float
    end: float
    text: str
    speech_logit: float = 0.0
    music_logit: float = -1e9

    @property
    def keep(self) -> bool:
        """Reference filter: Speech must beat Music by > 1.1 logits
        (transcribe.py:88-95)."""
        return self.speech_logit - self.music_logit > 1.1 or (
            self.music_logit <= -1e8
        )


class Transcriber:
    """JAX Whisper transcriber with audio-tag filtering.

    decode_text: token ids -> str (the Whisper BPE tokenizer when its
    assets are available; injectable for tests/air-gapped runs).
    """

    def __init__(
        self,
        params,
        cfg: WhisperConfig,
        decode_text: Callable[[Sequence[int]], str],
        start_tokens: Sequence[int] = (1,),
        eot_token: int = 2,
        max_new_tokens: int = 224,
        speech_tag: int = SPEECH_TAG,
        music_tags: Sequence[int] = MUSIC_TAGS,
    ):
        self.params = params
        self.cfg = cfg
        self.decode_text = decode_text
        self.start_tokens = tuple(start_tokens)
        self.eot_token = eot_token
        self.max_new_tokens = max_new_tokens
        self.speech_tag = speech_tag
        self.music_tags = tuple(music_tags)
        self._encode = jax.jit(
            lambda p, mel: whisper_mod.encode(p, mel, cfg)
        )

    def _chunk(self, audio: np.ndarray) -> np.ndarray:
        """Split PCM into padded 30 s chunks: (n_chunks, N_SAMPLES)."""
        n = max(len(audio), 1)
        n_chunks = -(-n // N_SAMPLES)
        out = np.zeros((n_chunks, N_SAMPLES), np.float32)
        for i in range(n_chunks):
            piece = audio[i * N_SAMPLES : (i + 1) * N_SAMPLES]
            out[i, : len(piece)] = piece
        return out

    def transcribe_audio(self, audio: np.ndarray) -> List[Segment]:
        """ASR + tagging over PCM float32 @16 kHz."""
        if len(audio) == 0:
            return []
        chunks = self._chunk(audio)
        mels = jnp.stack([log_mel_spectrogram(c) for c in chunks])
        enc = self._encode(self.params, mels)  # (n_chunks, src, d)

        start = jnp.asarray(
            [list(self.start_tokens)] * len(chunks), jnp.int32
        )
        toks, lens = whisper_mod.greedy_decode_cached(
            self.params, enc, self.cfg, start, self.max_new_tokens,
            self.eot_token,
        )
        tag_logits = np.asarray(whisper_mod.audio_tag_logits(self.params, enc))

        segments: List[Segment] = []
        toks_np, lens_np = np.asarray(toks), np.asarray(lens)
        for i in range(len(chunks)):
            ids = [int(t) for t in toks_np[i, : int(lens_np[i])]]
            text = self.decode_text(ids).strip()
            music = max(
                (float(tag_logits[i, m]) for m in self.music_tags),
                default=-1e9,
            )
            segments.append(
                Segment(
                    start=i * 30.0,
                    end=min((i + 1) * 30.0, len(audio) / SAMPLE_RATE),
                    text=text,
                    speech_logit=float(tag_logits[i, self.speech_tag]),
                    music_logit=music,
                )
            )
        return segments

    def transcribe_video(self, video_path: str) -> Tuple[str, List[Segment]]:
        """Reference transcribe_video (transcribe.py:51-99): decode the
        audio track, transcribe, filter non-speech, join text."""
        from video_llava_tpu.media.audio import load_audio

        audio = load_audio(video_path)
        segments = self.transcribe_audio(audio)
        text = " ".join(s.text for s in segments if s.keep and s.text)
        return text, segments


def filter_segments(segments: Sequence[Segment]) -> List[Segment]:
    """Expose the keep-rule for tests and external pipelines."""
    return [s for s in segments if s.keep]

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
# Real AudioSet ontology ids for whisper-at checkpoints (reference
# filter classes, transcribe.py:79-87: Speech / Male speech / Female
# speech, and Music).
AUDIOSET_SPEECH_TAGS = (0, 1, 2)
AUDIOSET_MUSIC_TAGS = (137,)


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
        timestamp_begin: Optional[int] = None,
        timestamp_start_tokens: Optional[Sequence[int]] = None,
        aligner=None,
        at_cfg=None,
        at_window_s: float = 10.0,
    ):
        self.params = params
        self.cfg = cfg
        self.decode_text = decode_text
        self.start_tokens = tuple(start_tokens)
        self.eot_token = eot_token
        self.max_new_tokens = max_new_tokens
        self.speech_tags = (
            (speech_tag,) if isinstance(speech_tag, int) else tuple(speech_tag)
        )
        self.speech_tag = self.speech_tags[0]
        self.music_tags = tuple(music_tags)
        # Tagging mode: 'tltr' (whisper-at TL-TR head, per-window logits
        # mapped to ASR segments), 'linear' (legacy probe, per-chunk),
        # or 'none' (no at_head, e.g. plain HF whisper weights: the
        # filter keeps everything rather than running untrained logits).
        head = params.get("at_head")
        self._at_mode = (
            "tltr" if head is not None and "time_tr" in head
            else "linear" if head is not None
            else "none"
        )
        self.at_cfg = at_cfg
        if self._at_mode == "tltr" and at_cfg is None:
            self.at_cfg = whisper_mod.WhisperATConfig(rep_dim=cfg.d_model)
        self.at_window_s = at_window_s
        # Timestamp decoding: id of <|0.00|> and the sot sequence
        # WITHOUT <|notimestamps|> (audio/tokenizer.py sot_sequence).
        self.timestamp_begin = timestamp_begin
        self.timestamp_start_tokens = (
            tuple(timestamp_start_tokens) if timestamp_start_tokens else None
        )
        self.aligner = aligner  # audio.align.ForcedAligner for word times
        # Cast the (always-f32) log-mel to the parameter dtype: bf16
        # checkpoints otherwise fail the conv dtype check.
        want_layers = self._at_mode == "tltr"
        self._encode = jax.jit(
            lambda p, mel: whisper_mod.encode(
                p,
                mel.astype(p["encoder"]["conv1"]["kernel"].dtype),
                cfg,
                return_layer_states=want_layers,
            )
        )
        # One program for the whole TL-TR head (the eager form costs a
        # host round trip per op over the tunneled TPU).
        self._at_tltr = jax.jit(
            whisper_mod.audio_tag_logits_tltr,
            static_argnames=("atcfg", "window_tokens"),
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

    def transcribe_audio(
        self, audio: np.ndarray, with_timestamps: bool = False
    ) -> List[Segment]:
        """ASR + tagging over PCM float32 @16 kHz.

        with_timestamps=True decodes with Whisper timestamp tokens and
        splits each 30 s chunk into sub-segments at the emitted
        timestamp pairs (requires timestamp_begin / the timestamp sot
        sequence); otherwise segments are whole chunks.
        """
        if len(audio) == 0:
            return []
        use_ts = bool(
            with_timestamps
            and self.timestamp_begin is not None
            and self.timestamp_start_tokens
        )
        chunks = self._chunk(audio)
        mels = jnp.stack([log_mel_spectrogram(c) for c in chunks])
        if self._at_mode == "tltr":
            enc, layer_states = self._encode(self.params, mels)
        else:
            enc = self._encode(self.params, mels)  # (n_chunks, src, d)
            layer_states = None

        start_seq = (
            self.timestamp_start_tokens if use_ts else self.start_tokens
        )
        start = jnp.asarray([list(start_seq)] * len(chunks), jnp.int32)
        toks, lens = whisper_mod.greedy_decode_cached(
            self.params, enc, self.cfg, start, self.max_new_tokens,
            self.eot_token,
        )
        if self._at_mode == "tltr":
            # (n_chunks, n_windows, n_class): per-window tags mapped to
            # each ASR segment below (reference tags each segment by
            # re-running whisper-at on sliced audio, transcribe.py:70-77;
            # we read windows of the cached layer states instead).
            atc = self.at_cfg
            win = max(
                1, int(round(self.at_window_s * 50 / atc.pool_stride))
            )
            tag_logits = np.asarray(
                self._at_tltr(
                    self.params["at_head"], layer_states, atc,
                    window_tokens=win,
                )
            )
        elif self._at_mode == "linear":
            tag_logits = np.asarray(
                whisper_mod.audio_tag_logits(self.params, enc)
            )
        else:
            tag_logits = None

        total_s = len(audio) / SAMPLE_RATE

        def seg_tags(i: int, t0: float, t1: float):
            """(speech, music) logits for chunk i over chunk-local time
            [t0, t1): max over the overlapped tag windows (tltr) or the
            chunk logits (linear); no head -> always-keep sentinel."""
            if tag_logits is None:
                return 0.0, -1e9
            if tag_logits.ndim == 2:
                row = tag_logits[i][None]
            else:
                nw = tag_logits.shape[1]
                w0 = min(int(t0 / self.at_window_s), nw - 1)
                w1 = max(w0 + 1, min(-(-t1 // self.at_window_s), nw))
                row = tag_logits[i, w0:int(w1)]
            speech = max(float(row[:, t].max()) for t in self.speech_tags)
            music = max(
                (float(row[:, m].max()) for m in self.music_tags),
                default=-1e9,
            )
            return speech, music

        segments: List[Segment] = []
        toks_np, lens_np = np.asarray(toks), np.asarray(lens)
        for i in range(len(chunks)):
            ids = [int(t) for t in toks_np[i, : int(lens_np[i])]]
            speech, music = seg_tags(i, 0.0, 30.0)
            if use_ts:
                from video_llava_tpu.audio.tokenizer import (
                    parse_timestamp_segments,
                )

                spans = parse_timestamp_segments(
                    ids, self.timestamp_begin, offset=i * 30.0,
                    eot=self.eot_token,
                    default_end=min(30.0, total_s - i * 30.0),
                )
                for sp in spans:
                    text = self.decode_text(sp.token_ids).strip()
                    if not text:
                        continue
                    sp_speech, sp_music = seg_tags(
                        i, sp.start - i * 30.0, sp.end - i * 30.0
                    )
                    segments.append(
                        Segment(
                            start=min(sp.start, total_s),
                            end=min(sp.end, total_s),
                            text=text,
                            speech_logit=sp_speech,
                            music_logit=sp_music,
                        )
                    )
                continue
            text = self.decode_text(ids).strip()
            segments.append(
                Segment(
                    start=i * 30.0,
                    end=min((i + 1) * 30.0, total_s),
                    text=text,
                    speech_logit=speech,
                    music_logit=music,
                )
            )
        return segments

    def transcribe_video(
        self, video_path: str, with_timestamps: bool = False
    ) -> Tuple[str, List[Segment]]:
        """Reference transcribe_video (transcribe.py:51-99): decode the
        audio track, transcribe, filter non-speech, join text."""
        from video_llava_tpu.media.audio import load_audio

        audio = load_audio(video_path)
        segments = self.transcribe_audio(audio, with_timestamps)
        text = " ".join(s.text for s in segments if s.keep and s.text)
        return text, segments

    def transcribe_video_aligned(self, video_path: str):
        """Transcript + word-level timings (whisperX parity: reference
        transcribe.py:43-46 aligns segments with a wav2vec2 CTC model).
        Requires an aligner (audio/align.py ForcedAligner)."""
        if self.aligner is None:
            raise ValueError("Transcriber built without an aligner")
        from video_llava_tpu.media.audio import load_audio

        audio = load_audio(video_path)
        segments = self.transcribe_audio(audio, with_timestamps=True)
        kept = [s for s in segments if s.keep and s.text]
        words = self.aligner.align_segments(audio, kept)
        text = " ".join(s.text for s in kept)
        return text, kept, words


def filter_segments(segments: Sequence[Segment]) -> List[Segment]:
    """Expose the keep-rule for tests and external pipelines."""
    return [s for s in segments if s.keep]

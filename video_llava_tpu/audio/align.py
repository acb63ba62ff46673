"""Word-level forced alignment (whisperX-equivalent, TPU-native).

The reference pipeline refines Whisper segment timestamps to word level
with whisperX's wav2vec2 CTC forced aligner (reference
video_chatgpt/audio_transcript/transcribe.py:43-46, English only).
Here the CTC emissions come from our JAX wav2vec2 model
(models/wav2vec2.py) and the alignment trellis is a jittable
`lax.scan` over frames — static shapes, fp32 accumulation, runs on
TPU; only the O(T) backtrack happens on host.

CTC forced-alignment recap: the target char sequence c_1..c_N is
interleaved with blanks into s_0..s_{2N}; the Viterbi path through the
(frames x 2N+1) trellis under CTC transition rules (stay, advance one,
skip a blank between distinct chars) gives per-char frame spans, which
merge into word timings on the vocabulary's word delimiter.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass
class WordTiming:
    word: str
    start: float
    end: float
    score: float  # mean per-frame log-prob along the aligned span


@jax.jit
def ctc_trellis(emissions: jax.Array, ext_targets: jax.Array) -> tuple:
    """Viterbi trellis for CTC forced alignment.

    emissions: (T, V) log-probs; ext_targets: (S,) int32 target ids
    already interleaved with blanks (S = 2N+1). Returns (scores (T, S)
    final-step alphas, backpointers (T, S) int8 in {0: stay, 1: from
    s-1, 2: from s-2}).
    """
    S = ext_targets.shape[0]
    # skip from s-2 allowed only into non-blank s with ext[s] != ext[s-2]
    ext_prev2 = jnp.concatenate([jnp.full((2,), -1, jnp.int32),
                                 ext_targets[:-2]])
    can_skip = (jnp.arange(S) >= 2) & (ext_targets != ext_prev2)
    # position 1 exists when S > 1
    init = jnp.full((S,), NEG_INF, jnp.float32)
    init = init.at[0].set(0.0)
    init = jnp.where(jnp.arange(S) == 1, 0.0, init)

    def step(alpha, em_t):
        em = em_t[ext_targets]  # (S,)
        stay = alpha
        adv = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.where(
            can_skip,
            jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]]),
            NEG_INF,
        )
        stacked = jnp.stack([stay, adv, skip])  # (3, S)
        bp = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new_alpha = jnp.max(stacked, axis=0) + em
        return new_alpha, (new_alpha, bp)

    # First frame consumes ext position 0 or 1 directly.
    em0 = emissions[0][ext_targets] + init
    _, (alphas, bps) = jax.lax.scan(step, em0, emissions[1:])
    alphas = jnp.concatenate([em0[None], alphas])
    bps = jnp.concatenate(
        [jnp.zeros((1,) + bps.shape[1:], jnp.int8), bps]
    )
    return alphas, bps


def _backtrack(alphas: np.ndarray, bps: np.ndarray, num_ext: int):
    """Host-side Viterbi backtrack -> per-frame ext-position path."""
    T = alphas.shape[0]
    end = num_ext - 1
    if num_ext > 1 and alphas[T - 1, num_ext - 2] > alphas[T - 1, end]:
        end = num_ext - 2  # path may end on the final char, not the blank
    path = np.empty(T, np.int64)
    s = end
    for t in range(T - 1, -1, -1):
        path[t] = s
        s -= int(bps[t, s])
    return path


def align_tokens(
    emissions: np.ndarray,
    targets: Sequence[int],
    blank_id: int = 0,
) -> List[tuple]:
    """Force-align target ids to (T, V) log-prob emissions.

    Returns [(token_id, start_frame, end_frame_exclusive, score), ...].
    """
    targets = list(targets)
    if not targets or emissions.shape[0] < len(targets):
        return []
    ext = np.full(2 * len(targets) + 1, blank_id, np.int32)
    ext[1::2] = targets

    # Bucket shapes (time -> x128, ext -> x64) so repeated alignments
    # hit the jit cache instead of recompiling per segment. Padded
    # frames emit only blank (0 log-prob, NEG_INF elsewhere) and padded
    # ext positions are blanks, so the Viterbi path walks blank->blank
    # through the padding without disturbing real spans.
    T, V = emissions.shape
    t_pad = -T % 128
    s_pad = -len(ext) % 64
    em_in = np.asarray(emissions, np.float32)
    if t_pad:
        tail = np.full((t_pad, V), NEG_INF, np.float32)
        tail[:, blank_id] = 0.0
        em_in = np.concatenate([em_in, tail])
    ext_in = np.concatenate(
        [ext, np.full(s_pad, blank_id, np.int32)]
    ) if s_pad else ext

    alphas, bps = ctc_trellis(jnp.asarray(em_in), jnp.asarray(ext_in))
    alphas, bps = np.asarray(alphas), np.asarray(bps)
    # Backtrack from the REAL end positions: the padded ext columns are
    # reachable but never required, and forcing the path through them
    # would demand one extra frame per padded position.
    path = _backtrack(alphas, bps, len(ext))

    spans: List[tuple] = []
    em = np.asarray(emissions)
    for s in range(1, len(ext), 2):  # non-blank positions
        frames = np.nonzero(path == s)[0]
        if len(frames) == 0:
            continue
        f0, f1 = int(frames[0]), int(frames[-1]) + 1
        score = float(em[f0:f1, ext[s]].mean())
        spans.append((int(ext[s]), f0, f1, score))
    return spans


class ForcedAligner:
    """Char-CTC forced aligner over a wav2vec2-style acoustic model.

    vocab: char -> id mapping of the CTC head (HF vocab.json of the
    alignment checkpoint); `word_delimiter` is "|" in HF char vocabs.
    """

    def __init__(
        self,
        params,
        cfg,
        vocab: Dict[str, int],
        word_delimiter: str = "|",
        unk_id: Optional[int] = None,
    ):
        from video_llava_tpu.models import wav2vec2 as w2v

        self.params = params
        self.cfg = cfg
        self.vocab = vocab
        self.word_delimiter = word_delimiter
        self.unk_id = unk_id
        self._forward = jax.jit(lambda p, a: w2v.forward(p, a, cfg))

    def _text_to_ids(self, text: str) -> List[tuple]:
        """Clean text -> [(char_id, word_index)] with delimiter chars
        between words; chars missing from the vocab are dropped."""
        words = [w for w in text.upper().split() if w]
        out: List[tuple] = []
        delim = self.vocab.get(self.word_delimiter)
        for wi, w in enumerate(words):
            if wi > 0 and delim is not None:
                out.append((delim, -1))
            for ch in w:
                if ch in self.vocab:
                    out.append((self.vocab[ch], wi))
                elif self.unk_id is not None:
                    out.append((self.unk_id, wi))
        return out

    def align(
        self,
        audio: np.ndarray,
        text: str,
        time_offset: float = 0.0,
    ) -> List[WordTiming]:
        """PCM float32 @16 kHz + transcript -> word timings.

        time_offset shifts output times (segment start within the full
        track). Words whose chars all fell out of the vocabulary are
        skipped, matching whisperX's behavior for unalignable tokens.
        """
        pairs = self._text_to_ids(text)
        if not pairs or len(audio) < self.cfg.frame_stride * 2:
            return []
        # Bucket the audio length (1 s steps, zero-padded) so the
        # acoustic model compiles a handful of fixed shapes instead of
        # one per segment; emissions from the padded tail are dropped.
        n_real = len(audio)
        bucket = -n_real % 16000
        if bucket:
            audio = np.concatenate(
                [audio, np.zeros(bucket, audio.dtype)]
            )
        emissions = np.asarray(self._forward(self.params, jnp.asarray(audio)))
        emissions = emissions[: self.cfg.num_frames(n_real)]
        ids = [p[0] for p in pairs]
        spans = align_tokens(emissions, ids, blank_id=self.cfg.blank_id)
        if not spans:
            return []

        sec_per_frame = self.cfg.frame_stride / self.cfg.sample_rate
        # spans align 1:1 with `pairs` positions that survived; CTC
        # forced alignment visits every ext position unless the path
        # degenerates, so index by order.
        words = [w for w in text.upper().split() if w]
        agg: Dict[int, List[tuple]] = {}
        for (tok, f0, f1, score), (_, wi) in zip(spans, pairs):
            if wi >= 0:
                agg.setdefault(wi, []).append((f0, f1, score))
        out: List[WordTiming] = []
        for wi, frames in sorted(agg.items()):
            f0 = min(f[0] for f in frames)
            f1 = max(f[1] for f in frames)
            score = float(np.mean([f[2] for f in frames]))
            out.append(
                WordTiming(
                    word=words[wi],
                    start=time_offset + f0 * sec_per_frame,
                    end=time_offset + f1 * sec_per_frame,
                    score=score,
                )
            )
        return out

    def align_segments(
        self, audio: np.ndarray, segments, pad: float = 0.25
    ) -> List[WordTiming]:
        """Refine Whisper segments to word level (whisperX flow): align
        each segment's text against its (slightly padded) audio slice."""
        sr = self.cfg.sample_rate
        out: List[WordTiming] = []
        for seg in segments:
            if not seg.text:
                continue
            a = int(max(seg.start - pad, 0) * sr)
            b = int(min(seg.end + pad, len(audio) / sr) * sr)
            out.extend(
                self.align(audio[a:b], seg.text, time_offset=a / sr)
            )
        return out

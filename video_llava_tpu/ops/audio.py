"""Audio feature extraction: Whisper-style log-mel spectrogram, on
device.

Replaces whisperX's host-side feature extraction (reference
video_chatgpt/audio_transcript/transcribe.py:43-44) with a jnp pipeline
(frame -> hann -> rFFT -> mel filterbank matmul -> log compression)
that fuses into the Whisper encoder program.

Constants follow OpenAI Whisper: 16 kHz, n_fft=400, hop=160, 80 mels,
30 s windows -> 3000 frames.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30  # seconds
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def hz_to_mel(f):
    """Slaney mel scale (librosa default, used by Whisper's filters)."""
    f = np.asarray(f, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel
    )


def mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


@functools.lru_cache()
def mel_filterbank(
    n_mels: int = N_MELS, n_fft: int = N_FFT, sr: int = SAMPLE_RATE
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) slaney-normalized triangular filters
    (librosa.filters.mel equivalent)."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(
    audio: jax.Array, n_mels: int = N_MELS, pad_to_chunk: bool = True
) -> jax.Array:
    """PCM float32 (n_samples,) @16 kHz -> (n_mels, n_frames) log-mel,
    Whisper normalization."""
    x = jnp.asarray(audio, jnp.float32)
    if pad_to_chunk:
        n = x.shape[0]
        if n < N_SAMPLES:
            x = jnp.pad(x, (0, N_SAMPLES - n))
        else:
            x = x[:N_SAMPLES]
    # Whisper uses reflect-padded centered STFT.
    x = jnp.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = (x.shape[0] - N_FFT) // HOP_LENGTH + 1
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    frames = x[idx]  # (frames, n_fft)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    stft = jnp.fft.rfft(frames * window, axis=-1)
    # Whisper drops the last frame of the STFT.
    mag2 = jnp.abs(stft[:-1]) ** 2  # (frames-1, n_fft//2+1)
    mel = jnp.asarray(mel_filterbank(n_mels)) @ mag2.T  # (n_mels, frames)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0

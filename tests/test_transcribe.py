"""Transcription pipeline: chunking, segment filter rule, end-to-end on
synthetic audio with a tiny random Whisper."""

import numpy as np
import jax
import pytest

from video_llava_tpu.audio.transcribe import Segment, Transcriber, filter_segments
from video_llava_tpu.models import whisper
from video_llava_tpu.models.whisper import WhisperConfig
from video_llava_tpu.ops.audio import N_SAMPLES


def test_segment_filter_rule():
    keep = Segment(0, 1, "hi", speech_logit=2.0, music_logit=0.5)
    drop = Segment(0, 1, "la", speech_logit=1.0, music_logit=0.5)
    no_music = Segment(0, 1, "x", speech_logit=-3.0)
    assert keep.keep
    assert not drop.keep  # speech - music = 0.5 <= 1.1
    assert no_music.keep
    assert [s.text for s in filter_segments([keep, drop, no_music])] == ["hi", "x"]


@pytest.fixture(scope="module")
def tiny_transcriber():
    cfg = WhisperConfig.tiny_test()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return Transcriber(
        params,
        cfg,
        decode_text=lambda ids: " ".join(str(i) for i in ids),
        start_tokens=(1,),
        eot_token=2,
        max_new_tokens=4,
    )


def test_chunking(tiny_transcriber):
    audio = np.zeros((N_SAMPLES + 1600,), np.float32)
    chunks = tiny_transcriber._chunk(audio)
    assert chunks.shape == (2, N_SAMPLES)


def test_transcribe_audio_end_to_end(tiny_transcriber):
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(16000 * 2,)) * 0.05).astype(np.float32)
    segments = tiny_transcriber.transcribe_audio(audio)
    assert len(segments) == 1
    assert segments[0].end == pytest.approx(2.0)
    assert isinstance(segments[0].text, str)


def test_empty_audio(tiny_transcriber):
    assert tiny_transcriber.transcribe_audio(np.zeros((0,), np.float32)) == []


def test_transcribe_video_from_wav(tiny_transcriber, tmp_path):
    """transcribe_video end to end over a real (WAV) media file."""
    import wave

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(tone.tobytes())
    text, segments = tiny_transcriber.transcribe_video(path)
    assert len(segments) == 1
    assert isinstance(text, str)


def test_transcribe_with_timestamps_segmentation():
    """Timestamp mode splits chunk token streams into timed segments.
    The tiny random Whisper emits arbitrary ids; we inject a decode
    stub and treat a band of ids as timestamp tokens so the parsing
    path (not the model) is under test."""
    cfg = WhisperConfig.tiny_test()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    tb = cfg.vocab_size  # band above the vocab: never emitted -> fall
    # back to the implicit single span per chunk
    tr = Transcriber(
        params, cfg,
        decode_text=lambda ids: "w" + str(len(ids)),
        start_tokens=(1,), eot_token=2, max_new_tokens=4,
        timestamp_begin=tb, timestamp_start_tokens=(1,),
    )
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(16000,)) * 0.05).astype(np.float32)
    segs = tr.transcribe_audio(audio, with_timestamps=True)
    # every produced segment sits inside the audio duration
    for s in segs:
        assert 0.0 <= s.start <= s.end <= 1.0 + 1e-6

    # timestamps disabled when the transcriber lacks the token map
    tr2 = Transcriber(
        params, cfg, decode_text=lambda ids: "x",
        start_tokens=(1,), eot_token=2, max_new_tokens=4,
    )
    segs2 = tr2.transcribe_audio(audio, with_timestamps=True)
    assert len(segs2) == 1  # falls back to whole-chunk segments


def test_transcriber_bf16_params():
    """bf16 Whisper checkpoints must work: the f32 log-mel is cast to
    the parameter dtype before the conv stem."""
    import jax.numpy as jnp

    cfg = WhisperConfig.tiny_test()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    tr = Transcriber(
        params, cfg,
        decode_text=lambda ids: " ".join(str(i) for i in ids),
        start_tokens=(1,), eot_token=2, max_new_tokens=4,
    )
    audio = np.random.default_rng(0).normal(size=(16000,)).astype(np.float32)
    segs = tr.transcribe_audio(audio * 0.05)
    assert isinstance(segs, list) and len(segs) == 1

"""Native media layer: encode -> decode round trip, frame sampling,
and reader metadata (self-contained — no video assets needed)."""

import numpy as np
import pytest

from video_llava_tpu.media.loader import (
    VideoReader,
    encode_video,
    load_video,
)


def _synthetic_frames(n=48, h=72, w=96):
    """Smooth gradient frames with a frame-index band (survives lossy
    encoding well enough to verify ordering)."""
    t = np.arange(n, dtype=np.float32)[:, None, None]
    y = np.linspace(0, 255, h, dtype=np.float32)[None, :, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, None, :]
    r = np.broadcast_to((t * 5) % 256, (n, h, w))
    g = np.broadcast_to(y, (n, h, w))
    b = np.broadcast_to(x, (n, h, w))
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    frames = _synthetic_frames()
    encode_video(path, frames, fps=12.0, codec="mpeg4")
    return path, frames


def test_reader_metadata(video_file):
    path, frames = video_file
    vr = VideoReader(path)
    assert len(vr) == frames.shape[0]
    assert (vr.height, vr.width) == frames.shape[1:3]
    assert abs(vr.fps - 12.0) < 0.5
    vr.close()


def test_decode_indices_match_content(video_file):
    path, frames = video_file
    vr = VideoReader(path)
    idx = [0, 7, 23, 47]
    got = vr.get_batch(idx)
    vr.close()
    assert got.shape == (4, 72, 96, 3)
    # Red channel encodes (frame_index*5)%256; lossy codec -> tolerance.
    for row, i in enumerate(idx):
        want_r = float((i * 5) % 256)
        got_r = float(got[row, :, :, 0].mean())
        assert abs(got_r - want_r) < 20, (i, want_r, got_r)


def test_load_video_uniform_sampling(video_file):
    path, _ = video_file
    out = load_video(path, num_frm=10, shape=(64, 64))
    assert out.shape == (10, 64, 64, 3)
    # Short video: all frames kept.
    out2 = load_video(path, num_frm=100)
    assert out2.shape[0] == 48


def test_encode_decode_roundtrip_resized(video_file):
    path, frames = video_file
    vr = VideoReader(path)
    got = vr.get_batch([5], out_size=(36, 48))
    vr.close()
    assert got.shape == (1, 36, 48, 3)


def test_unaligned_dimensions_roundtrip():
    """Regression: libswscale SIMD row spill corrupted the heap for
    widths not a multiple of 64/3 alignment (e.g. 120)."""
    rng = np.random.default_rng(7)
    for h, w in [(90, 120), (96, 120), (45, 67), (90, 127)]:
        path = f"/tmp/dim_{h}_{w}.mp4"
        frames = rng.integers(0, 255, size=(6, h, w, 3), dtype=np.uint8)
        encode_video(path, frames, fps=3, codec="mpeg4")
        vr = VideoReader(path)
        out = vr.get_batch([0, 3, 5])
        small = vr.get_batch([1], out_size=(33, 47))
        vr.close()
        assert out.shape == (3, h, w, 3)
        assert small.shape == (1, 33, 47, 3)


def test_audio_decode_wav(tmp_path):
    """Native audio decode: 440 Hz sine WAV @ 44.1 kHz stereo -> mono
    16 kHz PCM via libswresample."""
    import struct
    import wave

    from video_llava_tpu.media.audio import load_audio

    sr, dur = 44100, 2.0
    t = np.arange(int(sr * dur)) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    stereo = np.stack([tone, tone], axis=1).reshape(-1)
    path = str(tmp_path / "tone.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(stereo.tobytes())

    pcm = load_audio(path, sample_rate=16000)
    assert abs(len(pcm) - 32000) < 200  # ~2 s at 16 kHz
    # dominant frequency ~440 Hz
    spec = np.abs(np.fft.rfft(pcm[:16000]))
    freq = np.fft.rfftfreq(16000, 1 / 16000)
    assert abs(freq[np.argmax(spec)] - 440.0) < 5.0
    assert np.abs(pcm).max() <= 1.0


def test_gif_decode(tmp_path):
    """TGIF path: the native reader decodes GIFs (reference uses a PIL
    GIF loader, run_inference_qa_tgif.py:30-54)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "t.gif")
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=250)
    out = load_video(path, num_frm=8, shape=(56, 56))
    assert out.shape == (8, 56, 56, 3)

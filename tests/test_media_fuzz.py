"""Native decoder robustness fuzz: truncated, corrupted, and garbage
media files must produce clean Python errors (or empty results), never
crash the process.

All decode attempts run in ONE subprocess so a native-level fault
(segfault/abort — the class of bug previously seen as libswscale heap
corruption) fails the test with the offending variant named, instead of
killing the pytest process.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from video_llava_tpu.media.loader import encode_video

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %(repo)r)
    import numpy as np
    from video_llava_tpu.media.loader import VideoReader, load_video
    from video_llava_tpu.media.audio import load_audio

    for line in open(%(manifest)r):
        name, path = line.strip().split("\\t")
        print("VARIANT", name, flush=True)  # last line fingers a crash
        try:
            vr = VideoReader(path)
            if len(vr) > 0:
                vr.get_batch(list(range(min(len(vr), 4))))
            vr.close()
            status = "decoded"
        except Exception as e:
            status = f"raised {type(e).__name__}"
        try:
            a = load_audio(path)
            status += f" audio={len(a)}"
        except Exception as e:
            status += f" audio-raised {type(e).__name__}"
        print("RESULT", name, status, flush=True)
    print("ALL-DONE", flush=True)
    """
)


@pytest.fixture(scope="module")
def variants(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(0)
    base = str(d / "base.mp4")
    encode_video(
        base,
        rng.integers(0, 255, size=(24, 96, 80, 3), dtype=np.uint8),
        fps=8,
        codec="mpeg4",
    )
    data = open(base, "rb").read()
    out = []

    def add(name, blob):
        p = str(d / name)
        with open(p, "wb") as f:
            f.write(blob)
        out.append((name, p))

    add("valid.mp4", data)
    # truncations: header-only through 99%
    for frac in (0.01, 0.05, 0.25, 0.5, 0.9, 0.99):
        add(f"trunc_{int(frac * 100)}.mp4", data[: int(len(data) * frac)])
    add("empty.mp4", b"")
    add("tiny.mp4", data[:16])
    # random single-byte corruptions at deterministic offsets
    for i, off in enumerate(
        rng.integers(16, len(data) - 1, size=8, dtype=np.int64)
    ):
        blob = bytearray(data)
        blob[int(off)] ^= 0xFF
        add(f"flip_{i}.mp4", bytes(blob))
    # pure garbage with plausible size
    add("garbage.mp4", rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes())
    # garbage wearing an mp4 ftyp box header
    add(
        "ftyp_garbage.mp4",
        b"\x00\x00\x00\x18ftypisom"
        + rng.integers(0, 256, size=2048, dtype=np.uint8).tobytes(),
    )
    # truncated WAV
    import wave

    wav = str(d / "ok.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            (rng.normal(size=8000) * 3000).astype(np.int16).tobytes()
        )
    wdata = open(wav, "rb").read()
    add("ok.wav", wdata)
    add("trunc.wav", wdata[: len(wdata) // 3])
    add("hdr_only.wav", wdata[:44])

    manifest = str(d / "manifest.tsv")
    with open(manifest, "w") as f:
        for name, p in out:
            f.write(f"{name}\t{p}\n")
    return manifest, out


def test_fuzz_no_native_crash(variants):
    manifest, items = variants
    proc = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO, "manifest": manifest}],
        capture_output=True,
        text=True,
        timeout=300,
    )
    lines = proc.stdout.splitlines()
    assert proc.returncode == 0, (
        f"native decoder crashed (rc={proc.returncode}) on variant: "
        f"{lines[-1] if lines else '?'}\nstderr tail: {proc.stderr[-2000:]}"
    )
    assert lines and lines[-1] == "ALL-DONE"
    results = {l.split()[1]: l for l in lines if l.startswith("RESULT")}
    assert len(results) == len(items)
    # the pristine inputs must actually decode
    assert "decoded" in results["valid.mp4"]
    assert "audio=8000" in results["ok.wav"]

"""Video loading with reference `load_video` parity, on the native
libav decoder (replaces decord; video_chatgpt/eval/model_utils.py:12-52).

The native library decodes exactly the uniformly-sampled frame indices
and scales on the host; frames come back as one contiguous uint8 RGB
array ready for a single host->device transfer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from video_llava_tpu.ops.sampling import get_seq_frames

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmedia_io.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # Build on first use (g++ + libav dev headers are part of the
        # supported environment).
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vlt_open.restype = ctypes.c_void_p
    lib.vlt_open.argtypes = [ctypes.c_char_p]
    lib.vlt_close.argtypes = [ctypes.c_void_p]
    lib.vlt_num_frames.restype = ctypes.c_int64
    lib.vlt_num_frames.argtypes = [ctypes.c_void_p]
    lib.vlt_width.restype = ctypes.c_int
    lib.vlt_width.argtypes = [ctypes.c_void_p]
    lib.vlt_height.restype = ctypes.c_int
    lib.vlt_height.argtypes = [ctypes.c_void_p]
    lib.vlt_fps.restype = ctypes.c_double
    lib.vlt_fps.argtypes = [ctypes.c_void_p]
    lib.vlt_decode_indices.restype = ctypes.c_int
    lib.vlt_decode_indices.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vlt_encode_video.restype = ctypes.c_int
    lib.vlt_encode_video.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_char_p,
    ]
    _lib = lib
    return lib


class VideoReader:
    """Native video reader (decord VideoReader equivalent)."""

    def __init__(self, path: str):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.vlt_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")
        self.num_frames = int(lib.vlt_num_frames(self._h))
        self.width = int(lib.vlt_width(self._h))
        self.height = int(lib.vlt_height(self._h))
        self.fps = float(lib.vlt_fps(self._h))

    def __len__(self):
        return self.num_frames

    def get_batch(
        self, indices, out_size: Optional[Tuple[int, int]] = None
    ) -> np.ndarray:
        """Decode frames at `indices` (ascending), optionally scaled to
        out_size=(h, w). Returns (n, h, w, 3) uint8 RGB."""
        idx = np.asarray(sorted(int(i) for i in indices), np.int64)
        h, w = out_size if out_size else (self.height, self.width)
        out = np.empty((len(idx), h, w, 3), np.uint8)
        n = self._lib.vlt_decode_indices(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h,
            w,
        )
        if n != len(idx):
            raise IOError(f"decoded {n}/{len(idx)} frames")
        return out

    def close(self):
        if self._h:
            self._lib.vlt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_video(
    vis_path: str,
    n_clips: int = 1,
    num_frm: int = 100,
    shape: Tuple[int, int] = (224, 224),
) -> np.ndarray:
    """Reference load_video (model_utils.py:12-52): uniform middle-of-
    segment sampling of min(total, num_frm) frames, resized to `shape`.

    Returns (t, H, W, 3) uint8 — the PIL-image list of the reference as
    one array (the downstream CLIPImageProcessor equivalence is
    ops.image.preprocess_frames).

    Note on resize parity: the reference resizes with torch nearest
    interpolation AFTER decode; we let swscale do bilinear scaling
    during decode by default for quality, and expose exact nearest
    parity via resize_mode='nearest' in preprocess_frames by decoding at
    native size. For the bit-parity extraction path use
    `load_video_native_size` + preprocess_frames.
    """
    assert n_clips == 1
    vr = VideoReader(vis_path)
    try:
        total = len(vr)
        eff = min(total, num_frm)
        idx = get_seq_frames(total, eff)
        return vr.get_batch(idx, out_size=shape)
    finally:
        vr.close()


def load_video_native_size(
    vis_path: str, num_frm: int = 100
) -> np.ndarray:
    """Sampled frames at native resolution (resize happens on device in
    ops.image.preprocess_frames, matching the reference's
    torch-interpolate-then-normalize order bit-for-bit)."""
    vr = VideoReader(vis_path)
    try:
        total = len(vr)
        eff = min(total, num_frm)
        idx = get_seq_frames(total, eff)
        return vr.get_batch(idx)
    finally:
        vr.close()


def encode_video(
    path: str,
    frames: np.ndarray,
    fps: float = 25.0,
    codec: str = "libx264",
) -> None:
    """Encode (n, h, w, 3) uint8 RGB frames to a video file (replaces
    the reference's ffmpeg subprocess encodes, chat.py:295-298 and
    result_utils.py:38-40)."""
    lib = _load_lib()
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    rc = lib.vlt_encode_video(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        h,
        w,
        float(fps),
        codec.encode(),
    )
    if rc != 0:
        raise IOError(f"encode failed ({rc}) for {path}")

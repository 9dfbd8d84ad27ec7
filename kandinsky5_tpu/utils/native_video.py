"""ctypes binding for the native C++ video writer (native/video_writer.cc).

Builds the shared library on first use if the checked-in build is
missing (plain g++, no pybind11). Falls back to the imageio path in
utils/io.py when neither the library nor a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libk5video.so")

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "video_writer.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vw_open.restype = ctypes.c_void_p
    lib.vw_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vw_write_frames.restype = ctypes.c_int
    lib.vw_write_frames.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int]
    lib.vw_close.restype = ctypes.c_int
    lib.vw_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ffmpeg_exe() -> str:
    try:
        import imageio_ffmpeg

        return imageio_ffmpeg.get_ffmpeg_exe()
    except Exception:
        return ""


def write_video_native(path: str, frames: np.ndarray, fps: int = 24,
                       crf: int = 5) -> bool:
    """frames: (T, H, W, 3) uint8. Returns False if the native path is
    unavailable (caller should fall back to utils/io.write_video)."""
    lib = _load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    ffmpeg = _ffmpeg_exe()
    if not ffmpeg and not path.endswith(".y4m"):
        return False  # only raw y4m possible without an encoder
    handle = lib.vw_open(path.encode(), ffmpeg.encode(), w, h, fps, crf)
    if not handle:
        return False
    try:
        rc = lib.vw_write_frames(
            handle, frames.ctypes.data_as(ctypes.c_char_p), t)
    finally:
        rc_close = lib.vw_close(handle)
    return rc == 0 and rc_close == 0

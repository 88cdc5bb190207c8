"""ctypes bindings for the native frame pipe (runtime/framepipe.cpp).

Native, GIL-free replacement for the threaded Python prefetcher in
io/media.py — the 'data-loader in C++' counterpart to the reference's
blocking FFMPEGProcessor (reference: modules/utils.py:88-113). Builds on
first use with the baked-in g++; callers fall back to the Python path when
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from .media import FrameSink, FrameSource

_RUNTIME_DIR = Path(__file__).resolve().parent.parent / "runtime"
_LIB_PATH = _RUNTIME_DIR / "libframepipe.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-s", "-C", str(_RUNTIME_DIR)], check=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fp_open_reader.restype = ctypes.c_void_p
    lib.fp_open_reader.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.fp_open_writer.restype = ctypes.c_void_p
    lib.fp_open_writer.argtypes = lib.fp_open_reader.argtypes
    lib.fp_read.restype = ctypes.c_int
    lib.fp_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.fp_write.restype = ctypes.c_int
    lib.fp_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.fp_buffered.restype = ctypes.c_int
    lib.fp_buffered.argtypes = [ctypes.c_void_p]
    lib.fp_close.restype = ctypes.c_int
    lib.fp_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def _argv(cmd: Sequence[str]):
    arr = (ctypes.c_char_p * len(cmd))(*[c.encode() for c in cmd])
    return arr, len(cmd)


class NativeFrameSource(FrameSource):
    """Frames produced by a child process writing raw bytes to stdout."""

    def __init__(self, cmd: Sequence[str], width: int, height: int, capacity: int = 64):
        self.lib = load_library()
        self.width, self.height = width, height
        self.frame_bytes = width * height * 3
        arr, n = _argv(cmd)
        self.handle = self.lib.fp_open_reader(arr, n, self.frame_bytes, capacity)
        if not self.handle:
            raise RuntimeError(f"failed to spawn frame producer: {cmd}")
        self._buf = np.empty(self.frame_bytes, np.uint8)

    def read(self) -> Optional[np.ndarray]:
        rc = self.lib.fp_read(
            self.handle, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc <= 0:
            return None
        return self._buf.reshape(self.height, self.width, 3).copy()

    def close(self) -> None:
        if self.handle:
            self.lib.fp_close(self.handle)
            self.handle = None

    def buffered(self) -> int:
        return self.lib.fp_buffered(self.handle)


class NativeFrameSink(FrameSink):
    """Frames consumed by a child process reading raw bytes from stdin."""

    def __init__(self, cmd: Sequence[str], width: int, height: int, capacity: int = 64,
                 pix_fmt: str = "rgb24"):
        self.lib = load_library()
        self.pix_fmt = pix_fmt
        self.frame_bytes = width * height * 3 // (2 if pix_fmt == "yuv420p" else 1)
        arr, n = _argv(cmd)
        self.handle = self.lib.fp_open_writer(arr, n, self.frame_bytes, capacity)
        if not self.handle:
            raise RuntimeError(f"failed to spawn frame consumer: {cmd}")

    def write(self, frame: np.ndarray) -> None:
        data = np.ascontiguousarray(frame, np.uint8)
        rc = self.lib.fp_write(
            self.handle, data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc <= 0:
            raise IOError(f"frame sink write failed (rc={rc})")

    def close(self) -> int:
        if self.handle:
            rc = self.lib.fp_close(self.handle)
            self.handle = None
            return rc
        return 0


def ffmpeg_decoder_cmd(
    path: str, width: int, height: int, fps: float,
    start_time: Optional[str] = None, end_time: Optional[str] = None,
    ffmpeg_path: str = "ffmpeg",
    color_filter: str = "eq=brightness=0.06:saturation=4",
) -> list[str]:
    cmd = [ffmpeg_path, "-hide_banner", "-loglevel", "error"]
    if start_time:
        cmd += ["-ss", start_time]
    cmd += ["-i", path]
    if end_time:
        cmd += ["-to", end_time]
    vf = f"scale={width}:{height}"
    if color_filter:
        vf = f"{color_filter},{vf}"
    cmd += ["-vf", vf, "-r", str(fps), "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"]
    return cmd


def ffmpeg_encoder_cmd(
    path: str, width: int, height: int, fps: float, crf: int = 23,
    ffmpeg_path: str = "ffmpeg", pix_fmt: str = "rgb24",
) -> list[str]:
    return [
        ffmpeg_path, "-hide_banner", "-loglevel", "error", "-y",
        "-f", "rawvideo", "-pix_fmt", pix_fmt, "-s", f"{width}x{height}",
        "-r", str(fps), "-i", "pipe:0",
        "-c:v", "libx264", "-preset", "medium", "-crf", str(crf),
        "-pix_fmt", "yuv420p", path,
    ]

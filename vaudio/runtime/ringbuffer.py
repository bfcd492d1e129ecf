"""Audio ring buffer: ctypes binding to the native C++ implementation with a
semantics-identical pure-Python fallback.

Both implement the reference's real-time transport contract
(SoundEngine.swift:88-217,442-474):

* fixed ring of ``num_frames`` hop-sized frames;
* warm-up gate (silence until ``warmup`` frames buffered once);
* drop-on-full writes, zero-fill-on-underrun reads;
* partial-frame reads via an intra-frame cursor;
* ``reset()`` clears audio but not the warm-up latch (the reference's
  ``stop()`` never resets ``isBufferWarmedUp``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

# The C++ runtime sources ship INSIDE the package (vaudio/native/) so
# a wheel install carries them; the library is built on first use.
_NATIVE_DIR = os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvaudio_rt.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()


def _load_native() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native runtime library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        stale = (os.path.exists(_LIB_PATH)
                 and any(os.path.getmtime(os.path.join(_NATIVE_DIR, f))
                         > os.path.getmtime(_LIB_PATH)
                         for f in ("ringbuffer.cpp", "framereader.cpp")
                         if os.path.exists(os.path.join(_NATIVE_DIR, f))))
        if not os.path.exists(_LIB_PATH) or stale:
            try:
                subprocess.run(["make", "-B", "-C", _NATIVE_DIR]
                               if stale else ["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
            except Exception:
                if not os.path.exists(_LIB_PATH):
                    return None   # stale-but-present lib still loads
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.va_rb_create.restype = ctypes.c_void_p
        lib.va_rb_create.argtypes = [ctypes.c_int] * 3
        lib.va_rb_destroy.argtypes = [ctypes.c_void_p]
        lib.va_rb_write.restype = ctypes.c_int
        lib.va_rb_write.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.va_rb_pull.restype = ctypes.c_int
        lib.va_rb_pull.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int]
        lib.va_rb_available.restype = ctypes.c_int
        lib.va_rb_available.argtypes = [ctypes.c_void_p]
        lib.va_rb_reset.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "va_rb_reset_stats"):   # older cached .so
            lib.va_rb_reset_stats.argtypes = [ctypes.c_void_p]
        lib.va_rb_dropped.restype = ctypes.c_int64
        lib.va_rb_dropped.argtypes = [ctypes.c_void_p]
        lib.va_rb_underruns.restype = ctypes.c_int64
        lib.va_rb_underruns.argtypes = [ctypes.c_void_p]
        lib.va_rb_warmed.restype = ctypes.c_int
        lib.va_rb_warmed.argtypes = [ctypes.c_void_p]
        # Frame-reader entry points (native/framereader.cpp).
        lib.va_fr_open.restype = ctypes.c_void_p
        lib.va_fr_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.c_int]
        lib.va_fr_buffer.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.va_fr_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.va_fr_next.restype = ctypes.c_int
        lib.va_fr_next.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.va_fr_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.va_fr_frames_read.restype = ctypes.c_int64
        lib.va_fr_frames_read.argtypes = [ctypes.c_void_p]
        lib.va_fr_done.restype = ctypes.c_int
        lib.va_fr_done.argtypes = [ctypes.c_void_p]
        lib.va_fr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeRingBuffer:
    """ctypes wrapper over native/ringbuffer.cpp."""

    def __init__(self, num_frames: int, frame_size: int, warmup: int):
        lib = _load_native()
        if lib is None:
            raise RuntimeError("native ring buffer unavailable")
        self._lib = lib
        self.num_frames = num_frames
        self.frame_size = frame_size
        self.warmup = warmup
        self._h = lib.va_rb_create(num_frames, frame_size, warmup)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.va_rb_destroy(h)
            self._h = None

    def write(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, dtype=np.float32)
        assert frame.size == self.frame_size
        ptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return bool(self._lib.va_rb_write(self._h, ptr))

    def pull(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.va_rb_pull(self._h, ptr, n)
        return out

    @property
    def available(self) -> int:
        return self._lib.va_rb_available(self._h)

    @property
    def dropped_frames(self) -> int:
        return self._lib.va_rb_dropped(self._h)

    @property
    def underrun_samples(self) -> int:
        return self._lib.va_rb_underruns(self._h)

    @property
    def warmed_up(self) -> bool:
        return bool(self._lib.va_rb_warmed(self._h))

    def reset(self) -> None:
        self._lib.va_rb_reset(self._h)

    def reset_full(self) -> None:
        """Reset for a slot re-lease: buffers AND the warm-up gate /
        drop / underrun counters — a new client starts with a fresh
        real-time contract (contrast :meth:`reset`, the reference's
        stop semantics, which keeps the stats)."""
        self._lib.va_rb_reset(self._h)
        if hasattr(self._lib, "va_rb_reset_stats"):  # older cached .so
            self._lib.va_rb_reset_stats(self._h)


class PyRingBuffer:
    """Pure-Python fallback with identical semantics (lock-guarded, like the
    reference's NSLock design)."""

    def __init__(self, num_frames: int, frame_size: int, warmup: int):
        self.num_frames = num_frames
        self.frame_size = frame_size
        self.warmup = warmup
        self._data = np.zeros((num_frames, frame_size), np.float32)
        self._write_index = 0
        self._read_index = 0
        self._frame_cursor = 0
        self._available = 0
        self.warmed_up = False
        self.dropped_frames = 0
        self.underrun_samples = 0
        self._lock = threading.Lock()

    def write(self, frame: np.ndarray) -> bool:
        frame = np.asarray(frame, np.float32).reshape(self.frame_size)
        with self._lock:
            if self._available >= self.num_frames:
                self.dropped_frames += 1
                return False
            self._data[self._write_index] = frame
            self._write_index = (self._write_index + 1) % self.num_frames
            self._available += 1
            return True

    def pull(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.float32)
        with self._lock:
            if self._available < self.warmup and not self.warmed_up:
                return out
            self.warmed_up = True
            written = 0
            while written < n:
                if self._available == 0:
                    self.underrun_samples += n - written
                    break  # rest stays zero
                rem = self.frame_size - self._frame_cursor
                to_copy = min(rem, n - written)
                start = self._frame_cursor
                out[written:written + to_copy] = \
                    self._data[self._read_index, start:start + to_copy]
                written += to_copy
                self._frame_cursor += to_copy
                if self._frame_cursor >= self.frame_size:
                    self._frame_cursor = 0
                    self._read_index = (self._read_index + 1) \
                        % self.num_frames
                    self._available -= 1
        return out

    @property
    def available(self) -> int:
        with self._lock:
            return self._available

    def reset(self) -> None:
        with self._lock:
            self._available = 0
            self._read_index = 0
            self._write_index = 0
            self._frame_cursor = 0
            self._data[:] = 0.0

    def reset_full(self) -> None:
        """Reset for a slot re-lease: buffers AND the warm-up gate /
        drop / underrun counters (see NativeRingBuffer.reset_full)."""
        self.reset()
        with self._lock:
            self.warmed_up = False
            self.dropped_frames = 0
            self.underrun_samples = 0


def make_ring_buffer(num_frames: int, frame_size: int, warmup: int,
                     prefer_native: bool = True):
    """Create the best available ring buffer implementation."""
    if prefer_native:
        try:
            return NativeRingBuffer(num_frames, frame_size, warmup)
        except RuntimeError:
            pass
    return PyRingBuffer(num_frames, frame_size, warmup)

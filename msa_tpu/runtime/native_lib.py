"""ctypes bindings for the native host runtime (msa_runtime.cpp).

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes per the environment constraints). Every entry point has
a numpy fallback so the framework works before/without the native build —
the native path is the production host data path, the fallback keeps tests
and cold environments running.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "native" / "msa_runtime.cpp"
_LIB_PATH = Path(__file__).parent / "native" / "libmsa_runtime.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        if proc.returncode != 0:
            logger.warning("native build failed: %s", proc.stderr.decode()[:500])
            return False
        return True
    except Exception as e:  # g++ missing etc.
        logger.warning("native build unavailable: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        i64, f32p, i16p, i64p, voidp = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p,
        )
        lib.msa_pcm16_to_f32.argtypes = [i16p, f32p, i64]
        lib.msa_slice_windows.argtypes = [f32p, i64, i64p, i64p, i64, i64, f32p]
        lib.msa_ring_create.restype = voidp
        lib.msa_ring_create.argtypes = [i64]
        lib.msa_ring_destroy.argtypes = [voidp]
        lib.msa_ring_size.restype = i64
        lib.msa_ring_size.argtypes = [voidp]
        lib.msa_ring_push.restype = i64
        lib.msa_ring_push.argtypes = [voidp, f32p, i64]
        lib.msa_ring_pop.restype = i64
        lib.msa_ring_pop.argtypes = [voidp, f32p, i64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → float32 in [-1, 1]."""
    pcm = np.ascontiguousarray(pcm, np.int16)
    lib = _load()
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape[0], np.float32)
    lib.msa_pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _fptr(out), pcm.shape[0]
    )
    return out


def slice_windows(
    waveform: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    window_samples: int,
) -> np.ndarray:
    """[start, end) sample ranges → [num_segments, window_samples] float32
    windows, zero-padded/truncated — the host hot loop feeding the device."""
    waveform = np.ascontiguousarray(waveform, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    n = starts.shape[0]
    lib = _load()
    if lib is None:
        out = np.zeros((n, window_samples), np.float32)
        for i in range(n):
            lo = max(int(starts[i]), 0)
            hi = min(int(ends[i]), waveform.shape[0])
            m = min(max(hi - lo, 0), window_samples)
            out[i, :m] = waveform[lo : lo + m]
        return out
    out = np.empty((n, window_samples), np.float32)
    lib.msa_slice_windows(
        _fptr(waveform),
        waveform.shape[0],
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        window_samples,
        _fptr(out),
    )
    return out


class NativeRingBuffer:
    """Lock-free SPSC float32 ring for the capture thread → processing loop
    hand-off. Falls back to a Python deque-of-arrays when the native library
    is unavailable."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._lib = _load()
        if self._lib is not None:
            self._ring = self._lib.msa_ring_create(self.capacity)
            self._chunks = None
        else:
            import collections

            self._ring = None
            self._chunks = collections.deque()
            self._size = 0
            self._py_lock = threading.Lock()

    def push(self, samples: np.ndarray) -> int:
        """Append samples; drops oldest on overflow. Returns dropped count."""
        samples = np.ascontiguousarray(samples, np.float32)
        if self._ring is not None:
            return int(self._lib.msa_ring_push(self._ring, _fptr(samples), samples.shape[0]))
        with self._py_lock:
            self._chunks.append(samples)
            self._size += samples.shape[0]
            dropped = 0
            while self._size > self.capacity:
                head = self._chunks[0]
                excess = self._size - self.capacity
                if head.shape[0] <= excess:
                    self._chunks.popleft()
                    self._size -= head.shape[0]
                    dropped += head.shape[0]
                else:
                    self._chunks[0] = head[excess:]
                    self._size -= excess
                    dropped += excess
            return dropped

    def __len__(self) -> int:
        if self._ring is not None:
            return int(self._lib.msa_ring_size(self._ring))
        with self._py_lock:
            return self._size

    def pop(self, n: int) -> np.ndarray:
        """Pop up to n samples (fewer if not available)."""
        if self._ring is not None:
            out = np.empty(n, np.float32)
            got = int(self._lib.msa_ring_pop(self._ring, _fptr(out), n))
            return out[:got]
        with self._py_lock:
            parts, need = [], n
            while need > 0 and self._chunks:
                head = self._chunks[0]
                if head.shape[0] <= need:
                    parts.append(head)
                    self._chunks.popleft()
                    need -= head.shape[0]
                else:
                    parts.append(head[:need])
                    self._chunks[0] = head[need:]
                    need = 0
            got = np.concatenate(parts) if parts else np.empty(0, np.float32)
            self._size -= got.shape[0]
            return got

    def drain(self) -> np.ndarray:
        return self.pop(len(self))

    def __del__(self):
        ring = getattr(self, "_ring", None)
        if ring is not None and self._lib is not None:
            self._lib.msa_ring_destroy(ring)
            self._ring = None

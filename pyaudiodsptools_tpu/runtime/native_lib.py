"""ctypes bindings for the native runtime (padt_runtime.cpp).

Builds the shared library on first use with g++ (cached next to the source);
falls back cleanly if no toolchain is present (`available()` -> False) so the
pure-Python paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "padt_runtime.cpp")
_SO = os.path.join(_HERE, "native", "libpadt_runtime.so")

_lib = None
_lock = threading.Lock()


def _build() -> str:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.padt_ring_create.restype = ctypes.c_void_p
        lib.padt_ring_create.argtypes = [ctypes.c_size_t]
        lib.padt_ring_destroy.argtypes = [ctypes.c_void_p]
        for f in ("padt_ring_capacity", "padt_ring_available", "padt_ring_space"):
            getattr(lib, f).restype = ctypes.c_size_t
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        for f in ("padt_ring_write", "padt_ring_read", "padt_ring_read_or_silence"):
            getattr(lib, f).restype = ctypes.c_size_t
            getattr(lib, f).argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
            ]
        lib.padt_stats_create.restype = ctypes.c_void_p
        lib.padt_stats_create.argtypes = [ctypes.c_uint64]
        lib.padt_stats_destroy.argtypes = [ctypes.c_void_p]
        lib.padt_stats_record.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        for f in ("padt_stats_blocks", "padt_stats_xruns", "padt_stats_total_ns",
                  "padt_stats_worst_ns"):
            getattr(lib, f).restype = ctypes.c_uint64
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeRing:
    """Wait-free SPSC float32 ring buffer backed by C++."""

    def __init__(self, capacity: int):
        self._lib = load()
        self._ptr = self._lib.padt_ring_create(capacity)
        if not self._ptr:  # pragma: no cover
            raise MemoryError("padt_ring_create failed")

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.padt_ring_destroy(self._ptr)
            self._ptr = None

    @property
    def capacity(self) -> int:
        return self._lib.padt_ring_capacity(self._ptr)

    def available(self) -> int:
        return self._lib.padt_ring_available(self._ptr)

    def space(self) -> int:
        return self._lib.padt_ring_space(self._ptr)

    def write(self, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.padt_ring_write(self._ptr, _fptr(samples), samples.size)

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        got = self._lib.padt_ring_read(self._ptr, _fptr(out), n)
        return out[:got]

    def read_block(self, n: int) -> tuple[np.ndarray, bool]:
        """Always returns n samples, zero-filled on underrun; second value is
        True when a full block was available (no xrun)."""
        out = np.empty(n, dtype=np.float32)
        got = self._lib.padt_ring_read_or_silence(self._ptr, _fptr(out), n)
        return out, got == n


class PumpStats:
    """Deadline accounting (blocks processed, xruns, mean/worst ns)."""

    def __init__(self, deadline_ns: int):
        self._lib = load()
        self._ptr = self._lib.padt_stats_create(deadline_ns)

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.padt_stats_destroy(self._ptr)
            self._ptr = None

    def record(self, elapsed_ns: int) -> None:
        self._lib.padt_stats_record(self._ptr, elapsed_ns)

    def snapshot(self) -> dict:
        blocks = self._lib.padt_stats_blocks(self._ptr)
        total = self._lib.padt_stats_total_ns(self._ptr)
        return {
            "blocks": blocks,
            "xruns": self._lib.padt_stats_xruns(self._ptr),
            "mean_ns": total // blocks if blocks else 0,
            "worst_ns": self._lib.padt_stats_worst_ns(self._ptr),
        }

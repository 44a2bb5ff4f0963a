"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA; the streaming runtime around it — sensor
ring-buffer ingestion, time-synchronized interval extraction, CSV output —
is native C++ (native/sensor_sync.cpp), mirroring where the reference keeps
its runtime in C++ (main.cpp buffering/sync/CSV). Falls back cleanly when
the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libsensor_sync.so")
_SAMPLE_DOUBLES = 1 + 3 + 3 + 12 + 12 + 4


def _load(build_if_missing: bool = True):
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sync_create.restype = ctypes.c_void_p
    lib.sync_create.argtypes = [ctypes.c_uint64]
    lib.sync_destroy.argtypes = [ctypes.c_void_p]
    dp = ctypes.POINTER(ctypes.c_double)
    lib.sync_push.argtypes = [ctypes.c_void_p, ctypes.c_double] + [dp] * 5
    lib.sync_size.restype = ctypes.c_uint64
    lib.sync_size.argtypes = [ctypes.c_void_p]
    lib.sync_latest_time.restype = ctypes.c_double
    lib.sync_latest_time.argtypes = [ctypes.c_void_p]
    lib.sync_extract.restype = ctypes.c_int64
    lib.sync_extract.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                 ctypes.c_double, dp, ctypes.c_int64]
    lib.csv_open.restype = ctypes.c_void_p
    lib.csv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.csv_row.argtypes = [ctypes.c_void_p, dp, ctypes.c_int64]
    lib.csv_close.argtypes = [ctypes.c_void_p]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class SensorSync:
    """Native SPSC ring buffer with time-synced interval extraction.

    API mirrors the Python IntervalBuffer drain but runs in C++:
    push(t, acc, gyr, phi, dphi, contact) at 500 Hz; extract(t0, t1) returns
    a packed (n, 35) array [t, acc3, gyr3, phi12, dphi12, c4] including
    interpolated boundary samples (reference: estimator.cpp:303-397 +
    utility.cpp:24-104 lerp helpers)."""

    def __init__(self, capacity: int = 65536):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable; run make -C native")
        self._lib = lib
        self._h = lib.sync_create(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sync_destroy(self._h)
            self._h = None

    def push(self, t, acc, gyr, phi, dphi, contact):
        a = np.ascontiguousarray(acc, np.float64)
        g = np.ascontiguousarray(gyr, np.float64)
        p = np.ascontiguousarray(phi, np.float64)
        d = np.ascontiguousarray(dphi, np.float64)
        c = np.ascontiguousarray(contact, np.float64)
        self._lib.sync_push(self._h, float(t), _as_dp(a), _as_dp(g),
                            _as_dp(p), _as_dp(d), _as_dp(c))

    def size(self) -> int:
        return int(self._lib.sync_size(self._h))

    def latest_time(self) -> float:
        return float(self._lib.sync_latest_time(self._h))

    def extract(self, t0: float, t1: float, max_out: int = 4096):
        out = np.empty((max_out, _SAMPLE_DOUBLES), np.float64)
        n = self._lib.sync_extract(self._h, float(t0), float(t1),
                                   _as_dp(out), max_out)
        if n < 0:
            return None
        return out[:n].copy()


class CsvWriter:
    """Native append-only CSV writer (reference 20-column schema capable)."""

    def __init__(self, path: str, header: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._f = lib.csv_open(path.encode(), header.encode())
        if not self._f:
            raise OSError(f"cannot open {path}")

    def row(self, vals):
        v = np.ascontiguousarray(vals, np.float64)
        self._lib.csv_row(self._f, _as_dp(v), len(v))

    def close(self):
        if self._f:
            self._lib.csv_close(self._f)
            self._f = None

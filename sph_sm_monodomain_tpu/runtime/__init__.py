"""Native (C++) runtime helpers, loaded via ctypes with Python fallbacks.

The reference's entire runtime is C++ (loader, driver, report —
/root/reference/main.cpp); here the TPU compute path is JAX/Pallas and the
host-side IO runtime is native:

  - `parse_cloud_csv`: fast CSV point-cloud parser (reference loader
    semantics, main.cpp:145-179)
  - `TrajectoryWriter`: background-thread binary frame streamer (the
    checkpoint/trajectory subsystem the reference lacks, SURVEY.md §5)

The shared library is built on demand with `make` (g++); every entry point
falls back to pure Python so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libsphsm_runtime.so"
_lib = None
_lib_lock = threading.Lock()


def _load() -> ctypes.CDLL | None:
    """Build (if needed) and load the native library; None on failure."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        try:
            if not _SO.exists() or (_SO.stat().st_mtime <
                                    max((_DIR / s).stat().st_mtime
                                        for s in ("csv_loader.cpp",
                                                  "traj_writer.cpp"))):
                subprocess.run(["make", "-s", "-C", str(_DIR)], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(str(_SO))
            lib.sphsm_parse_cloud_csv.restype = ctypes.c_longlong
            lib.sphsm_parse_cloud_csv.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_longlong)]
            lib.sphsm_traj_open.restype = ctypes.c_void_p
            lib.sphsm_traj_open.argtypes = [ctypes.c_char_p,
                                            ctypes.c_longlong,
                                            ctypes.c_longlong]
            lib.sphsm_traj_append.restype = ctypes.c_longlong
            lib.sphsm_traj_append.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float)]
            lib.sphsm_traj_close.restype = ctypes.c_longlong
            lib.sphsm_traj_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = False  # cache the failure
        return _lib or None


def native_available() -> bool:
    return _load() is not None


def parse_cloud_csv(path, subsample_freq: int = 0,
                    subsample_after: int = 3000,
                    capacity: int = 2_000_000) -> np.ndarray | None:
    """Native CSV parse; returns (N, 3) float32 or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    total = ctypes.c_longlong(0)

    def parse(cap):
        out = np.empty((cap, 3), dtype=np.float32)
        n = lib.sphsm_parse_cloud_csv(
            str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap, subsample_freq, subsample_after, ctypes.byref(total))
        if n < 0:
            raise FileNotFoundError(path)
        return out, n

    out, n = parse(capacity)
    if n >= capacity and total.value > capacity:
        # the default capacity truncated the kept rows (the Python fallback
        # has no cap, so silent truncation would make physics depend on the
        # build environment); total data rows is an exact upper bound
        out, n = parse(int(total.value))
    return out[:n].copy()


class TrajectoryWriter:
    """Stream (step, payload) frames to disk off the hot loop.

    payload = concatenated float32 per-particle fields, `fields` per
    particle (e.g. 4 for [pos3, vm]). Uses the native background-thread
    writer when available, else a plain synchronous Python fallback.
    """

    MAGIC = b"SPHT0001"

    def __init__(self, path: str, n_particles: int, fields: int = 4):
        self.path = str(path)
        self.n = int(n_particles)
        self.fields = int(fields)
        self._lib = _load()
        self._handle = None
        self._file = None
        if self._lib is not None:
            self._handle = self._lib.sphsm_traj_open(
                self.path.encode(), self.n, self.fields)
        if self._handle is None:
            self._lib = None
            self._file = open(self.path, "wb")
            self._file.write(self.MAGIC)
            np.asarray([self.n, self.fields], np.int64).tofile(self._file)

    def append(self, step: int, payload: np.ndarray) -> None:
        payload = np.ascontiguousarray(payload, dtype=np.float32)
        assert payload.size == self.n * self.fields, \
            f"payload size {payload.size} != {self.n * self.fields}"
        if self._lib is not None:
            self._lib.sphsm_traj_append(
                self._handle, int(step),
                payload.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            np.asarray([step], np.int64).tofile(self._file)
            payload.tofile(self._file)

    def close(self) -> int:
        if self._lib is not None:
            n = int(self._lib.sphsm_traj_close(self._handle))
            self._handle = None
            self._lib = None
            if n < 0:
                raise IOError(
                    f"trajectory writer hit a disk write error on "
                    f"{self.path} ({-n - 1} frames written before it); "
                    "the file is truncated/corrupt")
            return n
        if self._file:
            self._file.close()
            self._file = None
        return -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_trajectory(path):
    """Read a trajectory file -> (steps (T,), payload (T, N, fields))."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != TrajectoryWriter.MAGIC:
            raise ValueError(f"bad trajectory magic {magic!r}")
        n, fields = np.fromfile(f, np.int64, 2)
        frame_bytes = 8 + 4 * n * fields
        data = f.read()
    t = len(data) // frame_bytes
    steps = np.empty(t, np.int64)
    payload = np.empty((t, n, fields), np.float32)
    for i in range(t):
        off = i * frame_bytes
        steps[i] = np.frombuffer(data, np.int64, 1, off)[0]
        payload[i] = np.frombuffer(data, np.float32, n * fields,
                                   off + 8).reshape(n, fields)
    return steps, payload

"""ctypes bindings for the C++ runtime (LAP solver, prefetching loader).

Builds `libtpupose_runtime.so` on first use if missing (g++, links libjpeg).
All entry points degrade gracefully: `available()` gates native use and the
Python callers fall back to scipy/PIL when the library can't be built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpupose_runtime.so")
_lib = None
_tried = False


def _build():
    subprocess.run(
        ["make", "-s", "-C", _DIR],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # Always invoke make: it is a timestamp no-op when the .so is
        # current, and it rebuilds when the C++ sources changed (loading a
        # stale library after a source edit would be a silent version skew).
        _build()
        lib = ctypes.CDLL(_SO)
        lib.tpupose_solve_lap.restype = ctypes.c_int
        lib.tpupose_solve_lap.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpupose_loader_create.restype = ctypes.c_void_p
        lib.tpupose_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.tpupose_loader_next.restype = ctypes.c_int32
        lib.tpupose_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpupose_loader_total.restype = ctypes.c_int64
        lib.tpupose_loader_total.argtypes = [ctypes.c_void_p]
        lib.tpupose_loader_stats.restype = None
        lib.tpupose_loader_stats.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tpupose_loader_destroy.restype = None
        lib.tpupose_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def solve_lap(cost: np.ndarray) -> np.ndarray:
    """Minimize over an (R, C) cost matrix, R <= C. Returns col_of_row (R,).

    Native JV solver; same optimum as scipy.optimize.linear_sum_assignment.
    """
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float32)
    r, c = cost.shape
    transpose = r > c
    if transpose:
        cost = np.ascontiguousarray(cost.T)
        r, c = cost.shape
    out = np.full(r, -1, np.int32)
    rc = lib.tpupose_solve_lap(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(r),
        np.int32(c),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"tpupose_solve_lap failed: {rc}")
    if not transpose:
        return out
    # out maps transposed-rows (original cols) -> original rows; invert.
    inv = np.full(c, -1, np.int32)
    for j, i in enumerate(out):
        if i >= 0:
            inv[i] = j
    return inv


class FrameLoader:
    """Prefetching multi-view JPEG loader (decode-ahead worker threads)."""

    def __init__(self, frame_paths, prefetch=4, threads=2):
        """frame_paths: list over frames of lists of per-view paths."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.num_views = len(frame_paths[0])
        flat = [p.encode() for fr in frame_paths for p in fr]
        arr = (ctypes.c_char_p * len(flat))(*flat)
        self._handle = lib.tpupose_loader_create(
            arr, len(frame_paths), self.num_views, prefetch, threads
        )
        self._buf = None
        self._paths = frame_paths
        self._index = 0  # next frame to hand out (for error reporting)

    def __iter__(self):
        return self

    def __next__(self):
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        if self._buf is None:
            # First frame: allocate generously (4K per view), then shrink.
            self._buf = np.empty(self.num_views * 3840 * 2160 * 3, np.uint8)
        rc = self._lib.tpupose_loader_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.size,
            ctypes.byref(w),
            ctypes.byref(h),
        )
        if rc == 0:
            raise StopIteration
        if rc < 0:
            idx = self._index
            self._index += 1  # the C++ side already consumed the slot
            raise RuntimeError(
                f"frame {idx} decode failed (missing/corrupt file or "
                f"mismatched view dimensions) among views: "
                f"{self._paths[idx]}"
            )
        self._index += 1
        n = self.num_views * h.value * w.value * 3
        return (
            self._buf[:n]
            .reshape(self.num_views, h.value, w.value, 3)
            .copy()
        )

    def stats(self):
        """Worker time breakdown: seconds spent decoding vs blocked on the
        credit window, and frames decoded (all workers summed)."""
        d = ctypes.c_int64()
        w = ctypes.c_int64()
        n = ctypes.c_int64()
        self._lib.tpupose_loader_stats(
            self._handle, ctypes.byref(d), ctypes.byref(w), ctypes.byref(n)
        )
        return {
            "decode_s": d.value / 1e9,
            "credit_wait_s": w.value / 1e9,
            "frames_decoded": n.value,
        }

    def close(self):
        if self._handle:
            self._lib.tpupose_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

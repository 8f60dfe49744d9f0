"""ctypes bindings for the native C++ runtime (native/*.cpp).

Compiled on first use with g++ into native/build/. Provides:
- host box ops (rotated IoU / NMS / circle NMS / points-in-boxes) —
  the native replacement for the reference's numba-jitted host ops
  (box3d_nms.py:181, box_np_ops.py);
- an async threaded file prefetcher (the mmcv dataloader-worker
  equivalent) used by the training data iterator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LOCK = threading.Lock()
_LIBS = {}

__all__ = [
    "boxes_iou_bev_cpu",
    "nms_bev_cpu",
    "circle_nms_cpu",
    "points_in_boxes_cpu",
    "PrefetchLoader",
    "native_available",
]


def _build(name: str, extra_flags=()):
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", out, *extra_flags]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib(name: str, extra_flags=()):
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name, extra_flags))
        return _LIBS[name]


def native_available() -> bool:
    try:
        _lib("boxops")
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# box ops
# ---------------------------------------------------------------------------

def _boxops():
    lib = _lib("boxops")
    if not getattr(lib, "_typed", False):
        d = ctypes.POINTER(ctypes.c_double)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        i32 = ctypes.POINTER(ctypes.c_int32)
        lib.boxes_iou_bev.argtypes = [d, ctypes.c_int64, d, ctypes.c_int64, d]
        lib.nms_bev.argtypes = [d, d, ctypes.c_int64, ctypes.c_double, u8]
        lib.nms_bev.restype = ctypes.c_int64
        lib.circle_nms.argtypes = [d, d, ctypes.c_int64, ctypes.c_double, u8]
        lib.circle_nms.restype = ctypes.c_int64
        lib.points_in_boxes.argtypes = [d, ctypes.c_int64, d, ctypes.c_int64, i32]
        lib._typed = True
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def boxes_iou_bev_cpu(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    out = np.zeros((len(a), len(b)), np.float64)
    _boxops().boxes_iou_bev(_dptr(a), len(a), _dptr(b), len(b), _dptr(out))
    return out


def nms_bev_cpu(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float64)
    scores = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros(len(boxes), np.uint8)
    _boxops().nms_bev(
        _dptr(boxes), _dptr(scores), len(boxes), thresh,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def circle_nms_cpu(xy: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    xy = np.ascontiguousarray(xy[:, :2], np.float64)
    scores = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros(len(xy), np.uint8)
    _boxops().circle_nms(
        _dptr(xy), _dptr(scores), len(xy), thresh,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def points_in_boxes_cpu(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    points = np.ascontiguousarray(points[:, :3], np.float64)
    boxes = np.ascontiguousarray(boxes[:, :7], np.float64)
    out = np.full(len(points), -1, np.int32)
    _boxops().points_in_boxes(
        _dptr(points), len(points), _dptr(boxes), len(boxes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


# ---------------------------------------------------------------------------
# prefetch loader
# ---------------------------------------------------------------------------

class PrefetchLoader:
    """Async file reads on a native thread pool.

    >>> loader = PrefetchLoader(4)
    >>> tid, buf = loader.submit(path, capacity)
    >>> n = loader.wait(tid); data = buf[:n]
    """

    def __init__(self, n_threads: int = 4):
        lib = _lib("loader", extra_flags=("-pthread",))
        if not getattr(lib, "_typed", False):
            lib.loader_create.argtypes = [ctypes.c_int]
            lib.loader_create.restype = ctypes.c_void_p
            lib.loader_destroy.argtypes = [ctypes.c_void_p]
            lib.loader_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.loader_submit.restype = ctypes.c_int64
            lib.loader_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.loader_wait.restype = ctypes.c_int64
            lib.loader_poll.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.loader_poll.restype = ctypes.c_int
            lib._typed = True
        self._lib = lib
        self._pool = lib.loader_create(n_threads)
        self._buffers = {}

    def submit(self, path: str, capacity: int):
        buf = np.empty(capacity, np.uint8)
        tid = self._lib.loader_submit(
            self._pool, path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
        )
        self._buffers[tid] = buf
        return tid, buf

    def wait(self, tid: int) -> int:
        n = self._lib.loader_wait(self._pool, tid)
        return int(n)

    def poll(self, tid: int) -> bool:
        return self._lib.loader_poll(self._pool, tid) == 1

    def pop(self, tid: int) -> np.ndarray:
        n = self.wait(tid)
        buf = self._buffers.pop(tid)
        return buf[: max(n, 0)]

    def close(self):
        if self._pool:
            self._lib.loader_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""ctypes bindings for the native host-geometry library.

Auto-builds the .so from source on first use when g++ is available
(atomic: compile to a temp path, rename into place); falls back to
None otherwise, and callers (eval) then use the jnp path. Manual
build: ``tools/build_native.sh``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_LOAD_FAILED = False


def _try_build(src: str, path: str) -> bool:
    """Compile src -> path atomically; True on success."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(path))
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", src,
             "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, path)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        return None
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libsm3det_geometry.so")
    src = os.path.join(here, "rotated_geometry.cc")
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # Missing or truncated .so: rebuild from source once.
        if not (os.path.exists(src) and _try_build(src, path)):
            _LOAD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _LOAD_FAILED = True
            return None
    lib.box_iou_rotated.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.nms_rotated.restype = ctypes.c_int
    lib.nms_rotated.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def box_iou_rotated_native(b1: np.ndarray, b2: np.ndarray):
    """(N1, 5) x (N2, 5) -> (N1, N2) IoU, or None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    b1 = np.ascontiguousarray(b1, np.float32)
    b2 = np.ascontiguousarray(b2, np.float32)
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.box_iou_rotated(_fp(b1), len(b1), _fp(b2), len(b2), _fp(out))
    return out


def nms_rotated_native(boxes: np.ndarray, scores: np.ndarray,
                       iou_thr: float):
    """Greedy rotated NMS; returns kept indices or None."""
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(boxes), np.int32)
    n = lib.nms_rotated(
        _fp(boxes), _fp(scores), len(boxes), ctypes.c_float(iou_thr),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].copy()

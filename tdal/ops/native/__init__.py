"""Native (C++) host ops: rotated IoU / NMS oracle, compiled on demand via g++.

ctypes bindings (no pybind11 in this image). The .so is built once into the package
directory and cached; rebuilds happen when the source is newer than the binary.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "rotated_iou.cpp"
_SO = _DIR / "librotated_iou.so"
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
        check=True,
        capture_output=True,
    )


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.boxes_iou_bev.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.boxes_iou_3d.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.nms_rotated.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_float, i32p,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def boxes_iou_bev(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    lib.boxes_iou_bev(a, len(a), b, len(b), out)
    return out


def boxes_iou_3d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    lib.boxes_iou_3d(a, len(a), b, len(b), out)
    return out


def nms_rotated(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    lib = load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(len(boxes), np.int32)
    n_keep = ctypes.c_int(0)
    lib.nms_rotated(boxes, scores, len(boxes), float(thresh), keep, ctypes.byref(n_keep))
    return keep[: n_keep.value]


_FC_SRC = _DIR / "frame_cache.cpp"
_FC_SO = _DIR / "libframe_cache.so"
_fc_lib = None


def frame_cache_lib():
    """ctypes handle to the columnar frame-cache op (builds on first use)."""
    global _fc_lib
    if _fc_lib is not None:
        return _fc_lib
    if not _FC_SO.exists() or _FC_SO.stat().st_mtime < _FC_SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_FC_SRC),
             "-o", str(_FC_SO)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(_FC_SO))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.tdc_write.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_uint32, ctypes.c_uint32
    ]
    lib.tdc_write.restype = ctypes.c_int
    lib.tdc_peek.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.tdc_peek.restype = ctypes.c_int
    lib.tdc_read.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_uint32, ctypes.c_uint32
    ]
    lib.tdc_read.restype = ctypes.c_int
    _fc_lib = lib
    return lib

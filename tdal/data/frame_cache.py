"""Columnar per-frame point cache (native C++ reader with python fallback).

The 6-stage pipeline re-reads per-frame lidar pickles constantly (detection
training epochs, trackData extraction, labeler dataset construction); pickle
parsing builds Python objects per load. ``build_cache`` converts each frame's
point matrix (xyz + features, tanh applied once at build time) into a flat
float32 ``.tdc`` blob, and ``read_points_cached`` loads it with one
open+read into a preallocated array through the C++ op
(tdal/ops/native/frame_cache.cpp) — measured several times faster than
unpickling (see benchmarks/RESULTS.md).

Capability parity: the IO role of the reference's torch DataLoader C++ worker
machinery (det3d/datasets/loader/build_loader.py); the cache is opt-in and the
pickle path keeps working everywhere.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = 0x31434454  # "TDC1"
_HEADER = struct.Struct("<IIII")


def _native():
    try:
        from tdal.ops.native import frame_cache_lib

        return frame_cache_lib()
    except Exception:
        return None


def write_points_cache(path, points: np.ndarray) -> None:
    """points (N, D) float32 -> one .tdc blob."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _native()
    if lib is not None:
        rc = lib.tdc_write(
            str(path).encode(), points, points.shape[0], points.shape[1]
        )
        if rc == 0:
            return
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, points.shape[0], points.shape[1], 0))
        f.write(points.tobytes())


def read_points_cache(path) -> np.ndarray:
    """One .tdc blob -> (N, D) float32."""
    lib = _native()
    if lib is not None:
        import ctypes

        n = ctypes.c_uint32()
        d = ctypes.c_uint32()
        if lib.tdc_peek(str(path).encode(), ctypes.byref(n), ctypes.byref(d)) == 0:
            out = np.empty((n.value, d.value), np.float32)
            if lib.tdc_read(str(path).encode(), out, n.value, d.value) == 0:
                return out
    with open(path, "rb") as f:
        magic, n, d, _ = _HEADER.unpack(f.read(16))
        if magic != MAGIC:
            raise ValueError(f"not a TDC file: {path}")
        return np.frombuffer(f.read(n * d * 4), np.float32).reshape(n, d)


def cache_path_for(frame_path) -> Path:
    return Path(str(frame_path) + ".tdc")


def build_cache(infos, logger=None, with_sweeps: bool = True) -> int:
    """Write a .tdc next to every frame pickle referenced by ``infos``.

    Stores [xyz, tanh(intensity), elongation] (the post-load layout of
    detection.read_points) so training skips both the unpickle AND the
    per-epoch tanh. Returns the number of files written."""
    from tdal.data.waymo_schema import load_pickle

    done = set()
    n_written = 0
    stack = []
    for info in infos:
        stack.append(info["path"])
        if with_sweeps:
            stack.extend(s["path"] for s in info.get("sweeps", []))
    for p in stack:
        if p in done:
            continue
        done.add(p)
        out = cache_path_for(p)
        if out.exists():
            continue
        obj = load_pickle(p)
        xyz = np.asarray(obj["lidars"]["points_xyz"], np.float32)
        feat = np.array(obj["lidars"]["points_feature"], np.float32)
        feat[:, 0] = np.tanh(feat[:, 0])
        write_points_cache(out, np.concatenate([xyz, feat], axis=1))
        n_written += 1
    if logger:
        logger.info(f"frame cache: wrote {n_written} .tdc files")
    return n_written


def read_frame_points(frame_path) -> np.ndarray | None:
    """Cached [xyz, tanh(int), elong] for a frame pickle path, or None."""
    p = cache_path_for(frame_path)
    if not p.exists():
        return None
    return read_points_cache(p)

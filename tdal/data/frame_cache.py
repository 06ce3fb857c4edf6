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
    """points (N, D) float32 -> one .tdc blob (atomic: tmp file + rename)."""
    import os

    points = np.ascontiguousarray(points, np.float32)
    # Write to a sibling tmp then rename, so a crash mid-write never leaves a
    # truncated .tdc behind (build_cache skips existing files, which would
    # otherwise permanently pin the corrupt blob).
    tmp = str(path) + f".tmp{os.getpid()}"
    lib = _native()
    wrote = False
    if lib is not None:
        wrote = (
            lib.tdc_write(tmp.encode(), points, points.shape[0], points.shape[1]) == 0
        )
    if not wrote:
        with open(tmp, "wb") as f:
            f.write(_HEADER.pack(MAGIC, points.shape[0], points.shape[1], 0))
            f.write(points.tobytes())
    os.replace(tmp, path)


def read_points_cache(path) -> np.ndarray:
    """One .tdc blob -> (N, D) float32. Raises ValueError on a corrupt file."""
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
        header = f.read(16)
        if len(header) < 16:
            raise ValueError(f"truncated TDC header: {path}")
        magic, n, d, _ = _HEADER.unpack(header)
        if magic != MAGIC:
            raise ValueError(f"not a TDC file: {path}")
        body = f.read(n * d * 4)
        if len(body) != n * d * 4:
            raise ValueError(f"truncated TDC body: {path}")
        return np.frombuffer(body, np.float32).reshape(n, d)


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
    """Cached [xyz, tanh(int), elong] for a frame pickle path, or None.

    Returns None (-> callers fall back to the pickle) on ANY read/validation
    failure, so a corrupt cache file degrades to the slow path instead of
    breaking loading of that frame."""
    p = cache_path_for(frame_path)
    if not p.exists():
        return None
    try:
        return read_points_cache(p)
    except Exception:
        return None

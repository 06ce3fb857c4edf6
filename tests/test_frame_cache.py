"""Columnar frame cache: round trip, native/python agreement, dataset wiring."""

import time

import numpy as np

from tdal.data.frame_cache import (
    build_cache,
    cache_path_for,
    read_points_cache,
    write_points_cache,
)


def test_roundtrip_and_python_fallback(tmp_path):
    pts = np.random.default_rng(0).normal(size=(1000, 5)).astype(np.float32)
    p = tmp_path / "f.tdc"
    write_points_cache(p, pts)
    np.testing.assert_array_equal(read_points_cache(p), pts)

    # python fallback reads what the native writer wrote (same format)
    import tdal.data.frame_cache as fc

    orig = fc._native
    fc._native = lambda: None
    try:
        np.testing.assert_array_equal(read_points_cache(p), pts)
        p2 = tmp_path / "g.tdc"
        write_points_cache(p2, pts)
    finally:
        fc._native = orig
    np.testing.assert_array_equal(read_points_cache(p2), pts)


def test_build_cache_and_read_points(tmp_path):
    from tdal.data.detection import read_points
    from tdal.data.synthetic import make_synthetic_dataset

    infos, _ = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=3, seed=0,
        points_per_object=64, n_background=256,
    )
    before = read_points(infos[1])  # pickle path
    n = build_cache(infos)
    assert n == 3
    assert cache_path_for(infos[1]["path"]).exists()
    after = read_points(infos[1])  # cache path
    np.testing.assert_allclose(after, before, rtol=1e-6, atol=1e-7)
    # idempotent
    assert build_cache(infos) == 0


def test_cache_read_is_faster_than_pickle(tmp_path):
    """Sanity (not a strict perf assert): one cold pass each, cache <= pickle."""
    from tdal.data.synthetic import make_synthetic_dataset
    from tdal.data.waymo_schema import load_pickle

    infos, _ = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=2, seed=0,
        points_per_object=512, n_background=60000,
    )
    build_cache(infos)
    path = infos[0]["path"]
    t0 = time.perf_counter()
    for _ in range(20):
        obj = load_pickle(path)
        xyz = np.asarray(obj["lidars"]["points_xyz"], np.float32)
        feat = np.array(obj["lidars"]["points_feature"], np.float32)
        feat[:, 0] = np.tanh(feat[:, 0])
        np.concatenate([xyz, feat], axis=1)
    t_pickle = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        read_points_cache(cache_path_for(path))
    t_cache = time.perf_counter() - t0
    print(f"pickle {t_pickle*50:.2f} ms/frame vs tdc {t_cache*50:.2f} ms/frame")
    assert t_cache < t_pickle * 1.5  # generous: IO noise on shared hosts


def test_corrupt_cache_falls_back_to_pickle(tmp_path):
    """ADVICE r2: a truncated/corrupt .tdc must degrade to the pickle path
    (read_frame_points -> None), never raise; writes are tmp+rename atomic."""
    import os

    from tdal.data.frame_cache import read_frame_points

    pts = np.random.default_rng(1).normal(size=(500, 5)).astype(np.float32)
    frame = tmp_path / "seq_0_frame_0.pkl"
    frame.write_bytes(b"placeholder")
    cache = cache_path_for(frame)
    write_points_cache(cache, pts)
    # no tmp residue after an atomic write
    assert not [p for p in os.listdir(tmp_path) if ".tmp" in p]
    np.testing.assert_array_equal(read_frame_points(frame), pts)

    # truncate mid-body -> None (pickle fallback), not an exception
    blob = cache.read_bytes()
    cache.write_bytes(blob[: len(blob) // 2])
    assert read_frame_points(frame) is None
    # garbage header -> None too
    cache.write_bytes(b"\x00" * 7)
    assert read_frame_points(frame) is None

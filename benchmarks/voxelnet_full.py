"""Sparse VoxelNet backbone at the FULL Waymo grid (41, 1504, 1504), 180k voxels.

Measures forward (eval + train-with-grad) on the real chip.
Usage: python benchmarks/voxelnet_full.py [n_voxels] [sparse|columns]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.models.scn_columns import ColumnMiddleBackbone
from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.utils.timing import chain, force_completion, timeit_chained

GRID = (41, 1504, 1504)
NV = int(sys.argv[1]) if len(sys.argv) > 1 else 180000
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "sparse"
DT = jnp.bfloat16


def fabricate_voxels(nv, seed=0):
    """Surface-like voxel distribution: clusters along a ground plane + objects."""
    rng = np.random.default_rng(seed)
    n_ground = int(nv * 0.7)
    g_yx = rng.integers(0, 1504, (n_ground, 2))
    g_z = rng.integers(0, 6, (n_ground, 1))
    n_obj = nv - n_ground
    centers = rng.integers(100, 1404, (200, 2))
    pick = rng.integers(0, 200, n_obj)
    o_yx = np.clip(centers[pick] + rng.integers(-8, 9, (n_obj, 2)), 0, 1503)
    o_z = rng.integers(0, 30, (n_obj, 1))
    coords = np.concatenate(
        [np.concatenate([g_z, g_yx], 1), np.concatenate([o_z, o_yx], 1)], 0
    )
    coords = np.unique(coords, axis=0)
    v = len(coords)
    out = np.zeros((NV, 3), np.int32)
    out[:v] = coords
    valid = np.arange(NV) < v
    feats = rng.normal(size=(NV, 5)).astype(np.float32) * valid[:, None]
    return out, feats.astype(np.float32), valid, v


def main():
    coords, feats, valid, v = fabricate_voxels(NV)
    print(f"grid {GRID}, {v} unique voxels (buffer {NV})")
    if BACKEND == "columns":
        model = ColumnMiddleBackbone(
            grid_size=GRID, dtype=DT,
            column_caps=(NV, NV // 2, NV // 4, NV // 8),
        )
    else:
        model = SparseMiddleBackbone(grid_size=GRID, dtype=DT)
    print(f"backend: {BACKEND}")
    cb = jnp.asarray(coords)[None]
    fb = jnp.asarray(feats)[None]
    vb = jnp.asarray(valid)[None]
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    variables = jax.jit(model.init, static_argnums=4)(
        {"params": key}, fb, cb, vb, False
    )
    force_completion(variables["params"]["w_in"])
    print(f"init {time.perf_counter() - t0:.0f}s")

    fwd = jax.jit(lambda f: model.apply(variables, f, cb, vb, train=False))
    t0 = time.perf_counter()
    out = fwd(fb)
    force_completion(out)
    print(f"fwd compile+run {time.perf_counter() - t0:.0f}s, bev {out.shape}")
    dt = timeit_chained(lambda z, ff: chain(z, fwd(ff)), jnp.zeros(()), fb, iters=10, warmup=2)
    print(f"voxelnet sparse backbone fwd eval, {v} vox full grid: {dt*1e3:.1f} ms/frame")

    def loss(p, f):
        o, _ = model.apply(
            {**variables, "params": p}, f, cb, vb, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-9

    gj = jax.jit(jax.grad(loss))
    t0 = time.perf_counter()
    g = gj(variables["params"], fb)
    force_completion(g["w_in"])
    print(f"grad compile+run {time.perf_counter() - t0:.0f}s")
    dt = timeit_chained(
        lambda z, ff: chain(z, gj(variables["params"], ff)["w_in"]),
        jnp.zeros(()), fb, iters=5, warmup=1,
    )
    print(f"voxelnet sparse backbone fwd+bwd train: {dt*1e3:.1f} ms/frame")

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            print(f"peak device memory: {stats.get('peak_bytes_in_use', 0)/1e9:.2f} GB")
    except Exception:
        pass


if __name__ == "__main__":
    main()

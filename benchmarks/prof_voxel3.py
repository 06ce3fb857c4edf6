"""Bisect voxelize_batch cost: sort vs slab-fill vs alternatives (TPU).

Rows (each ONE compiled program; differences isolate segment cost):
  sort only            — the flat key+payload sort
  sort+meta            — + voxel_start/num_points bookkeeping (no buffer fill)
  full (slab fill)     — current production path (vmap dynamic_slice)
  full (row gather)    — buffer fill via (V*P) monotone per-row gathers
  flat outputs         — sorted pts + per-point vox_id/rank (no (V,P,D) buffer):
                         what a flat PFN would consume

Measured on TPU v5e (axon), B=2 x 180k pts, 32k voxels x 20 pts:
  sort only             4.18 ms
  sort+meta             4.74 ms
  full (slab fill)      9.66 ms   <- production path
  full (row gather)    13.27 ms
  flat outputs          8.57 ms

Decision: keep the slab fill. The (V,P,D) buffer fill costs ~4.9 ms over
sort+meta, but the flat alternative only recovers ~1.1 ms (its vox_id/rank
bookkeeping is itself ~3.8 ms of cumsum/scatter work) and would force a
masked-segment rewrite of PillarFeatureNet's BN/max for at most ~1-2 ms of
the 102 ms train step. Row gathers lose outright (per-row gather latency
exceeds the vmapped dynamic_slice slab copy at P=20).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.voxel import VoxelConfig, pad_points, voxelize_batch
from tdal.utils.timing import chain, timeit_chained

VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
B = 2
rng = np.random.default_rng(0)
pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
padded = pad_points(pts, 180000)
points = jnp.stack([jnp.asarray(padded)] * B)

pc3 = jnp.asarray(VOX.point_cloud_range[:3], jnp.float32)
vs3 = jnp.asarray(VOX.voxel_size, jnp.float32)
nx, ny, nz = (int(g) for g in VOX.grid_size)
big = nz * ny * nx
n = points.shape[1]
d = points.shape[2]
max_voxels = min(VOX.max_voxels, n)
max_points = VOX.max_points_per_voxel


def keys_of(points):
    rel = (points[..., :3] - pc3) / vs3
    idx = jnp.floor(rel).astype(jnp.int32)
    valid = (
        (idx[..., 0] >= 0) & (idx[..., 0] < nx)
        & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
        & (idx[..., 2] >= 0) & (idx[..., 2] < nz)
        & jnp.isfinite(points[..., :3]).all(axis=-1)
    )
    cell = idx[..., 2] * (ny * nx) + idx[..., 1] * nx + idx[..., 0]
    cell = jnp.where(valid, cell, big)
    b = points.shape[0]
    return (cell + jnp.int32(big + 1) * jnp.arange(b, dtype=jnp.int32)[:, None]).reshape(-1)


def sorted_flat(points):
    key = keys_of(points)
    ops = (key,) + tuple(points[..., i].reshape(-1) for i in range(d))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    b = points.shape[0]
    cell_s = out[0].reshape(b, n) - jnp.int32(big + 1) * jnp.arange(b, dtype=jnp.int32)[:, None]
    pts_s = jnp.stack(out[1:], axis=-1).reshape(b, n, d)
    return cell_s, pts_s, cell_s < big


def meta_of(cell_s, valid_s):
    first = jnp.concatenate([jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]) & valid_s
    vox_id = jnp.cumsum(first) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    keep_first = first & (vox_id < max_voxels)
    start_slot = jnp.where(keep_first, vox_id, max_voxels)
    voxel_start = jnp.zeros((max_voxels + 1,), jnp.int32).at[start_slot].set(pos, mode="drop")[:max_voxels]
    n_valid = valid_s.sum()
    n_voxels = jnp.minimum(jnp.sum(first), max_voxels).astype(jnp.int32)
    vslots = jnp.arange(max_voxels)
    nstart = jnp.where(vslots + 1 < n_voxels, jnp.roll(voxel_start, -1), n_valid)
    num_points = jnp.where(vslots < n_voxels, jnp.minimum(nstart - voxel_start, max_points), 0).astype(jnp.int32)
    return vox_id, voxel_start, num_points, n_voxels


def f_sort(points):
    cell_s, pts_s, valid_s = sorted_flat(points)
    return pts_s


def f_sortmeta(points):
    cell_s, pts_s, valid_s = sorted_flat(points)
    vox_id, vs_, np_, nv = jax.vmap(meta_of)(cell_s, valid_s)
    return pts_s, vs_, np_, nv


def f_full(points):
    return voxelize_batch(points, VOX)


def f_rowgather(points):
    cell_s, pts_s, valid_s = sorted_flat(points)

    def fill(cell_s1, pts_s1, valid_s1):
        vox_id, voxel_start, num_points, n_voxels = meta_of(cell_s1, valid_s1)
        # (V, P) row indices into the sorted array; clamp into a pad row.
        ridx = jnp.minimum(voxel_start[:, None] + jnp.arange(max_points)[None, :], n)
        pts_pad = jnp.concatenate([pts_s1, jnp.zeros((1, d), pts_s1.dtype)], 0)
        slabs = pts_pad[ridx.reshape(-1)].reshape(max_voxels, max_points, d)
        in_vox = jnp.arange(max_points)[None, :] < num_points[:, None]
        voxels = jnp.where(in_vox[..., None], slabs, 0.0)
        return voxels, num_points, n_voxels

    return jax.vmap(fill)(cell_s, pts_s, valid_s)


def f_flat(points):
    cell_s, pts_s, valid_s = sorted_flat(points)

    def flat(cell_s1, pts_s1, valid_s1):
        vox_id, voxel_start, num_points, n_voxels = meta_of(cell_s1, valid_s1)
        vid = jnp.minimum(vox_id, max_voxels - 1).astype(jnp.int32)
        rank = jnp.arange(n, dtype=jnp.int32) - voxel_start[vid]  # monotone gather
        live = valid_s1 & (rank < max_points) & (vox_id < max_voxels)
        return vid, rank, live

    vid, rank, live = jax.vmap(flat)(cell_s, valid_s, valid_s)
    return pts_s, vid, rank, live


for name, f in [
    ("sort only", f_sort),
    ("sort+meta", f_sortmeta),
    ("full (slab fill)", f_full),
    ("full (row gather)", f_rowgather),
    ("flat outputs", f_flat),
]:
    fj = jax.jit(f)
    out = fj(points)
    leaf = jax.tree_util.tree_leaves(out)[0]
    t0 = time.perf_counter()
    dt = timeit_chained(
        lambda z, pp: chain(z, jax.tree_util.tree_leaves(fj(pp))[0]),
        jnp.zeros(()), points, iters=20, warmup=3,
    )
    print(f"{name:20s} {dt*1e3:8.2f} ms  (compile+run1 {time.perf_counter()-t0:.1f}s)")

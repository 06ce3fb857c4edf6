"""Voxelization / pillarization as one jit'd XLA program (static shapes).

The TPU-native replacement for the reference's numba ``points_to_voxel``
(det3d/ops/point_cloud/point_cloud_ops.py:8-55,112-184) and ``VoxelGenerator``
(det3d/core/input/voxel_generator.py:19-46): points are hashed to grid cells with a
sort + segment scheme instead of a serial hash loop; the dense
``(max_voxels, max_points, D)`` buffers are then built with GATHERS over the sorted
order (only the per-voxel start positions are scattered — TPU scatters serialize).
Semantics match the reference kernel:

- out-of-range points dropped,
- at most ``max_points`` points kept per voxel (first-come in sort order),
- at most ``max_voxels`` voxels kept,
- coordinates returned as (z, y, x) integer indices (point_cloud_ops.py:48-51).

Batch-major variants keep a leading (B, ...) dim so pjit shards frames over the data
axis. ``VoxelConfig`` mirrors the reference's voxel_generator config block
(configs/.../*_with_vel.py:168-173).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    point_cloud_range: tuple  # (x0, y0, z0, x1, y1, z1)
    voxel_size: tuple  # (vx, vy, vz)
    max_points_per_voxel: int
    max_voxels: int

    @property
    def grid_size(self) -> np.ndarray:
        """(nx, ny, nz) — parity: voxel_generator.py grid_size computation."""
        pc = np.asarray(self.point_cloud_range)
        vs = np.asarray(self.voxel_size)
        return np.round((pc[3:] - pc[:3]) / vs).astype(np.int64)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _voxelize_impl(points, pc_range, voxel_size, grid_size, max_points, max_voxels):
    n, d = points.shape
    pc_range = jnp.asarray(pc_range, points.dtype)
    voxel_size = jnp.asarray(voxel_size, points.dtype)
    nx, ny, nz = grid_size

    # Grid indices (floor); validity mask includes NaN-padded points.
    rel = (points[:, :3] - pc_range[:3]) / voxel_size
    idx = jnp.floor(rel).astype(jnp.int32)  # (N, 3) x,y,z
    valid = (
        (idx[:, 0] >= 0) & (idx[:, 0] < nx)
        & (idx[:, 1] >= 0) & (idx[:, 1] < ny)
        & (idx[:, 2] >= 0) & (idx[:, 2] < nz)
        & jnp.isfinite(points[:, :3]).all(axis=1)
    )
    cell = idx[:, 2] * (ny * nx) + idx[:, 1] * nx + idx[:, 0]
    big = nz * ny * nx  # sentinel for invalid
    cell = jnp.where(valid, cell, big)

    # Stable sort by cell: point order within a cell is preserved (first-come).
    order = jnp.argsort(cell, stable=True)
    cell_s = cell[order]
    pts_s = points[order]
    valid_s = valid[order]

    # New-cell flags -> voxel ids; per-point rank within its cell.
    first = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
    ) & valid_s
    vox_id = jnp.cumsum(first) - 1  # (N,) voxel index per point
    pos = jnp.arange(n)

    # Gather-style buffer construction: scatter only the (small) per-voxel start
    # positions, then fill the (max_voxels, max_points, D) buffer with GATHERS of
    # the sorted points — TPU scatters serialize, gathers vectorize.
    keep_first = first & valid_s & (vox_id < max_voxels)
    start_slot = jnp.where(keep_first, vox_id, max_voxels)
    voxel_start = jnp.zeros((max_voxels + 1,), jnp.int32).at[start_slot].set(
        pos.astype(jnp.int32), mode="drop"
    )[:max_voxels]
    n_valid_pts = valid_s.sum()
    n_voxels = jnp.minimum(jnp.sum(first), max_voxels).astype(jnp.int32)
    vslots = jnp.arange(max_voxels)
    voxel_valid = vslots < n_voxels
    next_start = jnp.where(
        vslots + 1 < n_voxels, jnp.roll(voxel_start, -1), n_valid_pts
    )
    num_points = jnp.where(
        voxel_valid,
        jnp.minimum(next_start - voxel_start, max_points),
        0,
    ).astype(jnp.int32)

    src = voxel_start[:, None] + jnp.arange(max_points)[None, :]  # (V, P)
    in_voxel = jnp.arange(max_points)[None, :] < num_points[:, None]
    src = jnp.clip(src, 0, n - 1)
    voxels = jnp.where(
        in_voxel[..., None], pts_s[src], jnp.zeros((), points.dtype)
    )

    zyx = jnp.stack([idx[:, 2], idx[:, 1], idx[:, 0]], axis=1)[order]
    coords = jnp.where(
        voxel_valid[:, None], zyx[jnp.clip(voxel_start, 0, n - 1)], -1
    )
    return voxels, coords, num_points, n_voxels


def voxelize(points, cfg: VoxelConfig):
    """points (N, D) (NaN rows = padding) ->
    (voxels (V, P, D), coords (V, 3) zyx, num_points (V,), n_voxels scalar)."""
    return _voxelize_impl(
        points,
        tuple(cfg.point_cloud_range),
        tuple(cfg.voxel_size),
        tuple(int(g) for g in cfg.grid_size),
        cfg.max_points_per_voxel,
        cfg.max_voxels,
    )


def voxelize_batch(points, cfg: VoxelConfig):
    """Batched voxelization: points (B, N, D) -> batch-major voxel buffers."""
    f = lambda p: voxelize(p, cfg)
    return jax.vmap(f)(points)


def pad_points(points: np.ndarray, n: int) -> np.ndarray:
    """Host-side: pad/truncate a point cloud to exactly n rows with NaN padding."""
    out = np.full((n, points.shape[1]), np.nan, points.dtype)
    m = min(n, points.shape[0])
    out[:m] = points[:m]
    return out

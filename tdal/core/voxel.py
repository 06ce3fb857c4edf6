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
    """Batched voxelization, (B, N, D) -> (B, V, P, D) etc.

    One FLAT stable sort over all B*N points (batch index folded into the sort key)
    carrying the point features as sort payload — measured 2.2x faster on v5e than
    per-sample argsort + row gather (row gathers move 128-lane tiles for 20-byte
    rows). Each voxel's points are then a CONTIGUOUS run of the sorted array, so the
    dense (V, P, D) buffer is built with batched dynamic-slices (slab gather,
    slice_sizes=(P, D)) instead of per-element gathers — 1.7x faster."""
    b, n, d = points.shape
    pc3 = jnp.asarray(pc_range[:3], points.dtype)
    vs3 = jnp.asarray(voxel_size, points.dtype)
    nx, ny, nz = grid_size
    big = nz * ny * nx  # sentinel cell for invalid points

    # Grid indices (floor); validity mask includes NaN-padded points.
    rel = (points[..., :3] - pc3) / vs3
    idx = jnp.floor(rel).astype(jnp.int32)  # (B, N, 3) x,y,z
    valid = (
        (idx[..., 0] >= 0) & (idx[..., 0] < nx)
        & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
        & (idx[..., 2] >= 0) & (idx[..., 2] < nz)
        & jnp.isfinite(points[..., :3]).all(axis=-1)
    )
    cell = idx[..., 2] * (ny * nx) + idx[..., 1] * nx + idx[..., 0]
    cell = jnp.where(valid, cell, big)

    # Flat stable sort: key = batch * (big+1) + cell, payload = the D features.
    # Keys of batch b are strictly below those of batch b+1, so the sorted array is
    # contiguous per batch and reshapes back to (B, N). Stability preserves
    # first-come point order within a cell (point_cloud_ops.py:48-51 semantics).
    key = (cell + jnp.int32(big + 1) * jnp.arange(b, dtype=jnp.int32)[:, None]).reshape(-1)
    ops = (key,) + tuple(points[..., i].reshape(-1) for i in range(d))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    cell_s = out[0].reshape(b, n) - jnp.int32(big + 1) * jnp.arange(b, dtype=jnp.int32)[:, None]
    pts_s = jnp.stack(out[1:], axis=-1).reshape(b, n, d)
    valid_s = cell_s < big

    def finish(cell_s, pts_s, valid_s):
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
        ) & valid_s
        vox_id = jnp.cumsum(first) - 1  # voxel index per point
        pos = jnp.arange(n, dtype=jnp.int32)

        # Scatter only the (small) per-voxel start positions; everything else is
        # gathers/slices — large TPU scatters serialize.
        keep_first = first & (vox_id < max_voxels)
        start_slot = jnp.where(keep_first, vox_id, max_voxels)
        voxel_start = jnp.zeros((max_voxels + 1,), jnp.int32).at[start_slot].set(
            pos, mode="drop"
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

        # Slab fill: each voxel is pts_s[start : start+P]; pad P rows so the
        # dynamic-slice never clamps (which would shift the slab contents).
        pts_pad = jnp.concatenate(
            [pts_s, jnp.zeros((max_points, d), pts_s.dtype)], axis=0
        )
        slabs = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pts_pad, (s, 0), (max_points, d))
        )(voxel_start)
        in_voxel = jnp.arange(max_points)[None, :] < num_points[:, None]
        voxels = jnp.where(in_voxel[..., None], slabs, jnp.zeros((), pts_s.dtype))

        # coords (z, y, x) recomputed from each voxel's first point — identical
        # float ops on identical values as the pre-sort idx computation.
        fp = voxels[:, 0, :3]
        fidx = jnp.floor((fp - pc3) / vs3).astype(jnp.int32)
        coords = jnp.where(
            voxel_valid[:, None],
            jnp.stack([fidx[:, 2], fidx[:, 1], fidx[:, 0]], axis=1),
            -1,
        )
        return voxels, coords, num_points, n_voxels

    return jax.vmap(finish)(cell_s, pts_s, valid_s)


def voxelize(points, cfg: VoxelConfig):
    """points (N, D) (NaN rows = padding) ->
    (voxels (V, P, D), coords (V, 3) zyx, num_points (V,), n_voxels scalar)."""
    v, c, np_, nv = voxelize_batch(points[None], cfg)
    return v[0], c[0], np_[0], nv[0]


def voxelize_batch(points, cfg: VoxelConfig):
    """Batched voxelization: points (B, N, D) -> batch-major voxel buffers."""
    b = points.shape[0]
    grid = tuple(int(g) for g in cfg.grid_size)
    big = grid[0] * grid[1] * grid[2]
    if b * (big + 1) >= 2**31:
        if big + 1 >= 2**31:
            # A single sample already overflows the int32 sort key: the
            # per-sample fallback below would recurse forever (voxelize calls
            # voxelize_batch with b=1). No supported config has >=2^31 cells.
            raise ValueError(
                f"grid {grid} has {big} cells; >=2^31 overflows the int32 "
                "flat-sort key even per-sample. Use a coarser voxel grid."
            )
        # int32 sort key would overflow: fall back to per-sample flat sorts.
        f = lambda p: voxelize(p, cfg)
        outs = [f(points[i]) for i in range(b)]
        return tuple(jnp.stack([o[j] for o in outs]) for j in range(4))
    # A frame can never produce more voxels than it has input points, so clamp
    # the static voxel buffer to the (static) padded point count. The reference
    # configs set test-time max_voxel_num=400000 (e.g. two-sweep voxelnet
    # *_with_vel.py:172) because a dynamic-shape CUDA runtime only pays for
    # actual voxels; our static buffers pay for the whole cap — every sparse op
    # downstream scales with V (measured: the production two-stage predict
    # dropped ~2x when the 400k buffer stopped exceeding the 180k point pad).
    return _voxelize_impl(
        points,
        tuple(cfg.point_cloud_range),
        tuple(cfg.voxel_size),
        grid,
        cfg.max_points_per_voxel,
        min(cfg.max_voxels, points.shape[1]),
    )


def pad_points(points: np.ndarray, n: int) -> np.ndarray:
    """Host-side: pad/truncate a point cloud to exactly n rows with NaN padding."""
    out = np.full((n, points.shape[1]), np.nan, points.dtype)
    m = min(n, points.shape[0])
    out[:m] = points[:m]
    return out

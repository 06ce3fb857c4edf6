"""Point-cloud readers: pillar feature net + BEV scatter, voxel mean encoder.

Capability parity with reference ``det3d/models/readers/``:
- ``PillarFeatureNet``      ~ pillar_encoder.PillarFeatureNet (:59-153): decorate each
  pillar's points with cluster-mean and pillar-center offsets (+5 ch), run PFN layers
  (Linear -> BN -> ReLU -> max over points), masked for padding.
- ``scatter_to_bev``        ~ pillar_encoder.PointPillarsScatter (:156-209), as ONE
  batched scatter instead of a per-sample Python loop.
- ``VoxelMeanEncoder``      ~ voxel_encoder.VoxelFeatureExtractorV3 (:9-24): mean of
  points per voxel.

TPU-native layout: everything is batch-major (B, V, P, C) — frames shard over the
data axis; the PFN linear is one big (B*V*P, Cin)@(Cin, Cout) MXU matmul.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdal.models.layers import MaskedBatchNorm


class PFNLayer(nn.Module):
    """Linear(no bias) + masked BN + ReLU + per-pillar max; optionally concat the max
    back per point (non-last layers). Parity: pillar_encoder.PFNLayer (:15-55)."""

    out_features: int
    last: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, point_mask, train: bool = False):
        units = self.out_features if self.last else self.out_features // 2
        x = nn.Dense(units, use_bias=False, dtype=self.dtype)(x)
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask=point_mask, train=train)
        x = nn.relu(x)
        x = x * point_mask[..., None]
        x_max = jnp.max(x, axis=-2, keepdims=True)  # (..., 1, units)
        if self.last:
            return x_max[..., 0, :]  # (..., units)
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1
        )


class PillarFeatureNet(nn.Module):
    """voxels (B, V, P, D), num_points (B, V), coords (B, V, 3 zyx) -> (B, V, C)."""

    num_filters: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.2, 0.2, 4.0)
    pc_range: Sequence[float] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    with_distance: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        b, v, p, d = voxels.shape
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        # Padding validity masks.
        point_mask = (
            jnp.arange(p)[None, None, :] < num_points[..., None]
        ).astype(voxels.dtype)  # (B, V, P)
        voxels = voxels * point_mask[..., None]

        points_mean = voxels[..., :3].sum(axis=-2, keepdims=True) / denom[..., None]
        f_cluster = voxels[..., :3] - points_mean

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_off = vx / 2.0 + self.pc_range[0]
        y_off = vy / 2.0 + self.pc_range[1]
        cx = coords[..., 2].astype(voxels.dtype) * vx + x_off  # coords are (z, y, x)
        cy = coords[..., 1].astype(voxels.dtype) * vy + y_off
        f_center = jnp.stack(
            [voxels[..., 0] - cx[..., None], voxels[..., 1] - cy[..., None]], axis=-1
        )

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * point_mask[..., None]

        for i, f in enumerate(self.num_filters):
            x = PFNLayer(f, last=(i == len(self.num_filters) - 1), dtype=self.dtype)(
                x, point_mask, train
            )
        return x  # (B, V, C)


class VoxelMeanEncoder(nn.Module):
    """Mean of the points in each voxel. Parity: VoxelFeatureExtractorV3 (:9-24)."""

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        p = voxels.shape[-2]
        point_mask = (
            jnp.arange(p)[None, None, :] < num_points[..., None]
        ).astype(voxels.dtype)
        s = (voxels * point_mask[..., None]).sum(axis=-2)
        return s / jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]


def scatter_to_bev(features, coords, valid, ny: int, nx: int):
    """Scatter pillar features to a dense BEV canvas.

    features (B, V, C), coords (B, V, 3 zyx), valid (B, V) bool ->
    canvas (B, ny, nx, C). One vectorized scatter per batch (vs the reference's
    per-sample Python loop, pillar_encoder.py:180-205). NHWC for TPU convs."""
    b, v, c = features.shape
    lin = coords[..., 1] * nx + coords[..., 2]  # y * nx + x
    lin = jnp.where(valid, lin, ny * nx)  # dropped
    canvas = jnp.zeros((b, ny * nx + 1, c), features.dtype)
    # voxelize dedups cells, so live indices are UNIQUE (invalid rows all
    # alias the drop slot, which .set may overwrite in any order — same
    # result). Declaring uniqueness lets XLA vectorize the row scatter.
    canvas = jax.vmap(
        lambda cv, i, f: cv.at[i].set(f, mode="drop", unique_indices=True)
    )(canvas, lin, features)
    return canvas[:, : ny * nx].reshape(b, ny, nx, c)

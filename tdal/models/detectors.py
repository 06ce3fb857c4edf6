"""Detectors: CenterPoint with PointPillars (dense-BEV) and VoxelNet backbones.

Capability parity with reference ``det3d/models/detectors/``:
- ``PointPillars``  ~ detectors/point_pillars.py:6-90 — reader -> scatter -> RPN ->
  CenterHead. TPU-first: voxelization runs in-graph (tdal.core.voxel), the pillar
  scatter is one batched XLA scatter, all convs NHWC.
- ``VoxelNet``      ~ detectors/voxelnet.py:33-91 — voxel mean encoder -> 3D middle
  backbone -> RPN -> CenterHead (backbone provided by tdal.models.scn).

Both take raw padded points (B, N, D) so a single jit captures the whole forward.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdal.core.voxel import VoxelConfig, voxelize_batch
from tdal.models.center_head import CenterHead
from tdal.models.readers import PillarFeatureNet, VoxelMeanEncoder, scatter_to_bev
from tdal.models.rpn import RPN


def _conv_backend(bev_sharding):
    """XLA convs when the BEV stack is spatially sharded (the SPMD partitioner
    cannot split an opaque pallas_call); Pallas train kernels otherwise."""
    import contextlib

    from tdal.ops.pallas_conv import xla_only

    return xla_only() if bev_sharding is not None else contextlib.nullcontext()


class PointPillars(nn.Module):
    voxel_cfg: VoxelConfig
    tasks: Sequence[dict]
    num_filters: Sequence[int] = (64, 64)
    rpn_layer_nums: Sequence[int] = (3, 5, 5)
    rpn_ds_strides: Sequence[int] = (1, 2, 2)
    rpn_ds_filters: Sequence[int] = (64, 128, 256)
    rpn_us_strides: Sequence[int] = (1, 2, 4)
    rpn_us_filters: Sequence[int] = (128, 128, 128)
    with_velocity: bool = False
    # Reference center_head.py:181: optional deformable-conv head branches.
    dcn_head: bool = False
    # Optional NamedSharding for the BEV canvas (parallel.mesh.spatial_sharding):
    # spatially partitions the dense conv stack across the mesh via XLA SPMD
    # (automatic halo exchange). None = sharding follows the inputs (pure DP).
    bev_sharding: Any = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False, return_feature: bool = False):
        voxels, coords, num_points, n_vox = voxelize_batch(points, self.voxel_cfg)
        feats = PillarFeatureNet(
            num_filters=tuple(self.num_filters),
            voxel_size=tuple(self.voxel_cfg.voxel_size),
            pc_range=tuple(self.voxel_cfg.point_cloud_range),
            dtype=self.dtype,
        )(voxels, num_points, coords, train)
        v = feats.shape[1]
        valid = jnp.arange(v)[None, :] < n_vox[:, None]
        nx, ny, _ = (int(g) for g in self.voxel_cfg.grid_size)
        canvas = scatter_to_bev(
            feats * valid[..., None], coords, valid, ny, nx
        )
        if self.bev_sharding is not None:
            canvas = jax.lax.with_sharding_constraint(canvas, self.bev_sharding)
        with _conv_backend(self.bev_sharding):
            x = RPN(
                layer_nums=tuple(self.rpn_layer_nums),
                ds_layer_strides=tuple(self.rpn_ds_strides),
                ds_num_filters=tuple(self.rpn_ds_filters),
                us_layer_strides=tuple(self.rpn_us_strides),
                us_num_filters=tuple(self.rpn_us_filters),
                dtype=self.dtype,
            )(canvas, train)
            common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)}
            if self.with_velocity:
                common["vel"] = (2, 2)
            preds = CenterHead(
                tasks=tuple(self.tasks), common_heads=common,
                dcn_head=self.dcn_head, dtype=self.dtype,
            )(x, train)
        if return_feature:
            return preds, x
        return preds

    @property
    def out_size_factor(self) -> int:
        import numpy as np

        f = int(np.prod(self.rpn_ds_strides))
        return max(f // int(self.rpn_us_strides[-1]), 1)

    @property
    def num_classes(self):
        return [len(t["class_names"]) for t in self.tasks]


class VoxelNet(nn.Module):
    """Voxel mean encoder -> sparse-style 3D middle backbone -> RPN -> CenterHead.

    Parity: detectors/voxelnet.py with backbones/scn.SpMiddleResNetFHD; the middle
    backbone is tdal.models.scn.MiddleBackbone (masked dense 3D convs on TPU)."""

    voxel_cfg: VoxelConfig
    tasks: Sequence[dict]
    rpn_layer_nums: Sequence[int] = (5, 5)
    rpn_ds_strides: Sequence[int] = (1, 2)
    rpn_ds_filters: Sequence[int] = (128, 256)
    rpn_us_strides: Sequence[int] = (1, 2)
    rpn_us_filters: Sequence[int] = (256, 256)
    with_velocity: bool = False
    # Reference center_head.py:181: optional deformable-conv head branches.
    dcn_head: bool = False
    # None = auto: gather-based sparse submanifold backbone when the dense grid
    # would be infeasible (> 2^24 cells), masked dense 3D convs otherwise.
    sparse_middle: bool = None
    # Optional NamedSharding for the middle backbone's BEV output (see
    # PointPillars.bev_sharding): spatially partitions the RPN + heads.
    bev_sharding: Any = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False, return_feature: bool = False):
        voxels, coords, num_points, n_vox = voxelize_batch(points, self.voxel_cfg)
        feats = VoxelMeanEncoder()(voxels, num_points)
        v = feats.shape[1]
        valid = jnp.arange(v)[None, :] < n_vox[:, None]
        nx, ny, nz = (int(g) for g in self.voxel_cfg.grid_size)
        use_sparse = (
            self.sparse_middle
            if self.sparse_middle is not None
            else (nz * ny * nx > 2**24)
        )
        if use_sparse:
            from tdal.models.scn_sparse import SparseMiddleBackbone

            bev = SparseMiddleBackbone(grid_size=(nz, ny, nx), dtype=self.dtype)(
                feats * valid[..., None], coords, valid, train
            )
        else:
            from tdal.models.scn import MiddleBackbone

            bev = MiddleBackbone(grid_size=(nz, ny, nx), dtype=self.dtype)(
                feats * valid[..., None], coords, valid, train
            )
        if self.bev_sharding is not None:
            bev = jax.lax.with_sharding_constraint(bev, self.bev_sharding)
        with _conv_backend(self.bev_sharding):
            x = RPN(
                layer_nums=tuple(self.rpn_layer_nums),
                ds_layer_strides=tuple(self.rpn_ds_strides),
                ds_num_filters=tuple(self.rpn_ds_filters),
                us_layer_strides=tuple(self.rpn_us_strides),
                us_num_filters=tuple(self.rpn_us_filters),
                dtype=self.dtype,
            )(bev, train)
            common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)}
            if self.with_velocity:
                common["vel"] = (2, 2)
            preds = CenterHead(
                tasks=tuple(self.tasks), common_heads=common,
                dcn_head=self.dcn_head, dtype=self.dtype,
            )(x, train)
        if return_feature:
            return preds, x
        return preds

    @property
    def out_size_factor(self) -> int:
        import numpy as np

        # middle backbone downsamples BEV by 8 (scn.py strides), RPN net factor on top
        f = 8 * int(np.prod(self.rpn_ds_strides))
        return max(f // int(self.rpn_us_strides[-1]), 1)

    @property
    def num_classes(self):
        return [len(t["class_names"]) for t in self.tasks]

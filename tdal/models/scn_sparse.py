"""Sparse submanifold VoxelNet middle backbone — the full-resolution spconv path.

Capability parity with reference ``SpMiddleResNetFHD`` (det3d/models/backbones/
scn.py:83-177, built on the external CUDA spconv library): SubM input conv ->
4 stages (16 -> 32 -> 64 -> 128) with stride-2 sparse convs + residual submanifold
SparseBasicBlocks -> extra z-stride conv -> dense BEV with z folded into channels.

Built on tdal.ops.sparse_conv (dense grid->slot lookup table gather taps + MXU
contraction), so it
runs at the reference's full (41, 1504, 1504) grid where dense 3D conv is infeasible
(tdal/models/scn.MiddleBackbone remains the dense-grid alternative for small grids).
BatchNorm uses MaskedBatchNorm so padded voxel slots don't pollute statistics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdal.models.layers import MaskedBatchNorm
from tdal.ops.sparse_conv import (
    build_bitmap_table,
    down2_grid,
    downz_grid,
    scatter_dense_bev,
    sort_voxels,
    sparse_conv3d_down2,
    sparse_conv3d_downz,
    subm_conv3d,
    subm_neighbors,
)


class SparseMiddleBackbone(nn.Module):
    grid_size: Tuple[int, int, int]  # (nz, ny, nx)
    channels: Sequence[int] = (16, 32, 64, 128)
    voxel_caps: Sequence[int] = None  # per-downsample V buffer sizes
    # Reference scn.py:104-137: every stage carries TWO SparseBasicBlocks.
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.float32

    def _bn_relu(self, x, valid, train):
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask=valid.astype(x.dtype), train=train)
        return nn.relu(x) * valid[..., None]

    def _subm(self, name, cin, cout):
        return self.param(
            name, nn.initializers.lecun_normal(), (27, cin, cout)
        )

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = False):
        """feats (B, V, Cin), coords (B, V, 3) zyx, valid (B, V) -> BEV NHWC."""
        b, v, cin = feats.shape
        grid0 = tuple(int(g) for g in self.grid_size)
        caps = self.voxel_caps or (v, v // 2, v // 4, v // 8)
        chans = list(self.channels)

        # ---- weights (allocated once; vmapped apply over batch) ----
        w_in = self._subm("w_in", cin, chans[0])
        blocks, downs = [], []
        for i, c in enumerate(chans):
            blocks.append(
                [
                    (
                        self._subm(f"w_blk{i}_{j}_a", c, c),
                        self._subm(f"w_blk{i}_{j}_b", c, c),
                    )
                    for j in range(self.blocks_per_stage)
                ]
            )
            if i + 1 < len(chans):
                downs.append(self._subm(f"w_down{i}", c, chans[i + 1]))
        w_z = self.param(
            "w_z", nn.initializers.lecun_normal(), (3, chans[-1], chans[-1])
        )

        def vm(fn, *args):
            return jax.vmap(fn)(*args)

        # ---- input SubM conv (neighbor table shared per resolution) ----
        coords, feats, valid, keys = vm(
            lambda c, f, m: sort_voxels(c, f, m, grid0), coords, feats, valid
        )
        # one bitmap table per resolution level, shared by the neighbor pass
        # and the level's strided conv
        table = vm(lambda k, m: build_bitmap_table(k, m, grid0), keys, valid)
        nbrs = vm(
            lambda c, m, k, t: subm_neighbors(c, m, k, grid0, table=t),
            coords, valid, keys, table,
        )
        x = vm(
            lambda c, f, m, k, nb: subm_conv3d(c, f, m, k, grid0, w_in, neighbors=nb),
            coords, feats, valid, keys, nbrs,
        )
        x = self._bn_relu(x, valid, train)
        grid = grid0

        for i, c in enumerate(chans):
            # TWO residual SparseBasicBlocks per stage (scn.py:37-80,104-137)
            g = grid
            for wa, wb in blocks[i]:
                y = vm(
                    lambda cc, ff, mm, kk, nb: subm_conv3d(
                        cc, ff, mm, kk, g, wa, neighbors=nb
                    ),
                    coords, x, valid, keys, nbrs,
                )
                y = self._bn_relu(y, valid, train)
                y = vm(
                    lambda cc, ff, mm, kk, nb: subm_conv3d(
                        cc, ff, mm, kk, g, wb, neighbors=nb
                    ),
                    coords, y, valid, keys, nbrs,
                )
                y = MaskedBatchNorm(dtype=self.dtype)(
                    y, mask=valid.astype(y.dtype), train=train
                )
                x = nn.relu(y + x) * valid[..., None]

            if i + 1 < len(chans):
                cap = int(caps[i + 1]) if i + 1 < len(caps) else v
                coords, x, valid, keys = jax.vmap(
                    lambda cc, ff, mm, kk, tt: sparse_conv3d_down2(
                        cc, ff, mm, kk, g, downs[i], cap, table=tt
                    )
                )(coords, x, valid, keys, table)
                grid = down2_grid(g)
                g2 = grid
                table = jax.vmap(lambda k, m: build_bitmap_table(k, m, g2))(
                    keys, valid
                )
                nbrs = jax.vmap(
                    lambda c, m, k, t: subm_neighbors(c, m, k, g2, table=t)
                )(coords, valid, keys, table)
                x = self._bn_relu(x, valid, train)

        # ---- final z-compression ----
        g = grid
        cap = int(caps[-1]) if len(caps) >= len(chans) else v
        coords, x, valid, keys = jax.vmap(
            lambda cc, ff, mm, kk, tt: sparse_conv3d_downz(
                cc, ff, mm, kk, g, w_z, cap, table=tt
            )
        )(coords, x, valid, keys, table)
        grid = downz_grid(g)
        x = self._bn_relu(x, valid, train)

        g = grid
        return jax.vmap(lambda cc, ff, mm: scatter_dense_bev(cc, ff, mm, g))(
            coords, x, valid
        )

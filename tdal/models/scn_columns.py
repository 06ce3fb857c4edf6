"""Column-dense VoxelNet middle backbone — the fast full-grid spconv path.

Same architecture and parameter shapes as tdal.models.scn_sparse.
SparseMiddleBackbone (reference SpMiddleResNetFHD, det3d/models/backbones/
scn.py:83-177): SubM input conv -> 4 stages (16->32->64->128) of residual
SparseBasicBlocks with stride-2 sparse downsamples -> z-stride conv -> dense
BEV with z folded into channels. The difference is purely representational:
active BEV columns stored z-dense (tdal.ops.column_sparse) so every HBM fetch
moves a whole ~1.3KB column instead of a 32B voxel row — see
benchmarks/RESULTS.md for the measured gather-granularity analysis.

Submanifold semantics are exact: unoccupied cells hold zeros, every conv's
output is masked by occupancy, and the equivalence against the gather-based
backbone is asserted in tests/test_column_sparse.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdal.models.layers import MaskedBatchNorm
from tdal.ops.column_sparse import (
    column_neighbors,
    columns_to_bev,
    down2_conv_columns,
    downz_conv_columns,
    pack_columns,
    subm_conv_columns,
)


class ColumnMiddleBackbone(nn.Module):
    grid_size: Tuple[int, int, int]  # (nz, ny, nx)
    channels: Sequence[int] = (16, 32, 64, 128)
    column_caps: Sequence[int] = None  # per-resolution column buffer sizes
    # Reference scn.py:104-137: every stage carries TWO SparseBasicBlocks.
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.float32

    def _bn_relu(self, x, occ, valid, nz, train, residual=None):
        """BN over real channels (reshaped view), ReLU, occupancy re-mask."""
        c = x.shape[-1] // (nz + 2)
        xs = x.reshape(*x.shape[:-1], nz + 2, c)
        occ_h = jnp.pad(occ, [(0, 0)] * (occ.ndim - 1) + [(1, 1)])
        mask = occ_h & valid[..., None]
        y = MaskedBatchNorm(dtype=self.dtype)(
            xs, mask=mask.astype(xs.dtype), train=train
        )
        y = y.reshape(*x.shape)
        if residual is not None:
            y = y + residual
        y = nn.relu(y)
        flat_mask = jnp.repeat(mask.astype(y.dtype), c, axis=-1)
        return y * flat_mask

    def _subm(self, name, cin, cout):
        return self.param(name, nn.initializers.lecun_normal(), (27, cin, cout))

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = False):
        """feats (B, V, Cin), coords (B, V, 3) zyx, valid (B, V) -> BEV NHWC."""
        b, v, cin = feats.shape
        grid0 = tuple(int(g) for g in self.grid_size)
        caps = self.column_caps or (v, v // 2, v // 4, v // 8)
        chans = list(self.channels)

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

        feats = feats.astype(self.dtype)
        grid = grid0
        nz = grid0[0]
        cap0 = int(caps[0])
        col_key, col_feat, col_occ, col_valid, _ = jax.vmap(
            lambda c_, f_, m_: pack_columns(c_, f_, m_, grid0, cap0)
        )(coords, feats, valid)
        nbrs = jax.vmap(lambda k_, m_: column_neighbors(k_, m_, grid0))(
            col_key, col_valid
        )

        wc = w_in.astype(self.dtype)
        x = jax.vmap(
            lambda f_, o_, ni_, nf_: subm_conv_columns(f_, o_, ni_, nf_, wc, nz)
        )(col_feat, col_occ, *nbrs)
        x = self._bn_relu(x, col_occ, col_valid, nz, train)

        for i, c in enumerate(chans):
            g = grid
            nz_i = nz
            # TWO residual SparseBasicBlocks per stage (scn.py:37-80,104-137)
            for wa_p, wb_p in blocks[i]:
                wa = wa_p.astype(self.dtype)
                wb = wb_p.astype(self.dtype)
                y = jax.vmap(
                    lambda f_, o_, ni_, nf_: subm_conv_columns(f_, o_, ni_, nf_, wa, nz_i)
                )(x, col_occ, *nbrs)
                y = self._bn_relu(y, col_occ, col_valid, nz_i, train)
                y = jax.vmap(
                    lambda f_, o_, ni_, nf_: subm_conv_columns(f_, o_, ni_, nf_, wb, nz_i)
                )(y, col_occ, *nbrs)
                # residual add inside BN wrapper (scn.py:37-80 SparseBasicBlock)
                x = self._bn_relu(y, col_occ, col_valid, nz_i, train, residual=x)

            if i + 1 < len(chans):
                cap = int(caps[i + 1]) if i + 1 < len(caps) else v
                wd = downs[i].astype(self.dtype)
                col_key, x, col_occ, col_valid = jax.vmap(
                    lambda k_, f_, o_, m_: down2_conv_columns(
                        f_, o_, k_, m_, g, wd, cap
                    )
                )(col_key, x, col_occ, col_valid)
                grid = ((g[0] + 1) // 2, (g[1] + 1) // 2, (g[2] + 1) // 2)
                nz = grid[0]
                nbrs = jax.vmap(lambda k_, m_: column_neighbors(k_, m_, grid))(
                    col_key, col_valid
                )
                x = self._bn_relu(x, col_occ, col_valid, nz, train)

        wz = w_z.astype(self.dtype)
        nz_in = nz
        x, col_occ = jax.vmap(lambda f_, o_: downz_conv_columns(f_, o_, wz, nz_in))(
            x, col_occ
        )
        nz = (nz + 1) // 2
        x = self._bn_relu(x, col_occ, col_valid, nz, train)

        bev = jax.vmap(
            lambda k_, f_, m_: columns_to_bev(k_, f_, m_, grid, nz)
        )(col_key, x, col_valid)
        return bev

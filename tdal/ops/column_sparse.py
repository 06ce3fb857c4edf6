"""Column-dense sparse 3D convolution: the TPU-shaped spconv replacement.

Waymo voxel grids are quasi-2D (41 z-layers over a 1504^2 BEV); the gather-based
sparse conv (tdal.ops.sparse_conv) pays a >=512B HBM tile fetch for every 32B
neighbor row and every 4B lookup in a 371MB dense 3D table — measured 73ms per
neighbor pass + 25ms per conv at the full grid. This module stores the active
BEV COLUMNS densely along z:

    col_key  (Vc,)            linearized (y, x), sorted ascending, sentinel pad
    col_feat (Vc, (NZ+2)*C)   z-dense features with a permanent 1-cell z halo
    col_occ  (Vc, NZ)         per-cell occupancy (submanifold mask)

so every neighbor fetch moves a whole column (~1.3KB — HBM-granularity
efficient), the BEV neighbor table is ny*nx*4B (9MB, 40x smaller), and the
z-axis of the 3x3x3 kernel folds into a BANDED weight matrix: one
(Vc, (NZ+2)*Cin) @ ((NZ+2)*Cin, (NZ+2)*Cout) MXU matmul per BEV tap — no
z-shifts, no relayouts. Semantics are EXACTLY submanifold/sparse conv
(unoccupied cells hold zeros and outputs are masked by occupancy).

Capability parity: spconv SubMConv3d / SparseConv3d(stride 2) as used by the
reference SpMiddleResNetFHD (det3d/models/backbones/scn.py:83-177).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

OFFS9 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _halo(nz: int) -> int:
    return nz + 2


def pack_columns(coords, feats, valid, grid, col_cap: int):
    """Voxel buffers (V, 3) zyx / (V, C) / (V,) -> column representation.

    Returns (col_key (Vc,), col_feat (Vc, (NZ+2)*C), col_occ (Vc, NZ),
    col_valid (Vc,), n_cols)."""
    nz, ny, nx = (int(g) for g in grid)
    v, c = feats.shape
    big = ny * nx
    ckey = jnp.where(valid, coords[:, 1] * nx + coords[:, 2], big)
    order = jnp.argsort(ckey, stable=True)
    ck_s = ckey[order]
    z_s = coords[order, 0]
    f_s = feats[order]
    valid_s = ck_s < big
    first = jnp.concatenate([jnp.ones((1,), bool), ck_s[1:] != ck_s[:-1]]) & valid_s
    col_id = jnp.cumsum(first) - 1

    slot = jnp.where(first & (col_id < col_cap), col_id, col_cap)
    col_key = jnp.full((col_cap + 1,), big, jnp.int32).at[slot].set(
        ck_s.astype(jnp.int32), mode="drop"
    )[:col_cap]
    n_cols = jnp.minimum(first.sum(), col_cap)
    col_valid = jnp.arange(col_cap) < n_cols

    # scatter voxels into their (column, z) site; +1 z offset = the halo
    ok = valid_s & (col_id < col_cap)
    site = jnp.where(ok, col_id * _halo(nz) + (z_s + 1), col_cap * _halo(nz))
    flat = jnp.zeros((col_cap * _halo(nz) + 1, c), feats.dtype)
    flat = flat.at[site].set(f_s, mode="drop")[:-1]
    col_feat = flat.reshape(col_cap, _halo(nz) * c)
    occ_flat = jnp.zeros((col_cap * nz + 1,), bool)
    occ_site = jnp.where(ok, col_id * nz + z_s, col_cap * nz)
    col_occ = occ_flat.at[occ_site].set(True, mode="drop")[:-1].reshape(col_cap, nz)
    return col_key, col_feat, col_occ, col_valid, n_cols


def bev_table(col_key, col_valid, grid):
    """Dense BEV cell -> column slot table (ny*nx int32, -1 empty)."""
    _, ny, nx = (int(g) for g in grid)
    cap = col_key.shape[0]
    k = jnp.where(col_valid, col_key, ny * nx)
    table = jnp.full((ny * nx + 1,), -1, jnp.int32)
    table = table.at[k].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    return table[: ny * nx]


def column_neighbors(col_key, col_valid, grid, table=None):
    """3x3 BEV neighbor slots per column: (idx (Vc, 9), found (Vc, 9)).

    Shared by every submanifold conv at a resolution."""
    _, ny, nx = (int(g) for g in grid)
    if table is None:
        table = bev_table(col_key, col_valid, grid)
    y = col_key // nx
    x = col_key % nx
    idxs, founds = [], []
    for dy, dx in OFFS9:
        yy, xx = y + dy, x + dx
        ok = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & col_valid
        cell = jnp.where(ok, yy * nx + xx, 0)
        i = table[cell]
        founds.append((i >= 0) & ok)
        idxs.append(jnp.maximum(i, 0))
    return jnp.stack(idxs, 1), jnp.stack(founds, 1)


def z_band_matrix(w_taps, nz_in: int, nz_out: int, stride: int, dtype):
    """w_taps (3, Cin, Cout) -> banded ((nz_in+2)*Cin, (nz_out+2)*Cout).

    band[p*Cin+ci, (zo+1)*Cout+co] = w_taps[p - stride*zo, ci, co] when
    p - stride*zo in {0,1,2}; the output halo columns stay zero, so results are
    born with the same 1-cell z halo the inputs carry (input padded index p
    holds input z = p-1; output z zo reads inputs stride*zo + dz - 1)."""
    cin, cout = w_taps.shape[1], w_taps.shape[2]
    p = np.arange(nz_in + 2)
    zo = np.arange(nz_out)
    dz = p[:, None] - stride * zo[None, :]
    sel = (dz >= 0) & (dz < 3)  # (P, Zo)
    w_take = w_taps[np.clip(dz, 0, 2)]  # (P, Zo, Cin, Cout) via jnp take
    band = jnp.where(
        jnp.asarray(sel)[:, :, None, None], w_take, jnp.zeros((), w_taps.dtype)
    )
    band = band.transpose(0, 2, 1, 3).reshape((nz_in + 2) * cin, nz_out * cout)
    # add zero halo columns on the output side
    band = jnp.pad(band, ((0, 0), (cout, cout)))
    return band.astype(dtype)


def _occ_mask_lanes(col_occ, cout: int, dtype):
    """(Vc, NZ) occupancy -> (Vc, (NZ+2)*Cout) lane mask (halo lanes zero)."""
    m = jnp.repeat(col_occ.astype(dtype), cout, axis=1)
    return jnp.pad(m, ((0, 0), (cout, cout)))


def subm_conv_columns(col_feat, col_occ, nbr_idx, nbr_found, weights, nz: int):
    """Submanifold 3x3x3 conv on columns.

    weights (27, Cin, Cout) in sparse_conv._OFFSETS_3 order (dz slowest, dx
    fastest). Returns (Vc, (NZ+2)*Cout) with the z halo re-zeroed."""
    cin, cout = weights.shape[1], weights.shape[2]
    w = weights.reshape(3, 9, cin, cout)  # [dz, k9]
    acc = None
    for k, (dy, dx) in enumerate(OFFS9):
        band = z_band_matrix(w[:, k], nz, nz, 1, col_feat.dtype)
        nb = col_feat[nbr_idx[:, k]] * nbr_found[:, k, None].astype(col_feat.dtype)
        t = jax.lax.dot_general(
            nb, band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    out = acc.astype(col_feat.dtype) * _occ_mask_lanes(col_occ, cout, col_feat.dtype)
    return out


def down2_sites(col_key, col_valid, grid, cap_out: int):
    """Output columns of a k3/s2/p1 conv: dedup of each input column's (up to 4)
    receiving half-grid positions. Returns (col_key', col_valid', n')."""
    _, ny, nx = (int(g) for g in grid)
    ny2, nx2 = (ny + 1) // 2, (nx + 1) // 2
    y = col_key // nx
    x = col_key % nx
    big = ny2 * nx2
    cands = []
    for by in (0, 1):
        for bx in (0, 1):
            yy = (y + by) // 2
            xx = (x + bx) // 2
            ok = (yy < ny2) & (xx < nx2) & col_valid
            cands.append(jnp.where(ok, yy * nx2 + xx, big))
    ck = jnp.sort(jnp.concatenate(cands))
    first = jnp.concatenate([jnp.ones((1,), bool), ck[1:] != ck[:-1]]) & (ck < big)
    uid = jnp.cumsum(first) - 1
    slot = jnp.where(first & (uid < cap_out), uid, cap_out)
    out_key = jnp.full((cap_out + 1,), big, jnp.int32).at[slot].set(
        ck.astype(jnp.int32), mode="drop"
    )[:cap_out]
    n_out = jnp.minimum(first.sum(), cap_out)
    return out_key, jnp.arange(cap_out) < n_out, n_out


def down2_conv_columns(col_feat, col_occ, col_key, col_valid, grid, weights, cap_out: int):
    """k3/s2/p1 sparse conv (spconv SparseConv3d stride 2) on columns.

    Returns (col_key', col_feat' (Vc', (NZ'+2)*Cout), col_occ', col_valid',
    grid') where grid' halves every axis."""
    nz, ny, nx = (int(g) for g in grid)
    nz2, ny2, nx2 = (nz + 1) // 2, (ny + 1) // 2, (nx + 1) // 2
    cin, cout = weights.shape[1], weights.shape[2]
    w = weights.reshape(3, 9, cin, cout)

    out_key, out_valid, _ = down2_sites(col_key, col_valid, grid, cap_out)
    table = bev_table(col_key, col_valid, grid)
    yo = out_key // nx2
    xo = out_key % nx2

    acc = None
    occ_any = None
    occ_f = col_occ.astype(col_feat.dtype)
    for k, (dy, dx) in enumerate(OFFS9):
        yy = 2 * yo + dy
        xx = 2 * xo + dx
        ok = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & out_valid
        cell = jnp.where(ok, yy * nx + xx, 0)
        idx = table[cell]
        found = ((idx >= 0) & ok).astype(col_feat.dtype)
        idx = jnp.maximum(idx, 0)
        nb = col_feat[idx] * found[:, None]
        band = z_band_matrix(w[:, k], nz, nz2, 2, col_feat.dtype)
        t = jax.lax.dot_general(
            nb, band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
        # output occupancy: any contributing input cell occupied
        ob = z_band_matrix(
            jnp.ones((3, 1, 1), col_feat.dtype), nz, nz2, 2, col_feat.dtype
        )
        o = jax.lax.dot_general(
            jnp.pad(occ_f[idx] * found[:, None], ((0, 0), (1, 1))),
            ob, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        occ_any = o if occ_any is None else occ_any + o
    out_occ = occ_any[:, 1:-1] > 0  # strip halo lanes (Cout=1 for the occ band)
    out = acc.astype(col_feat.dtype) * _occ_mask_lanes(out_occ, cout, col_feat.dtype)
    # the output grid is the static down2_grid of `grid`; callers compute it
    return out_key, out, out_occ, out_valid


def downz_conv_columns(col_feat, col_occ, weights, nz: int):
    """(3,1,1) kernel, stride (2,1,1) conv — the final z-compression
    (scn.py:139-144). Columns/BEV unchanged; z halves."""
    nz2 = (nz + 1) // 2
    cin, cout = weights.shape[-2], weights.shape[-1]
    band = z_band_matrix(weights.reshape(3, cin, cout), nz, nz2, 2, col_feat.dtype)
    out = jax.lax.dot_general(
        col_feat, band, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ob = z_band_matrix(jnp.ones((3, 1, 1), col_feat.dtype), nz, nz2, 2, col_feat.dtype)
    occ = jax.lax.dot_general(
        jnp.pad(col_occ.astype(col_feat.dtype), ((0, 0), (1, 1))), ob,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_occ = occ[:, 1:-1] > 0
    out = out.astype(col_feat.dtype) * _occ_mask_lanes(out_occ, cout, col_feat.dtype)
    return out, out_occ


def columns_to_bev(col_key, col_feat, col_valid, grid, nz: int):
    """Columns -> dense BEV (ny, nx, NZ*C): spconv .dense() + z-fold
    (scn.py:170-176 parity; z-major channel order matches scatter_dense_bev)."""
    _, ny, nx = (int(g) for g in grid)
    c = col_feat.shape[1] // (nz + 2)
    body = col_feat[:, c:-c]  # strip the z halo -> (Vc, NZ*C), z-major
    lin = jnp.where(col_valid, col_key, ny * nx)
    dense = jnp.zeros((ny * nx + 1, nz * c), body.dtype)
    dense = dense.at[lin].set(body, mode="drop")[: ny * nx]
    return dense.reshape(ny, nx, nz * c)

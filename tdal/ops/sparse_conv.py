"""Sparse 3D convolution on TPU: gather-based submanifold + strided sparse conv.

The spconv-equivalent (SURVEY.md §7 hard part #1). The reference's VoxelNet backbone
needs sparse 3D convs over ~180k active voxels in a (41, 1504, 1504) grid — dense 3D
is infeasible at that resolution. Representation here: per sample, fixed-size buffers

    coords (V, 3) int32 zyx, feats (V, C), valid (V,) bool

sorted by linearized key. Neighbor lookup is O(1) through a dense grid->slot table
(one scatter per voxel set, one gather per tap — measured ~10x faster than the
searchsorted binary search whose 16 dependent gather steps dominated the backbone);
the 27 taps contract as a single (V, 27*Cin) x (27*Cin, Cout) MXU matmul. Table
memory is grid_cells * 4B (371MB at the full Waymo 41x1504x1504 grid — fits HBM).

- ``subm_conv3d``: submanifold conv (output sites == input sites; spconv SubMConv3d).
- ``sparse_conv3d_down2``: kernel-3 stride-2 pad-1 sparse conv (spconv SparseConv3d):
  output sites are the union of each input's contributing output positions
  (up to 2 per axis), deduplicated into a fixed V_out buffer.
- ``scatter_dense_bev``: final `.dense()` + z-fold (scn.py:170-176 parity).

Everything is jit/vmap-friendly with static shapes; batch via vmap.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _linearize(coords, grid):
    nz, ny, nx = grid
    return coords[:, 0] * (ny * nx) + coords[:, 1] * nx + coords[:, 2]


def _in_grid(coords, grid):
    nz, ny, nx = grid
    return (
        (coords[:, 0] >= 0) & (coords[:, 0] < nz)
        & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
        & (coords[:, 2] >= 0) & (coords[:, 2] < nx)
    )


def sort_voxels(coords, feats, valid, grid):
    """Sort the voxel buffers by linearized key (invalid rows last).

    Returns (coords, feats, valid, keys) — the canonical layout every sparse op
    expects."""
    keys = jnp.where(valid, _linearize(coords, grid), jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys)
    return coords[order], feats[order], valid[order], keys[order]


_OFFSETS_3 = np.stack(
    np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), np.arange(-1, 2), indexing="ij"),
    axis=-1,
).reshape(27, 3)


def build_key_table(keys, valid, grid):
    """Dense grid-cell -> voxel-slot lookup table (int32, -1 = empty).

    One 45k-row scatter per voxel set replaces a 16-step binary search per tap."""
    n_cells = int(grid[0]) * int(grid[1]) * int(grid[2])
    v = keys.shape[0]
    slot_keys = jnp.where(valid, keys, n_cells)
    table = jnp.full((n_cells + 1,), -1, jnp.int32)
    table = table.at[slot_keys].set(
        jnp.arange(v, dtype=jnp.int32), mode="drop"
    )
    return table[:n_cells]


def _lookup(table, tap_coords, grid):
    """tap_coords (K, S, 3) -> (idx (K*S,), found (K*S,)) via the dense table."""
    k, n_sites = tap_coords.shape[0], tap_coords.shape[1]
    flat = tap_coords.reshape(k * n_sites, 3)
    ok = _in_grid(flat, grid)
    nkey = jnp.where(ok, _linearize(flat, grid), 0)
    idx = table[nkey]
    found = (idx >= 0) & ok
    return jnp.maximum(idx, 0), found


def _gather_taps(coords, feats, valid, keys, grid, tap_coords, table=None):
    """For each voxel and each tap offset, gather the neighbor's features (zeros when
    absent). tap_coords (K, V, 3) absolute coords per tap. Returns (V, K, C)."""
    k, n_sites = tap_coords.shape[0], tap_coords.shape[1]
    if table is None:
        table = build_key_table(keys, jnp.ones(keys.shape[0], bool), grid)
    idx, found = _lookup(table, tap_coords, grid)
    gathered = feats[idx] * found[:, None]
    return gathered.reshape(k, n_sites, -1).transpose(1, 0, 2)  # (sites, K, C)


def subm_neighbors(coords, valid, keys, grid, table=None):
    """Precompute the 3x3x3 neighbor table for a voxel set: (idx (V, 27),
    found (V, 27)). Every submanifold conv at the same resolution reuses this."""
    taps = coords[None, :, :] + jnp.asarray(_OFFSETS_3, coords.dtype)[:, None, :]
    k, n_sites = taps.shape[0], taps.shape[1]
    if table is None:
        table = build_key_table(keys, valid, grid)
    idx, found = _lookup(table, taps, grid)
    return (
        idx.reshape(k, n_sites).T,  # (V, 27)
        found.reshape(k, n_sites).T,
    )


def subm_conv3d(coords, feats, valid, keys, grid, weights, bias=None, neighbors=None):
    """Submanifold 3x3x3 conv: out[i] = sum_k W_k @ feat[neighbor_k(i)].

    weights (27, Cin, Cout). Buffers must be sort_voxels-canonical. Pass
    ``neighbors = subm_neighbors(...)`` to amortize the lookup across convs."""
    if neighbors is None:
        neighbors = subm_neighbors(coords, valid, keys, grid)
    idx, found = neighbors
    gathered = feats[idx] * found[..., None]  # (V, 27, C)
    vN, kN, cin = gathered.shape
    cout = weights.shape[-1]
    out = gathered.reshape(vN, kN * cin) @ weights.reshape(kN * cin, cout)
    if bias is not None:
        out = out + bias
    return out * valid[:, None]


def downsample_sites(coords, valid, grid, v_out: int):
    """Output sites of a k3/s2/p1 sparse conv: dedup of each input's (up to 2 per
    axis) receiving output positions, packed into a fixed (v_out, 3) buffer.

    Returns (out_coords, out_valid, out_keys, n_out) in sorted order."""
    nz, ny, nx = grid
    out_grid = ((nz + 1) // 2, (ny + 1) // 2, (nx + 1) // 2)
    # output o receives input i iff 2o-1 <= i <= 2o+1  =>  o in
    # [ceil((i-1)/2), floor((i+1)/2)] = {i//2, (i+1)//2} per axis
    # (a single value when i is even).
    lo = coords // 2
    hi = (coords + 1) // 2
    cands = []
    for bz in (0, 1):
        for by in (0, 1):
            for bx in (0, 1):
                sel = jnp.stack(
                    [
                        jnp.where(bz, hi[:, 0], lo[:, 0]),
                        jnp.where(by, hi[:, 1], lo[:, 1]),
                        jnp.where(bx, hi[:, 2], lo[:, 2]),
                    ],
                    axis=1,
                )
                cands.append(sel)
    cand = jnp.concatenate(cands, axis=0)  # (8V, 3)
    ok = _in_grid(cand, out_grid) & jnp.tile(valid, 8)
    ckey = jnp.where(ok, _linearize(cand, out_grid), jnp.iinfo(jnp.int32).max)
    skey = jnp.sort(ckey)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first &= skey < jnp.iinfo(jnp.int32).max
    uid = jnp.cumsum(first) - 1
    slot = jnp.where(first & (uid < v_out), uid, v_out)
    out_keys = jnp.full((v_out + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    out_keys = out_keys.at[slot].set(skey.astype(jnp.int32), mode="drop")[:v_out]
    n_out = jnp.minimum(first.sum(), v_out)
    out_valid = jnp.arange(v_out) < n_out
    oz = out_keys // (out_grid[1] * out_grid[2])
    rem = out_keys % (out_grid[1] * out_grid[2])
    out_coords = jnp.stack([oz, rem // out_grid[2], rem % out_grid[2]], axis=1)
    out_coords = jnp.where(out_valid[:, None], out_coords, 0)
    return out_coords, out_valid, jnp.where(out_valid, out_keys, jnp.iinfo(jnp.int32).max), n_out


def sparse_conv3d_down2(coords, feats, valid, keys, grid, weights, v_out: int, bias=None):
    """k3/s2/p1 sparse conv (spconv SparseConv3d stride 2).

    Returns (out_coords, out_feats, out_valid, out_keys); the output grid is the
    static ``down2_grid(grid)``. For output site o and tap t in 3^3: input coord =
    2*o + t - 1."""
    out_coords, out_valid, out_keys, _ = downsample_sites(coords, valid, grid, v_out)
    taps = (
        2 * out_coords[None, :, :]
        + jnp.asarray(_OFFSETS_3, coords.dtype)[:, None, :]
    )  # offsets -1..1 around 2*o (pad 1)
    gathered = _gather_taps(coords, feats, valid, keys, grid, taps)  # (Vout, 27, Cin)
    vN, kN, cin = gathered.shape
    cout = weights.shape[-1]
    out = gathered.reshape(vN, kN * cin) @ weights.reshape(kN * cin, cout)
    if bias is not None:
        out = out + bias
    return out_coords, out * out_valid[:, None], out_valid, out_keys


def down2_grid(grid):
    return ((grid[0] + 1) // 2, (grid[1] + 1) // 2, (grid[2] + 1) // 2)


def downz_grid(grid):
    return ((grid[0] + 1) // 2, grid[1], grid[2])


def sparse_conv3d_downz(coords, feats, valid, keys, grid, weights, v_out: int, bias=None):
    """(3,1,1) kernel, stride (2,1,1) sparse conv — the final z-compression of the
    reference backbone (scn.py:139-144)."""
    nz, ny, nx = grid
    out_grid = ((nz + 1) // 2, ny, nx)
    lo = jnp.stack([coords[:, 0] // 2, coords[:, 1], coords[:, 2]], 1)
    hi = jnp.stack([(coords[:, 0] + 1) // 2, coords[:, 1], coords[:, 2]], 1)
    cand = jnp.concatenate([lo, hi], axis=0)
    ok = _in_grid(cand, out_grid) & jnp.tile(valid, 2)
    ckey = jnp.where(ok, _linearize(cand, out_grid), jnp.iinfo(jnp.int32).max)
    skey = jnp.sort(ckey)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first &= skey < jnp.iinfo(jnp.int32).max
    uid = jnp.cumsum(first) - 1
    slot = jnp.where(first & (uid < v_out), uid, v_out)
    out_keys = jnp.full((v_out + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    out_keys = out_keys.at[slot].set(skey.astype(jnp.int32), mode="drop")[:v_out]
    n_out = jnp.minimum(first.sum(), v_out)
    out_valid = jnp.arange(v_out) < n_out
    oz = out_keys // (ny * nx)
    rem = out_keys % (ny * nx)
    out_coords = jnp.where(
        out_valid[:, None], jnp.stack([oz, rem // nx, rem % nx], 1), 0
    )

    offs = jnp.asarray([[-1, 0, 0], [0, 0, 0], [1, 0, 0]], coords.dtype)
    taps = (
        out_coords[None, :, :] * jnp.asarray([2, 1, 1], coords.dtype)
        + offs[:, None, :]
    )
    gathered = _gather_taps(coords, feats, valid, keys, grid, taps)  # (Vout, 3, Cin)
    vN, kN, cin = gathered.shape
    out = gathered.reshape(vN, kN * cin) @ weights.reshape(kN * cin, -1)
    if bias is not None:
        out = out + bias
    return out_coords, out * out_valid[:, None], out_valid, out_keys


def scatter_dense_bev(coords, feats, valid, grid):
    """Sparse -> dense (nz, ny, nx, C) -> BEV (ny, nx, nz*C) (spconv .dense() + the
    reference's z-fold, scn.py:170-176)."""
    nz, ny, nx = grid
    lin = jnp.where(valid, _linearize(coords, grid), nz * ny * nx)
    dense = jnp.zeros((nz * ny * nx + 1, feats.shape[-1]), feats.dtype)
    dense = dense.at[lin].set(feats, mode="drop")[: nz * ny * nx]
    dense = dense.reshape(nz, ny, nx, -1)
    return jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, -1)

"""Sparse 3D convolution on TPU: gather-based submanifold + strided sparse conv.

The spconv-equivalent (SURVEY.md §7 hard part #1). The reference's VoxelNet backbone
needs sparse 3D convs over ~180k active voxels in a (41, 1504, 1504) grid — dense 3D
is infeasible at that resolution. Representation here: per sample, fixed-size buffers

    coords (V, 3) int32 zyx, feats (V, C), valid (V,) bool

sorted by linearized key. Neighbor lookup is O(1) through an occupancy-bitmap
rank/select table (build_bitmap_table): 1 bit per grid cell + per-word slot
ranks, packed as 16B rows so ONE row fetch serves all 3 x-contiguous taps of a
(dz, dy) neighbor row — 9 table fetches per voxel instead of 27, and 46MB of
table at the full Waymo 41x1504x1504 grid instead of the 371MB dense int32
grid->slot table it replaced (which itself was ~10x faster than searchsorted's
16 dependent gather steps). The 27 gathered taps contract as a single
(V, 27*Cin) x (27*Cin, Cout) MXU matmul.

- ``subm_conv3d``: submanifold conv (output sites == input sites; spconv SubMConv3d).
- ``sparse_conv3d_down2``: kernel-3 stride-2 pad-1 sparse conv (spconv SparseConv3d):
  output sites are the union of each input's contributing output positions
  (up to 2 per axis), deduplicated into a fixed V_out buffer.
- ``scatter_dense_bev``: final `.dense()` + z-fold (scn.py:170-176 parity).

Everything is jit/vmap-friendly with static shapes; batch via vmap.
"""

from __future__ import annotations

import os as _os

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


# The 9 (dz, dy) row combos in _OFFSETS_3 order (dz slowest, dx fastest).
_OFFSETS_ZY = np.stack(
    np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), axis=-1
).reshape(9, 2)


def _popcount32u(w):
    """Vectorized 32-bit popcount (SWAR) over uint32."""
    w = w - ((w >> 1) & jnp.uint32(0x55555555))
    w = (w & jnp.uint32(0x33333333)) + ((w >> 2) & jnp.uint32(0x33333333))
    w = (w + (w >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((w * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def build_bitmap_table(keys, valid, grid):
    """Occupancy-bitmap rank/select table: (n_words, 4) int32 rows
    ``[word[i], word[i+1], rank[i], rank[i+1]]``.

    Replaces the dense grid->slot int32 table (4B/cell, 371MB at the full
    Waymo grid, one >=512B tile fetch per TAP) with a bitmap (1 bit/cell) +
    per-word slot ranks: ONE 16B-row fetch serves all 3 x-taps of a (dz, dy)
    row — 3x fewer neighbor-pass fetches and 8x less table memory (46MB).
    Slot = rank[word] + popcount(word bits below the key bit), which is
    exactly the sort_voxels slot because keys are sorted unique."""
    n_cells = int(grid[0]) * int(grid[1]) * int(grid[2])
    n_words = (n_cells + 31) // 32 + 2  # slack: row i reads words i and i+1
    word_id = jnp.where(valid, keys >> 5, n_words - 1)
    bit = jnp.where(valid, keys & 31, 0).astype(jnp.uint32)
    ones = jnp.where(valid, jnp.uint32(1) << bit, jnp.uint32(0))
    words = jnp.zeros((n_words,), jnp.uint32).at[word_id].add(ones, mode="drop")
    counts = _popcount32u(words)
    ranks = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)[:-1]]
    )
    w_i = jax.lax.bitcast_convert_type(words, jnp.int32)
    return jnp.stack(
        [w_i, jnp.roll(w_i, -1), ranks, jnp.roll(ranks, -1)], axis=1
    )  # (n_words, 4)


def _bitmap_lookup_rows(btable, base_keys, row_ok, x_ok, n_cells):
    """Neighbor slots for 3 x-contiguous keys per row via ONE table-row gather.

    base_keys (..., ) key of the dx=0 tap; returns (idx (..., 3), found)."""
    # word anchored at key-1 so keys [k-1, k, k+1] live in words [a, a+1]
    anchor = jnp.clip((base_keys - 1) >> 5, 0, btable.shape[0] - 2)
    rows = btable[anchor]  # (..., 4) ONE 16B row-gather per (dz, dy) combo
    w0 = jax.lax.bitcast_convert_type(rows[..., 0], jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(rows[..., 1], jnp.uint32)
    r0, r1 = rows[..., 2], rows[..., 3]
    kk = base_keys[..., None] + jnp.arange(-1, 2)  # (..., 3)
    # bit position relative to word `anchor`; clamp handles the masked
    # kk=-1 lane at base 0 (anchor clips to 0 there, giving d=-1)
    d = jnp.clip(kk - (anchor[..., None] << 5), 0, 33)
    in_hi = d >= 32
    dw = jnp.where(in_hi, d - 32, d).astype(jnp.uint32)
    wsel = jnp.where(in_hi, w1[..., None], w0[..., None])
    rsel = jnp.where(in_hi, r1[..., None], r0[..., None])
    occ = ((wsel >> dw) & 1) == 1
    below = wsel & ((jnp.uint32(1) << dw) - jnp.uint32(1))
    slot = rsel + _popcount32u(below)
    ok = occ & row_ok[..., None] & x_ok & (kk >= 0) & (kk < n_cells)
    return jnp.where(ok, slot, 0), ok


def _neighbor_rows(center_rows, row_valid, grid, btable):
    """(idx (V, 27), found (V, 27)) for taps laid out as 9 (dz, dy) rows x 3
    x-offsets (-1, 0, +1), matching _OFFSETS_3 order."""
    nz, ny, nx = grid
    n_cells = nz * ny * nx
    v = center_rows.shape[0]
    z, y, x = center_rows[..., 0], center_rows[..., 1], center_rows[..., 2]
    row_ok = row_valid & (z >= 0) & (z < nz) & (y >= 0) & (y < ny) & (x >= 0) & (x < nx)
    base = jnp.clip(jnp.where(row_ok, z * (ny * nx) + y * nx + x, 0), 0, n_cells - 1)
    x_ok = jnp.stack([x > 0, jnp.ones_like(row_ok), x < nx - 1], axis=-1)
    idx, found = _bitmap_lookup_rows(btable, base, row_ok, x_ok, n_cells)
    return idx.reshape(v, 27), found.reshape(v, 27)


def subm_neighbors(coords, valid, keys, grid, table=None):
    """Precompute the 3x3x3 neighbor table for a voxel set: (idx (V, 27),
    found (V, 27)). Every submanifold conv at the same resolution reuses this."""
    if table is None:
        table = build_bitmap_table(keys, valid, grid)
    v = coords.shape[0]
    dzdy = jnp.asarray(_OFFSETS_ZY, coords.dtype)
    center_rows = jnp.concatenate(
        [
            coords[:, None, 0:1] + dzdy[None, :, 0:1],
            coords[:, None, 1:2] + dzdy[None, :, 1:2],
            jnp.broadcast_to(coords[:, None, 2:3], (v, 9, 1)),
        ],
        axis=-1,
    )
    return _neighbor_rows(
        center_rows, jnp.broadcast_to(valid[:, None], (v, 9)), grid, table
    )


def subm_conv3d(coords, feats, valid, keys, grid, weights, bias=None, neighbors=None):
    """Submanifold 3x3x3 conv: out[i] = sum_k W_k @ feat[neighbor_k(i)].

    weights (27, Cin, Cout) in _OFFSETS_3 order. Buffers must be
    sort_voxels-canonical. Pass ``neighbors = subm_neighbors(...)`` to
    amortize the lookup across convs."""
    if neighbors is None:
        neighbors = subm_neighbors(coords, valid, keys, grid)
    idx, found = neighbors
    out = _subm_pertap(feats, weights, idx, found)
    if bias is not None:
        out = out + bias
    return out * valid[:, None]


@jax.custom_vjp
def _subm_pertap(feats, weights, idx, found):
    """Submanifold per-tap contraction with a GATHER-based backward.

    The submanifold neighbor relation is symmetric on one site set:
    idx[v,k]=u & found[v,k] <=> idx[u,26-k]=v & found[u,26-k] (offset k
    negates to 26-k in _OFFSETS_3 order). So d feats = the same per-tap
    gather applied to the cotangent with flipped/transposed weights —
    no scatter-add (XLA's row scatter-add was ~100ms+ of the backbone's
    backward at the full grid)."""
    return _pertap_contract(feats, idx, found, weights, identity_center=True)


def _subm_pertap_fwd(feats, weights, idx, found):
    return (
        _pertap_contract(feats, idx, found, weights, identity_center=True),
        (feats, weights, idx, found),
    )


def _subm_pertap_bwd(res, g):
    feats, weights, idx, found = res
    kN, cin, cout = weights.shape
    wflip = jnp.flip(weights, 0).transpose(0, 2, 1)
    dfeats = _pertap_contract(g, idx, found, wflip, identity_center=True)
    itemsize = jnp.dtype(feats.dtype).itemsize
    if _fused_mode(idx.shape[0], kN):
        # one gather + ONE (K*C, V) x (V, Cout) MXU matmul for the whole dW
        gt = feats[idx.reshape(-1)] * found.reshape(-1, 1)
        gt = gt.reshape(idx.shape[0], kN * cin)
        dW = jax.lax.dot_general(
            gt, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(kN, cin, cout)
        return dfeats.astype(feats.dtype), dW.astype(weights.dtype), None, None
    if _PACKED_GATHER and kN == 27 and 2 * cin * itemsize <= 512:
        taps = _row_taps_27(feats, idx, found, True)  # packed wgrad reads too
    else:
        taps = ((k, feats[idx[:, k]] * found[:, k, None]) for k in range(kN))
    dW = [None] * kN
    for k, gk in taps:
        dW[k] = jax.lax.dot_general(
            gk, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return dfeats.astype(feats.dtype), jnp.stack(dW).astype(weights.dtype), None, None


_subm_pertap.defvjp(_subm_pertap_fwd, _subm_pertap_bwd)


# Row-packed gather path (round 5): per (dz, dy) row, the OCCUPIED x-taps
# always hold CONSECUTIVE slots (rank is order-preserving and no cells lie
# between key-1, key, key+1), so both feature rows a row needs live in at
# most TWO pair-packed (2C) rows — 2 fetches per row instead of 3 under a
# tile-per-fetch cost model. MEASURED DEAD END, default OFF: the same-session
# hardware A/B (benchmarks/RESULTS.md round-5 per-pass table) shows the
# packed path LOSES 10-30% on every pass (L1 13.3->16.6, L2 10.9->12.0,
# L3 9.7->10.4 ms; backbone fwd 356->398 ms runtime-coords) — the per-tap
# MONOTONE gathers already stream tile-SHARED reads (adjacent gathered rows
# fall in the same 512B tile), so real fetch traffic was below 27 tiles/voxel
# and the pair-packing only added 4-way select VPU work. Parity of both paths
# is pinned by tests/test_sparse_conv.py::test_packed_gather_matches_unpacked
# _paths (CPU) and benchmarks/verify_packed_gather.py (hardware, f32 gate).
_PACKED_GATHER = _os.environ.get("TDAL_PACKED_GATHER", "0") != "0"

# Fused-contraction crossover: voxel sets at or below this size use ONE
# interleaved gather + ONE MXU matmul instead of 27 per-tap gathers (see
# _fused_mode). Default set by the round-5 hardware A/B
# (benchmarks/fused_gather_ab.py); 0 disables.
_FUSED_MAX_V = int(_os.environ.get("TDAL_FUSED_GATHER_MAX_V", "0"))


def _extract_row_taps(packed, cat_c, idx3, found3):
    """Fetch the <=2 packed rows covering a (dz, dy) row's 3 x-taps and
    extract each tap's (V, C) feature block.

    packed (Vp/2, 2C); idx3 (V, 3) slots; found3 (V, 3). Returns [g0, g1, g2]
    with not-found taps zeroed. Occupied taps hold consecutive slots, so all
    live in packed rows a and a+1 where a = (min occupied slot) >> 1."""
    s0 = jnp.where(
        found3[:, 0], idx3[:, 0], jnp.where(found3[:, 1], idx3[:, 1], idx3[:, 2])
    )
    anyf = found3.any(axis=1)
    a = jnp.clip(jnp.where(anyf, s0 >> 1, 0), 0, packed.shape[0] - 2)
    p0 = packed[a]          # (V, 2C) — one 512B-tile fetch
    p1 = packed[a + 1]      # (V, 2C)
    halves = (p0[:, :cat_c], p0[:, cat_c:], p1[:, :cat_c], p1[:, cat_c:])
    base = a << 1
    out = []
    for j in range(3):
        off = idx3[:, j] - base  # in {0..3} when found
        g = jnp.where(
            (off == 0)[:, None], halves[0],
            jnp.where(
                (off == 1)[:, None], halves[1],
                jnp.where((off == 2)[:, None], halves[2], halves[3]),
            ),
        )
        out.append(g * found3[:, j, None])
    return out


def _row_taps_27(feats, idx, found, identity_center):
    """Per-tap (V, C) feature blocks for all 27 taps via the packed-row path.

    Yields (k, g_k) in _OFFSETS_3 order. With identity_center (submanifold
    convs: output sites == input sites), the center (dz=0, dy=0) row is pure
    shifts — slots are exactly v-1, v, v+1 — costing zero gathers; total
    16 row-fetches per voxel instead of 27."""
    v, c = feats.shape
    vp = v + (v & 1)
    fp = feats if vp == v else jnp.pad(feats, ((0, 1), (0, 0)))
    packed = fp.reshape(vp // 2, 2 * c)
    zrow = jnp.zeros((1, c), feats.dtype)
    for r in range(9):
        idx3, found3 = idx[:, 3 * r : 3 * r + 3], found[:, 3 * r : 3 * r + 3]
        if identity_center and r == 4:
            gm = jnp.concatenate([zrow, feats[:-1]], 0) * found3[:, 0, None]
            g0 = feats * found3[:, 1, None]
            gp = jnp.concatenate([feats[1:], zrow], 0) * found3[:, 2, None]
            taps = (gm, g0, gp)
        else:
            taps = _extract_row_taps(packed, c, idx3, found3)
        for j, g in enumerate(taps):
            yield 3 * r + j, g


def _fused_mode(n_out, kN):
    """Use the single-gather fused contraction for SMALL voxel sets.

    At small V the 27 per-tap gathers are dispatch/latency-bound (each tap is
    a separate kernel with a fixed cost; L3 measured 8.6 ms vs a 2.1 ms
    bandwidth wall), so one big gather + ONE (V, 27C) x (27C, Cout) MXU matmul
    wins despite the interleaved access pattern that loses at L0's 178k rows.
    Threshold from the round-5 hardware A/B (benchmarks/fused_gather_ab.py);
    TDAL_FUSED_GATHER_MAX_V=0 disables."""
    return kN > 1 and n_out <= _FUSED_MAX_V


def _fused_contract(feats, idx, found, weights):
    """One interleaved (V*K) row gather + one (V, K*C) x (K*C, Cout) matmul."""
    n_out, kN = idx.shape
    _, cin, cout = weights.shape
    g = feats[idx.reshape(-1)] * found.reshape(-1, 1)
    g = g.reshape(n_out, kN * cin)
    out = jax.lax.dot_general(
        g, weights.astype(feats.dtype).reshape(kN * cin, cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return out.astype(feats.dtype)


def _pertap_contract(feats, idx, found, weights, identity_center=False):
    """sum_k feats[idx[:, k]] @ W_k.

    Default path: one gather per tap. Per-tap indices are MONOTONE (both
    source and targets are key-sorted and the tap offset is fixed), so each
    gather streams through the feature array nearly sequentially — measured
    1.5x faster than the interleaved (V, 27) gather at the full Waymo grid
    (27.5 -> 18.5 ms, C=16), and faster than a single tap-major gather +
    batched matmul (fwd 211 / train 523 vs 218/669 vs 227/704 ms full grid).

    Fused path (n_out <= TDAL_FUSED_GATHER_MAX_V): at SMALL voxel counts the
    27 separate gathers are dispatch-bound, so one interleaved gather + one
    MXU matmul wins — see _fused_mode.

    Packed path (kN == 27 and a pair row 2*C*itemsize <= 512B, default OFF):
    consecutive-slot row extraction (_row_taps_27) cuts the 27 row-fetches
    per voxel to 16 under a tile-per-fetch cost model — but the round-5
    same-session hardware A/B (benchmarks/sparse_bisect.py, full grid,
    runtime coords) measured it SLOWER on every pass: L1 13.3 -> 16.6 ms,
    L2 10.9 -> 12.0, L3 9.7 -> 10.4 (C=32/64/128 bf16); backbone fwd
    356 -> 398 ms. Monotone gathers already stream tile-shared reads, so
    the packing only added select overhead (RESULTS.md round-5 table).
    Kept behind TDAL_PACKED_GATHER=1 with parity pinned on CPU + hardware."""
    n_out = idx.shape[0]
    kN, cin, cout = weights.shape
    itemsize = jnp.dtype(feats.dtype).itemsize
    if _fused_mode(n_out, kN):
        return _fused_contract(feats, idx, found, weights)
    out = jnp.zeros((n_out, cout), jnp.float32)
    if _PACKED_GATHER and kN == 27 and 2 * cin * itemsize <= 512:
        taps = _row_taps_27(feats, idx, found, identity_center)
        for k, g in taps:
            out = out + jax.lax.dot_general(
                g, weights[k].astype(feats.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return out.astype(feats.dtype)
    for k in range(kN):
        g = feats[idx[:, k]] * found[:, k, None]
        out = out + jax.lax.dot_general(
            g, weights[k].astype(feats.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out.astype(feats.dtype)


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


def sparse_conv3d_down2(coords, feats, valid, keys, grid, weights, v_out: int, bias=None, table=None):
    """k3/s2/p1 sparse conv (spconv SparseConv3d stride 2).

    Returns (out_coords, out_feats, out_valid, out_keys); the output grid is the
    static ``down2_grid(grid)``. For output site o and tap t in 3^3: input coord =
    2*o + t - 1."""
    out_coords, out_valid, out_keys, _ = downsample_sites(coords, valid, grid, v_out)
    # bitmap-row formulation: taps laid out as 9 (dz, dy) rows centered at
    # (2o_z+dz, 2o_y+dy, 2o_x), each row served by one 16B table fetch
    if table is None:
        table = build_bitmap_table(keys, valid, grid)
    n_out = out_coords.shape[0]
    dzdy = jnp.asarray(_OFFSETS_ZY, coords.dtype)
    center_rows = jnp.concatenate(
        [
            2 * out_coords[:, None, 0:1] + dzdy[None, :, 0:1],
            2 * out_coords[:, None, 1:2] + dzdy[None, :, 1:2],
            jnp.broadcast_to(2 * out_coords[:, None, 2:3], (n_out, 9, 1)),
        ],
        axis=-1,
    )
    idx, found = _neighbor_rows(
        center_rows, jnp.broadcast_to(out_valid[:, None], (n_out, 9)), grid, table
    )
    out = _pertap_contract(feats, idx, found, weights)
    if bias is not None:
        out = out + bias
    return out_coords, out * out_valid[:, None], out_valid, out_keys


def down2_grid(grid):
    return ((grid[0] + 1) // 2, (grid[1] + 1) // 2, (grid[2] + 1) // 2)


def downz_grid(grid):
    return ((grid[0] + 1) // 2, grid[1], grid[2])


def sparse_conv3d_downz(coords, feats, valid, keys, grid, weights, v_out: int, bias=None, table=None):
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
    )  # (3, Vout, 3) input coords per z-tap
    btable = table if table is not None else build_bitmap_table(keys, valid, grid)
    tap_ok = _in_grid(taps.reshape(-1, 3), grid).reshape(3, -1) & out_valid[None, :]
    tap_keys = jnp.clip(
        jnp.where(tap_ok, _linearize(taps.reshape(-1, 3), grid).reshape(3, -1), 0),
        0, nz * ny * nx - 1,
    )
    center_only = jnp.asarray([False, True, False])
    idx3, ok3 = _bitmap_lookup_rows(btable, tap_keys, tap_ok, center_only, nz * ny * nx)
    idx = idx3[..., 1].T  # (Vout, 3)
    found = ok3[..., 1].T
    out = _pertap_contract(feats, idx, found, weights)
    if bias is not None:
        out = out + bias
    return out_coords, out * out_valid[:, None], out_valid, out_keys


def scatter_dense_bev(coords, feats, valid, grid):
    """Sparse -> dense (nz, ny, nx, C) -> BEV (ny, nx, nz*C) (spconv .dense() + the
    reference's z-fold, scn.py:170-176).

    PRECONDITION: valid rows must carry UNIQUE, IN-GRID coords — duplicates or
    out-of-range coords with valid=True are silent undefined behavior (the
    scatter is declared promise_in_bounds + unique_indices). Callers after
    dedup downsampling (scn_sparse) satisfy this by construction.

    Every row gets a DISTINCT target slot (invalid rows land in a per-row dump
    region past the grid) so the scatter is declared unique — without this XLA
    must assume collisions and serializes (the pillar scatter measured the same
    way, commit 564e4e0)."""
    nz, ny, nx = grid
    v = feats.shape[0]
    n_cells = nz * ny * nx
    lin = jnp.where(valid, _linearize(coords, grid), n_cells + jnp.arange(v))
    dense = jnp.zeros((n_cells + v, feats.shape[-1]), feats.dtype)
    dense = dense.at[lin].set(
        feats, mode="promise_in_bounds", unique_indices=True
    )[:n_cells]
    dense = dense.reshape(nz, ny, nx, -1)
    return jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, -1)

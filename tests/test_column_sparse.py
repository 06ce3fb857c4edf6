"""Column-dense sparse conv vs the gather-based reference implementation.

The column backbone (tdal/models/scn_columns.py) must compute EXACTLY what the
voxel-gather backbone (tdal/models/scn_sparse.py) computes — same submanifold
semantics, same parameters — so these tests drive both on random sparse inputs
and compare per-site outputs / the final BEV maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.ops import column_sparse as cs
from tdal.ops import sparse_conv as sp

GRID = (5, 12, 16)


def _random_voxels(v_cap=64, n=40, c=6, seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    lin = rng.choice(nz * ny * nx, size=n, replace=False)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], 1)
    out_c = np.zeros((v_cap, 3), np.int32)
    out_c[:n] = coords
    valid = np.arange(v_cap) < n
    feats = rng.normal(size=(v_cap, c)).astype(np.float32) * valid[:, None]
    return jnp.asarray(out_c), jnp.asarray(feats), jnp.asarray(valid)


def _columns_from_voxels(coords, feats, valid, grid, cap):
    return cs.pack_columns(coords, feats, valid, grid, cap)


def _site_map(col_key, col_feat, col_occ, col_valid, grid, nz, c):
    """column rep -> {(z, y, x): feature} for comparisons."""
    _, ny, nx = grid
    body = np.asarray(col_feat)[:, c : c + nz * c].reshape(-1, nz, c)
    occ = np.asarray(col_occ)
    keys = np.asarray(col_key)
    ok = np.asarray(col_valid)
    out = {}
    for i in range(len(keys)):
        if not ok[i]:
            continue
        y, x = divmod(int(keys[i]), nx)
        for z in range(nz):
            if occ[i, z]:
                out[(z, y, x)] = body[i, z]
    return out


def test_pack_columns_roundtrip():
    coords, feats, valid, = _random_voxels()
    ck, cf, occ, cv, n = _columns_from_voxels(coords, feats, valid, GRID, 64)
    sites = _site_map(ck, cf, occ, cv, GRID, GRID[0], feats.shape[-1])
    assert len(sites) == int(valid.sum())
    for i in range(int(valid.sum())):
        z, y, x = (int(q) for q in coords[i])
        np.testing.assert_allclose(sites[(z, y, x)], np.asarray(feats)[i], atol=1e-6)


def test_subm_conv_matches_gather_implementation():
    coords, feats, valid = _random_voxels()
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (27, 6, 8)) * 0.3

    cso, fso, mso, kso = sp.sort_voxels(coords, feats, valid, GRID)
    ref = sp.subm_conv3d(cso, fso, mso, kso, GRID, w)

    ck, cf, occ, cv, _ = _columns_from_voxels(coords, feats, valid, GRID, 64)
    nbr = cs.column_neighbors(ck, cv, GRID)
    out = cs.subm_conv_columns(cf, occ, *nbr, w, GRID[0])
    sites = _site_map(ck, out, occ, cv, GRID, GRID[0], 8)

    for i in range(int(mso.sum())):
        z, y, x = (int(q) for q in cso[i])
        np.testing.assert_allclose(
            sites[(z, y, x)], np.asarray(ref)[i], rtol=1e-4, atol=1e-5
        )


def test_down2_conv_matches_gather_implementation():
    coords, feats, valid = _random_voxels(seed=3)
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (27, 6, 4)) * 0.3

    cso, fso, mso, kso = sp.sort_voxels(coords, feats, valid, GRID)
    oc, of, om, ok_ = sp.sparse_conv3d_down2(cso, fso, mso, kso, GRID, w, 256)
    grid2 = sp.down2_grid(GRID)

    ck, cf, occ, cv, _ = _columns_from_voxels(coords, feats, valid, GRID, 64)
    k2, out, occ2, cv2 = cs.down2_conv_columns(cf, occ, ck, cv, GRID, w, 256)
    sites = _site_map(k2, out, occ2, cv2, grid2, grid2[0], 4)

    n_ref = int(om.sum())
    assert len(sites) == n_ref  # same output site set
    for i in range(n_ref):
        z, y, x = (int(q) for q in oc[i])
        np.testing.assert_allclose(
            sites[(z, y, x)], np.asarray(of)[i], rtol=1e-4, atol=1e-5
        )


def test_downz_conv_matches_gather_implementation():
    coords, feats, valid = _random_voxels(seed=5)
    key = jax.random.PRNGKey(4)
    w = jax.random.normal(key, (3, 6, 6)) * 0.3

    cso, fso, mso, kso = sp.sort_voxels(coords, feats, valid, GRID)
    oc, of, om, ok_ = sp.sparse_conv3d_downz(cso, fso, mso, kso, GRID, w, 64)
    gridz = sp.downz_grid(GRID)

    ck, cf, occ, cv, _ = _columns_from_voxels(coords, feats, valid, GRID, 64)
    out, occz = cs.downz_conv_columns(cf, occ, w, GRID[0])
    sites = _site_map(ck, out, occz, cv, gridz, gridz[0], 6)

    n_ref = int(om.sum())
    assert len(sites) == n_ref
    for i in range(n_ref):
        z, y, x = (int(q) for q in oc[i])
        np.testing.assert_allclose(
            sites[(z, y, x)], np.asarray(of)[i], rtol=1e-4, atol=1e-5
        )


def test_backbone_matches_sparse_backbone():
    """Full backbone equivalence: same params -> same BEV output."""
    from tdal.models.scn_columns import ColumnMiddleBackbone
    from tdal.models.scn_sparse import SparseMiddleBackbone

    coords, feats, valid = _random_voxels(v_cap=64, n=40, c=5, seed=7)
    cb, fb, vb = coords[None], feats[None], valid[None]
    grid = GRID
    key = jax.random.PRNGKey(0)

    # caps large enough that neither representation truncates output sites
    sp_model = SparseMiddleBackbone(
        grid_size=grid, channels=(8, 8, 16, 16), voxel_caps=(64, 256, 256, 256)
    )
    sp_vars = sp_model.init({"params": key}, fb, cb, vb, False)
    col_model = ColumnMiddleBackbone(
        grid_size=grid, channels=(8, 8, 16, 16), column_caps=(64, 256, 256, 256)
    )
    col_vars = col_model.init({"params": key}, fb, cb, vb, False)
    # graft the sparse model's params/stats onto the column model (identical
    # tree structure by construction)
    sp_leaves = jax.tree_util.tree_leaves(sp_vars)
    col_tree = jax.tree_util.tree_structure(col_vars)
    assert len(sp_leaves) == len(jax.tree_util.tree_leaves(col_vars))
    col_vars2 = jax.tree_util.tree_unflatten(col_tree, sp_leaves)

    ref = sp_model.apply(sp_vars, fb, cb, vb, train=False)
    out = col_model.apply(col_vars2, fb, cb, vb, train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_backbone_train_mode_runs_and_masks():
    from tdal.models.scn_columns import ColumnMiddleBackbone

    coords, feats, valid = _random_voxels(v_cap=64, n=30, c=5, seed=9)
    model = ColumnMiddleBackbone(grid_size=GRID, channels=(8, 8, 8, 8),
                                 column_caps=(64, 64, 64, 64))
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, feats[None], coords[None], valid[None], False)
    out, upd = model.apply(
        vars_, feats[None], coords[None], valid[None], train=True,
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out)).all()
    assert "batch_stats" in upd

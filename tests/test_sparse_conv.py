"""Sparse conv tests: parity against dense lax 3D convolution oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.ops.sparse_conv import (
    down2_grid,
    downsample_sites,
    scatter_dense_bev,
    sort_voxels,
    sparse_conv3d_down2,
    subm_conv3d,
)

GRID = (4, 8, 8)


def _random_sparse(v_cap=40, n_active=25, c=6, seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], 1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((v_cap - n_active, 3), np.int32)])
    feats = np.zeros((v_cap, c), np.float32)
    feats[:n_active] = rng.normal(size=(n_active, c))
    valid = np.arange(v_cap) < n_active
    return jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)


def _to_dense(coords, feats, valid, grid):
    nz, ny, nx = grid
    dense = np.zeros((nz, ny, nx, feats.shape[-1]), np.float32)
    c = np.asarray(coords)
    f = np.asarray(feats)
    for i in np.where(np.asarray(valid))[0]:
        dense[c[i, 0], c[i, 1], c[i, 2]] = f[i]
    return dense


def _dense_conv(dense, weights, stride):
    k = np.zeros((3, 3, 3, dense.shape[-1], weights.shape[-1]), np.float32)
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                k[kz, ky, kx] = np.asarray(weights)[9 * kz + 3 * ky + kx]
    # explicit pad 1 (spconv SparseConv3d(k=3, p=1) semantics; SAME pads
    # asymmetrically for stride 2 on even dims)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None], jnp.asarray(k),
        window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return np.asarray(out[0])


def test_subm_conv_matches_dense_oracle():
    coords, feats, valid, = _random_sparse()
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (27, 6, 5))
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, GRID)
    out = subm_conv3d(coords, feats, valid, keys, GRID, w)
    dense_out = _dense_conv(_to_dense(coords, feats, valid, GRID), w, 1)
    c = np.asarray(coords)
    for i in np.where(np.asarray(valid))[0]:
        np.testing.assert_allclose(
            np.asarray(out[i]), dense_out[c[i, 0], c[i, 1], c[i, 2]], atol=1e-4
        )


def test_downsample_sites_cover_receptive_outputs():
    coords, feats, valid = _random_sparse(seed=1)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, GRID)
    oc, ov, ok, n = downsample_sites(coords, valid, GRID, 64)
    og = down2_grid(GRID)
    # oracle: an output site is live iff its stride-2 receptive field hits an input
    dense = _to_dense(coords, feats, valid, GRID).sum(-1) != 0
    live = set()
    for z in range(og[0]):
        for y in range(og[1]):
            for x in range(og[2]):
                win = dense[
                    max(2 * z - 1, 0) : 2 * z + 2,
                    max(2 * y - 1, 0) : 2 * y + 2,
                    max(2 * x - 1, 0) : 2 * x + 2,
                ]
                if win.any():
                    live.add((z, y, x))
    got = {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]}
    assert got == live


def test_sparse_down2_matches_dense_oracle():
    coords, feats, valid = _random_sparse(seed=2)
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (27, 6, 4))
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, GRID)
    oc, ofeat, ov, okeys = sparse_conv3d_down2(coords, feats, valid, keys, GRID, w, 64)
    dense_out = _dense_conv(_to_dense(coords, feats, valid, GRID), w, 2)
    c = np.asarray(oc)
    for i in np.where(np.asarray(ov))[0]:
        np.testing.assert_allclose(
            np.asarray(ofeat[i]), dense_out[c[i, 0], c[i, 1], c[i, 2]], atol=1e-4
        )


def test_scatter_dense_bev_shape():
    coords, feats, valid = _random_sparse(seed=3)
    bev = scatter_dense_bev(coords, feats, valid, GRID)
    assert bev.shape == (8, 8, 4 * 6)


def test_sparse_backbone_forward_and_grad():
    from tdal.models.scn_sparse import SparseMiddleBackbone

    coords, feats, valid = _random_sparse(v_cap=64, n_active=40, c=5, seed=4)
    model = SparseMiddleBackbone(grid_size=GRID, channels=(8, 16), voxel_caps=(64, 64))
    b_feats = jnp.stack([feats, feats])
    b_coords = jnp.stack([coords, coords])
    b_valid = jnp.stack([valid, valid])
    variables = model.init(jax.random.PRNGKey(0), b_feats, b_coords, b_valid)
    bev = model.apply(variables, b_feats, b_coords, b_valid)
    # grid (4,8,8) -> down2 (2,4,4) -> z-stride (1,4,4); C=16 folded over z=1
    assert bev.shape == (2, 4, 4, 16)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            b_feats, b_coords, b_valid, train=True, mutable=["batch_stats"],
        )
        return (out ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), g, 0.0))
    )

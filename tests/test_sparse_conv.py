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


# ---------------------------------------------------------------------------
# Golden cases hand-computed from spconv's DOCUMENTED semantics (VERDICT r3
# item 8) — closing the residual risk that the dense-conv oracle shares a bug
# with the implementation, or misses active-set semantics (a site whose conv
# value is 0 must still be ACTIVE if any input hits its receptive field).
#
# spconv SparseConv3d(k=3, s=2, p=1) semantics (reference
# det3d/models/backbones/scn.py:100-146 uses exactly k3/s2/p1 and a final
# (3,1,1)/(2,1,1)):
#   - out spatial size per axis: floor((D + 2*1 - 3)/2) + 1 = (D+1)//2
#   - output site o is active iff ANY active input i satisfies 2o-1 <= i <= 2o+1
#     per axis (its receptive field), regardless of feature values
#   - value: out[o] = sum_k w[k]^T in[2o + k - 1]  (cross-correlation)
# SubMConv3d: output sites == input sites; out[p] = sum_k w[k]^T in[p + k - 1]
# over ACTIVE inputs only.
# ---------------------------------------------------------------------------


def _pack(coord_list, feat_list, v_cap, c):
    coords = np.zeros((v_cap, 3), np.int32)
    feats = np.zeros((v_cap, c), np.float32)
    for i, (cc, ff) in enumerate(zip(coord_list, feat_list)):
        coords[i] = cc
        feats[i] = ff
    valid = np.arange(v_cap) < len(coord_list)
    return jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)


def _tap(kz, ky, kx):
    return 9 * kz + 3 * ky + kx


def _golden_w(c_in=2, c_out=3, seed=5):
    return np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (27, c_in, c_out)))


def test_golden_subm_pair():
    """Two voxels one x-step apart: each output is its own center tap plus the
    neighbor through the offset tap (k = offset + 1 per axis)."""
    grid = (4, 4, 4)
    f0, f1 = np.array([1.0, 2.0], np.float32), np.array([-3.0, 0.5], np.float32)
    coords, feats, valid = _pack([(1, 1, 1), (1, 1, 2)], [f0, f1], 8, 2)
    w = _golden_w()
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    out = np.asarray(subm_conv3d(coords, feats, valid, keys, grid, jnp.asarray(w)))
    # sorted order keeps (1,1,1) before (1,1,2)
    want0 = f0 @ w[_tap(1, 1, 1)] + f1 @ w[_tap(1, 1, 2)]  # neighbor at +x -> kx=2
    want1 = f1 @ w[_tap(1, 1, 1)] + f0 @ w[_tap(1, 1, 0)]  # neighbor at -x -> kx=0
    np.testing.assert_allclose(out[0], want0, atol=1e-5)
    np.testing.assert_allclose(out[1], want1, atol=1e-5)


def test_golden_down2_corner_voxels():
    """Single voxels at the (0,0,0) and (D-1,..) corners of an even grid:
    exactly one output site each, with hand-derived tap weights."""
    grid = (4, 4, 4)  # out grid (2,2,2)
    w = _golden_w()
    f = np.array([2.0, -1.0], np.float32)

    # corner (0,0,0): o must satisfy 2o-1<=0<=2o+1 -> o=0 per axis.
    # tap k = i - 2o + 1 = 1 per axis -> center tap 13.
    coords, feats, valid = _pack([(0, 0, 0)], [f], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    assert {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]} == {(0, 0, 0)}
    np.testing.assert_allclose(np.asarray(ofeat)[np.asarray(ov)][0], f @ w[13], atol=1e-5)

    # corner (3,3,3): candidates o in {1,2}, o=2 is outside the (2,2,2) out
    # grid -> only o=1 per axis; tap k = 3 - 2 + 1 = 2 per axis -> tap 26.
    coords, feats, valid = _pack([(3, 3, 3)], [f], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    assert {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]} == {(1, 1, 1)}
    np.testing.assert_allclose(
        np.asarray(ofeat)[np.asarray(ov)][0], f @ w[_tap(2, 2, 2)], atol=1e-5
    )


def test_golden_down2_odd_voxel_fans_out_to_8():
    """A voxel with all-odd coords lies in the receptive field of 2 output
    positions per axis -> exactly 8 active output sites, each pulling the voxel
    through the corner-appropriate tap."""
    grid = (4, 4, 4)
    w = _golden_w()
    f = np.array([1.5, 4.0], np.float32)
    coords, feats, valid = _pack([(1, 1, 1)], [f], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    got = {tuple(r): i for i, r in enumerate(np.asarray(oc)) if np.asarray(ov)[i]}
    assert set(got) == {(z, y, x) for z in (0, 1) for y in (0, 1) for x in (0, 1)}
    for (oz, oy, ox), row in got.items():
        # tap k = 1 - 2*o + 1 = 2 - 2*o per axis
        want = f @ w[_tap(2 - 2 * oz, 2 - 2 * oy, 2 - 2 * ox)]
        np.testing.assert_allclose(np.asarray(ofeat)[row], want, atol=1e-5)


def test_golden_down2_sum_and_odd_grid_border():
    """(a) Two voxels landing on one output site sum their tap contributions.
    (b) Odd grid: last voxel maps to the single final output site (o=(D-1)/2)."""
    grid = (4, 4, 4)
    w = _golden_w()
    f0 = np.array([1.0, 1.0], np.float32)
    f1 = np.array([0.0, 2.0], np.float32)
    coords, feats, valid = _pack([(0, 0, 0), (1, 1, 1)], [f0, f1], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    got = {tuple(r): i for i, r in enumerate(np.asarray(oc)) if np.asarray(ov)[i]}
    want000 = f0 @ w[13] + f1 @ w[_tap(2, 2, 2)]
    np.testing.assert_allclose(np.asarray(ofeat)[got[(0, 0, 0)]], want000, atol=1e-5)

    grid5 = (5, 5, 5)  # out grid (3,3,3)
    coords, feats, valid = _pack([(4, 4, 4)], [f0], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid5)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid5, jnp.asarray(w), 16)
    # candidates {4//2, 5//2} = {2} per axis; tap k = 4 - 4 + 1 = 1 -> center.
    assert {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]} == {(2, 2, 2)}
    np.testing.assert_allclose(np.asarray(ofeat)[np.asarray(ov)][0], f0 @ w[13], atol=1e-5)


def test_golden_active_site_independent_of_values():
    """spconv marks output sites from GEOMETRY, not values: a zero-feature
    input must still produce an ACTIVE output site (value 0). The dense oracle
    cannot see this distinction."""
    grid = (4, 4, 4)
    w = _golden_w()
    coords, feats, valid = _pack([(2, 2, 2)], [np.zeros(2, np.float32)], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_down2(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    got = {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]}
    assert got == {(1, 1, 1)}  # active despite zero value
    np.testing.assert_allclose(np.asarray(ofeat)[np.asarray(ov)][0], 0.0, atol=1e-7)


def test_golden_downz():
    """(3,1,1)/(2,1,1) final z-compression (scn.py:139-144): voxel at z=4 in
    nz=5 -> single site z=2 via the center z-tap."""
    from tdal.ops.sparse_conv import sparse_conv3d_downz

    grid = (5, 4, 4)  # out (3, 4, 4)
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (3, 2, 3)))
    f = np.array([3.0, -2.0], np.float32)
    coords, feats, valid = _pack([(4, 1, 2)], [f], 8, 2)
    coords, feats, valid, keys = sort_voxels(coords, feats, valid, grid)
    oc, ofeat, ov, _ = sparse_conv3d_downz(coords, feats, valid, keys, grid, jnp.asarray(w), 16)
    assert {tuple(r) for r in np.asarray(oc)[np.asarray(ov)]} == {(2, 1, 2)}
    # z tap k = 4 - 2*2 + 1 = 1 (center of the 3 z-taps)
    np.testing.assert_allclose(np.asarray(ofeat)[np.asarray(ov)][0], f @ w[1], atol=1e-5)


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


def test_packed_gather_matches_unpacked_paths():
    """The packed consecutive-slot row gather (sparse_conv._row_taps_27) must
    produce the per-tap gather path's exact results — fwd AND custom-VJP grads
    — including the boundary cases: ODD valid count (pad row in the pair
    packing), voxels at the END of the slot space (packed-row index clip), and
    an invalid tail. f32 here so any wrong row fetch is O(1), not rounding
    (the hardware twin is benchmarks/verify_packed_gather.py)."""
    import tdal.ops.sparse_conv as sc

    for seed, n_active, v_cap in [(0, 25, 40), (1, 39, 39), (2, 37, 40)]:
        coords, feats, valid = _random_sparse(v_cap=v_cap, n_active=n_active, c=6, seed=seed)
        coords, feats, valid, keys = sort_voxels(coords, feats, valid, GRID)
        w = jax.random.normal(jax.random.PRNGKey(seed), (27, 6, 5))
        w2 = jax.random.normal(jax.random.PRNGKey(100 + seed), (27, 6, 7))

        def run(c_, f_, m_, k_):
            out = subm_conv3d(c_, f_, m_, k_, GRID, w)
            _, down, _, _ = sparse_conv3d_down2(c_, f_, m_, k_, GRID, w2, v_out=32)
            return out, down

        def loss(f_):
            out, down = run(coords, f_, valid, keys)
            return (out ** 2).sum() + (down ** 2).sum(), (out, down)

        prev = sc._PACKED_GATHER
        try:
            sc._PACKED_GATHER = True
            (l1, (o1, d1)), g1 = jax.value_and_grad(loss, has_aux=True)(feats)
            sc._PACKED_GATHER = False
            (l0, (o0, d0)), g0 = jax.value_and_grad(loss, has_aux=True)(feats)
        finally:
            sc._PACKED_GATHER = prev
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)


def test_fused_gather_matches_pertap_paths():
    """The fused single-gather contraction (sparse_conv._fused_contract, used
    for small voxel sets where 27 per-tap gathers are dispatch-bound) must
    match the per-tap path exactly — fwd AND custom-VJP grads (feats + W),
    through both subm and strided down convs. f32 so any wrong row is O(1)."""
    import tdal.ops.sparse_conv as sc

    for seed, n_active, v_cap in [(0, 25, 40), (1, 39, 39), (2, 37, 40)]:
        coords, feats, valid = _random_sparse(v_cap=v_cap, n_active=n_active, c=6, seed=seed)
        coords, feats, valid, keys = sort_voxels(coords, feats, valid, GRID)
        w = jax.random.normal(jax.random.PRNGKey(seed), (27, 6, 5))
        w2 = jax.random.normal(jax.random.PRNGKey(100 + seed), (27, 6, 7))

        def loss(f_, w_, w2_):
            out = subm_conv3d(coords, f_, valid, keys, GRID, w_)
            _, down, _, _ = sparse_conv3d_down2(coords, f_, valid, keys, GRID, w2_, v_out=32)
            return (out ** 2).sum() + (down ** 2).sum(), (out, down)

        prev = sc._FUSED_MAX_V
        try:
            sc._FUSED_MAX_V = 10 ** 9
            (l1, (o1, d1)), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(feats, w, w2)
            sc._FUSED_MAX_V = 0
            (l0, (o0, d0)), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(feats, w, w2)
        finally:
            sc._FUSED_MAX_V = prev
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5, atol=1e-5)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)

"""Voxelization tests: parity with the reference points_to_voxel semantics."""

import jax.numpy as jnp
import numpy as np

from tdal.core.voxel import VoxelConfig, pad_points, voxelize, voxelize_batch

CFG = VoxelConfig(
    point_cloud_range=(-8, -8, -2, 8, 8, 2),
    voxel_size=(0.5, 0.5, 4.0),
    max_points_per_voxel=8,
    max_voxels=1024,
)


def _oracle_cells(pts):
    inr = (
        (pts[:, 0] >= -8) & (pts[:, 0] < 8)
        & (pts[:, 1] >= -8) & (pts[:, 1] < 8)
        & (pts[:, 2] >= -2) & (pts[:, 2] < 2)
    )
    ix = np.floor(
        (pts[inr, :3] - np.array([-8, -8, -2])) / np.array([0.5, 0.5, 4.0])
    ).astype(int)
    return inr, ix


def test_voxelize_matches_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-9, 9, (500, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 2.5, 500)
    padded = pad_points(pts, 600)
    voxels, coords, num_points, n_vox = voxelize(jnp.asarray(padded), CFG)
    inr, ix = _oracle_cells(pts)
    cells = set(map(tuple, ix))
    assert int(n_vox) == len(cells)
    npnts = np.asarray(num_points)
    assert int(npnts[: int(n_vox)].sum()) == inr.sum()
    # every stored point belongs to its voxel's cell
    v, c = np.asarray(voxels), np.asarray(coords)
    for i in range(int(n_vox)):
        for j in range(npnts[i]):
            cell = np.floor(
                (v[i, j, :3] - np.array([-8, -8, -2])) / np.array([0.5, 0.5, 4.0])
            ).astype(int)
            assert (cell == c[i][::-1]).all()


def test_voxelize_max_points_cap():
    # 20 identical points -> one voxel capped at max_points_per_voxel
    pts = np.tile(np.array([[1.0, 1.0, 0.0, 0.5, 0.5]], np.float32), (20, 1))
    voxels, coords, num_points, n_vox = voxelize(jnp.asarray(pad_points(pts, 32)), CFG)
    assert int(n_vox) == 1
    assert int(num_points[0]) == 8  # capped
    np.testing.assert_allclose(np.asarray(voxels)[0, :8, :2], 1.0)


def test_voxelize_all_out_of_range():
    pts = np.full((10, 5), 100.0, np.float32)
    voxels, coords, num_points, n_vox = voxelize(jnp.asarray(pts), CFG)
    assert int(n_vox) == 0
    assert int(np.asarray(num_points).sum()) == 0


def test_voxelize_batch_shapes():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-8, 8, (3, 200, 4)).astype(np.float32)
    voxels, coords, num_points, n_vox = voxelize_batch(jnp.asarray(pts), CFG)
    # the static voxel buffer clamps to min(max_voxels, n_points): a frame
    # can't produce more voxels than it has points, and every sparse op
    # downstream scales with the buffer size
    assert voxels.shape == (3, 200, 8, 4)
    assert coords.shape == (3, 200, 3)
    assert n_vox.shape == (3,)
    assert all(int(n) > 0 for n in n_vox)


def test_nan_padding_dropped():
    pts = np.array([[1.0, 1.0, 0.0, 0.1, 0.2]], np.float32)
    padded = pad_points(pts, 16)
    _, _, num_points, n_vox = voxelize(jnp.asarray(padded), CFG)
    assert int(n_vox) == 1
    assert int(np.asarray(num_points).sum()) == 1

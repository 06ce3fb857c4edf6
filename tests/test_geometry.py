import numpy as np
import pytest

from tdal.core import geometry as G

from oracles import points_in_rbbox as np_points_in_rbbox
from oracles import rot_ccw


def test_rotate_points_z_ccw():
    pts = np.array([[1.0, 0.0, 5.0]])
    out = np.asarray(G.rotate_points_z(pts, np.pi / 2))
    np.testing.assert_allclose(out, [[0.0, 1.0, 5.0]], atol=1e-6)


def test_rotate_points_z_batched_angles():
    rng = np.random.RandomState(0)
    pts = rng.randn(4, 7, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(4,)).astype(np.float32)
    out = np.asarray(G.rotate_points_z(pts, ang[:, None]))
    for b in range(4):
        expect = pts[b, :, :2] @ rot_ccw(ang[b]).T
        np.testing.assert_allclose(out[b, :, :2], expect, atol=1e-5)
        np.testing.assert_allclose(out[b, :, 2], pts[b, :, 2], atol=1e-6)


def test_corners_2d_axis_aligned():
    c = np.asarray(
        G.center_to_corner_box2d(
            np.array([[1.0, 2.0]]), np.array([[4.0, 2.0]]), np.array([0.0])
        )
    )[0]
    expect = {(-1.0, 1.0), (-1.0, 3.0), (3.0, 3.0), (3.0, 1.0)}
    got = {tuple(np.round(p, 5)) for p in c}
    assert got == expect


def test_corners_3d_rotation_moves_length_axis():
    # heading pi/2 rotates the box's +x (length) axis onto +y
    c = np.asarray(
        G.center_to_corner_box3d(
            np.zeros((1, 3)),
            np.array([[4.0, 2.0, 1.0]]),
            np.array([np.pi / 2]),
        )
    )[0]
    assert np.max(np.abs(c[:, 1])) == pytest.approx(2.0, abs=1e-5)
    assert np.max(np.abs(c[:, 0])) == pytest.approx(1.0, abs=1e-5)
    assert np.max(np.abs(c[:, 2])) == pytest.approx(0.5, abs=1e-6)


def test_points_in_rbbox_matches_oracle():
    rng = np.random.RandomState(1)
    points = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(-5, 5, 500 // 100 * 0 + 8),  # x
            rng.uniform(-5, 5, 8),
            rng.uniform(-2, 2, 8),
            rng.uniform(1, 6, 8),
            rng.uniform(1, 4, 8),
            rng.uniform(1, 3, 8),
            rng.uniform(-np.pi, np.pi, 8),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(G.points_in_rbbox(points, boxes))
    expect = np_points_in_rbbox(points, boxes)
    assert (got == expect).mean() > 0.999  # boundary-epsilon disagreements only
    # No box should be empty or full by construction fluke, sanity:
    assert got.any()


def test_points_in_rbbox_heading_direction():
    # A long thin box rotated +45deg (CCW) must contain the point along the
    # +45deg diagonal, not the -45deg one (catches the reference's clockwise quirk).
    box = np.array([[0.0, 0.0, 0.0, 10.0, 0.5, 2.0, np.pi / 4]])
    p_ccw = np.array([[2.0, 2.0, 0.0]])
    p_cw = np.array([[2.0, -2.0, 0.0]])
    assert bool(np.asarray(G.points_in_rbbox(p_ccw, box))[0, 0])
    assert not bool(np.asarray(G.points_in_rbbox(p_cw, box))[0, 0])


def test_limit_period():
    vals = np.array([0.3, np.pi + 0.3, -np.pi - 0.3, 5 * np.pi])
    out = np.asarray(G.limit_period(vals))
    expect = vals - np.floor(vals / np.pi + 0.5) * np.pi
    np.testing.assert_allclose(out, expect, atol=1e-6)


def _random_pose(rng):
    theta = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(theta), np.sin(theta)
    pose = np.eye(4)
    pose[:2, :2] = [[c, -s], [s, c]]
    pose[:3, 3] = rng.uniform(-50, 50, 3)
    return pose.astype(np.float32), theta


def test_transform_box_roundtrip():
    rng = np.random.RandomState(2)
    pose, theta = _random_pose(rng)
    boxes = rng.uniform(-5, 5, size=(10, 7)).astype(np.float32)
    out = np.asarray(G.transform_box(boxes, pose))
    np.testing.assert_allclose(out[:, 6], boxes[:, 6] + theta, atol=1e-4)
    np.testing.assert_allclose(
        out[:, :3], boxes[:, :3] @ pose[:3, :3].T + pose[:3, 3], atol=1e-4
    )
    np.testing.assert_allclose(out[:, 3:6], boxes[:, 3:6], atol=1e-6)
    back = np.asarray(G.transform_box(out, np.linalg.inv(pose).astype(np.float32)))
    np.testing.assert_allclose(back[:, :3], boxes[:, :3], atol=1e-3)


def test_transform_points_consistent_with_boxes():
    """A point inside a box stays inside after transforming both."""
    rng = np.random.RandomState(3)
    pose, _ = _random_pose(rng)
    box = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.7]], dtype=np.float32)
    pts = np.array([[1.5, 2.2, 0.6], [30.0, 0.0, 0.0]], dtype=np.float32)
    before = np.asarray(G.points_in_rbbox(pts, box))
    pts_t = np.asarray(G.transform_points(pts, pose))
    box_t = np.asarray(G.transform_box(box, pose))
    after = np.asarray(G.points_in_rbbox(pts_t, box_t))
    assert (before == after).all()


def test_transform_box_with_velocity():
    rng = np.random.RandomState(4)
    pose, theta = _random_pose(rng)
    boxes = rng.uniform(-5, 5, size=(6, 9)).astype(np.float32)
    out = np.asarray(G.transform_box_with_velocity(boxes, pose))
    np.testing.assert_allclose(out[:, 8], boxes[:, 8] + theta, atol=1e-4)
    expect_v = boxes[:, 6:8] @ pose[:2, :2].T
    np.testing.assert_allclose(out[:, 6:8], expect_v, atol=1e-4)


def test_kitti_waymo_involution():
    rng = np.random.RandomState(5)
    boxes = rng.uniform(-5, 5, size=(7, 7)).astype(np.float32)
    there = np.asarray(G.kitti_to_waymo_box(boxes))
    # l/w swapped, heading = -h - pi/2
    np.testing.assert_allclose(there[:, 3], boxes[:, 4], atol=1e-6)
    np.testing.assert_allclose(there[:, 4], boxes[:, 3], atol=1e-6)
    np.testing.assert_allclose(
        there[:, 6], -boxes[:, 6] - np.pi / 2, atol=1e-6
    )
    back = np.asarray(G.waymo_to_kitti_box(there))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_corner_to_standup():
    boxes = np.array([[0.0, 0.0, 4.0, 2.0]])
    import tdal.core.geometry as g

    corners = g.center_to_corner_box2d(
        boxes[:, :2], boxes[:, 2:], np.array([np.pi / 2])
    )
    standup = np.asarray(g.corner_to_standup(corners))[0]
    np.testing.assert_allclose(standup, [-1, -2, 1, 2], atol=1e-5)

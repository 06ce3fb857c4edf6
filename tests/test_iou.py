import numpy as np

from tdal.core import iou as I

import oracles


def _random_boxes(rng, n):
    return np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            rng.uniform(-2, 2, n),
            rng.uniform(0.5, 6, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_identity_iou_is_one():
    boxes = _random_boxes(np.random.RandomState(0), 8)
    iou = np.asarray(I.boxes_iou_bev(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    iou3 = np.asarray(I.boxes_iou_3d(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou3), 1.0, atol=1e-4)


def test_disjoint_iou_is_zero():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.3]], dtype=np.float32)
    b = np.array([[100, 100, 0, 2, 2, 2, -0.8]], dtype=np.float32)
    assert float(I.boxes_iou_bev(a, b)[0, 0]) == 0.0
    assert float(I.boxes_iou_3d(a, b)[0, 0]) == 0.0


def test_axis_aligned_known_value():
    # Two unit squares overlapping by half.
    a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], dtype=np.float32)
    b = np.array([[0.5, 0, 0, 1, 1, 1, 0.0]], dtype=np.float32)
    iou = float(I.boxes_iou_bev(a, b)[0, 0])
    np.testing.assert_allclose(iou, 0.5 / 1.5, atol=1e-5)


def test_rotated_known_value():
    # Unit square vs same square rotated 45deg: intersection is a regular octagon
    # with area 2*(sqrt(2)-1).
    a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], dtype=np.float32)
    b = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], dtype=np.float32)
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(
        float(I.boxes_iou_bev(a, b)[0, 0]), expect, atol=1e-4
    )


def test_random_pairs_match_oracle():
    rng = np.random.RandomState(42)
    a = _random_boxes(rng, 24)
    b = _random_boxes(rng, 24)
    got_bev = np.asarray(I.boxes_iou_bev(a, b))
    got_3d = np.asarray(I.boxes_iou_3d(a, b))
    for i in range(24):
        for j in range(0, 24, 5):
            np.testing.assert_allclose(
                got_bev[i, j],
                oracles.iou_bev(a[i].astype(np.float64), b[j].astype(np.float64)),
                atol=2e-3,
                err_msg=f"bev pair {i},{j}",
            )
            np.testing.assert_allclose(
                got_3d[i, j],
                oracles.iou_3d(a[i].astype(np.float64), b[j].astype(np.float64)),
                atol=2e-3,
                err_msg=f"3d pair {i},{j}",
            )


def test_contained_box():
    a = np.array([[0, 0, 0, 4, 4, 4, 0.7]], dtype=np.float32)
    b = np.array([[0, 0, 0, 2, 2, 2, 0.7]], dtype=np.float32)
    np.testing.assert_allclose(
        float(I.boxes_iou_bev(a, b)[0, 0]), 4.0 / 16.0, atol=1e-4
    )
    np.testing.assert_allclose(
        float(I.boxes_iou_3d(a, b)[0, 0]), 8.0 / 64.0, atol=1e-4
    )


def test_labeler_iou_identical_boxes():
    boxes = _random_boxes(np.random.RandomState(3), 10)
    iou3d, iou2d = I.labeler_box3d_iou(boxes, boxes)
    np.testing.assert_allclose(np.asarray(iou3d), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou2d), 1.0, atol=1e-4)


def test_labeler_iou_fpointnet_quirk():
    """fpointnet footprint lives in (x, z): shifting a box along *y* must change
    iou3d (vertical axis there) but leave iou2d untouched; shifting along z
    changes the footprint."""
    a = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=np.float32)
    b_y = a.copy()
    b_y[0, 1] += 0.5  # y shift
    iou3d, iou2d = I.labeler_box3d_iou(a, b_y)
    np.testing.assert_allclose(float(iou2d[0]), 1.0, atol=1e-4)
    assert float(iou3d[0]) < 0.9

    b_z = a.copy()
    b_z[0, 2] += 0.5  # z shift moves the fpointnet "footprint"
    _, iou2d_z = I.labeler_box3d_iou(a, b_z)
    assert float(iou2d_z[0]) < 1.0


def test_compute_box3d_iou_shapes():
    rng = np.random.RandomState(7)
    bs = 6
    center = rng.randn(bs, 3).astype(np.float32)
    hl = rng.randn(bs, 12).astype(np.float32)
    hr = rng.randn(bs, 12).astype(np.float32) * 0.1
    sl = rng.randn(bs, 3).astype(np.float32)
    sr = rng.randn(bs, 3, 3).astype(np.float32) * 0.1
    hcl = rng.randint(0, 12, bs)
    hrl = rng.randn(bs).astype(np.float32) * 0.1
    scl = rng.randint(0, 3, bs)
    srl = rng.randn(bs, 3).astype(np.float32) * 0.1
    iou2d, iou3d = I.compute_box3d_iou(
        center, hl, hr, sl, sr, center, hcl, hrl, scl, srl
    )
    assert iou2d.shape == (bs,)
    assert iou3d.shape == (bs,)
    # identical decoded pred vs label when logits argmax == label and residuals match
    hl_exact = np.eye(12)[hcl] * 10.0
    hr_exact = np.tile(hrl[:, None], (1, 12))
    sl_exact = np.eye(3)[scl] * 10.0
    sr_exact = np.tile(srl[:, None, :], (1, 3, 1))
    iou2d_e, iou3d_e = I.compute_box3d_iou(
        center,
        hl_exact,
        hr_exact,
        sl_exact,
        sr_exact,
        center,
        hcl,
        hrl,
        scl,
        srl,
    )
    np.testing.assert_allclose(np.asarray(iou3d_e), 1.0, atol=1e-3)

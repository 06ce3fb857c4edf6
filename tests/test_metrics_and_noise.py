"""Tests: detection AP/APH evaluator, per-object noise aug, BEV maps, registries."""

import numpy as np
import pytest


def _gt():
    return {
        "tok0": {
            "boxes": np.array(
                [[0, 0, 0, 4.8, 1.8, 1.5, 0.3], [10, 5, 0, 4.8, 1.8, 1.5, -0.5]]
            ),
            "labels": np.array([0, 0]),
            "num_points": np.array([50, 50]),
        }
    }


def test_ap_perfect_detections():
    from tdal.utils.detection_metrics import evaluate_detection

    gt = _gt()
    det = {
        "tok0": {
            "boxes": gt["tok0"]["boxes"].copy(),
            "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0]),
        }
    }
    m = evaluate_detection(det, gt)
    assert m["VEHICLE_AP"] == pytest.approx(1.0, abs=1e-6)
    assert m["VEHICLE_APH"] == pytest.approx(1.0, abs=1e-3)


def test_ap_false_positive_and_heading_penalty():
    from tdal.utils.detection_metrics import evaluate_detection

    gt = _gt()
    boxes = gt["tok0"]["boxes"].copy()
    boxes[1, 6] += np.pi  # opposite heading on the second match
    det = {
        "tok0": {
            "boxes": np.vstack([boxes, [[50, 50, 0, 4.8, 1.8, 1.5, 0.0]]]),
            "scores": np.array([0.9, 0.8, 0.7]),
            "labels": np.array([0, 0, 0]),
        }
    }
    m = evaluate_detection(det, gt)
    assert 0.5 < m["VEHICLE_AP"] <= 1.0  # FP after both TPs barely hurts AP
    assert m["VEHICLE_APH"] < m["VEHICLE_AP"]  # heading flip penalizes APH


def test_detections_to_eval_format_roundtrip():
    from tdal.utils.detection_metrics import detections_to_eval_format

    det = {
        "t": {
            "box3d_lidar": np.array([[1, 2, 3, 1.8, 4.8, 1.5, -0.3 - np.pi / 2]]),
            "scores": np.array([0.5]),
            "label_preds": np.array([0]),
        }
    }
    out = detections_to_eval_format(det)
    np.testing.assert_allclose(out["t"]["boxes"][0, 3:6], [4.8, 1.8, 1.5])
    np.testing.assert_allclose(out["t"]["boxes"][0, 6], 0.3, atol=1e-9)


def test_noise_per_object_moves_box_and_points():
    from tdal.data.object_noise import noise_per_object

    rng = np.random.default_rng(0)
    boxes = np.array(
        [[0, 0, 0, 1.8, 4.8, 1.5, 0, 0, 0.0], [30, 30, 0, 1.8, 4.8, 1.5, 0, 0, 0.0]]
    )
    pts = np.array([[0.5, 0.5, 0.0], [30.2, 30.1, 0.0], [100.0, 100.0, 0.0]])
    nb, npnts = noise_per_object(boxes.copy(), pts.copy(), rng, center_noise_std=0.5)
    # boxes moved
    assert np.linalg.norm(nb[:, :3] - boxes[:, :3]) > 0
    # object points moved with their boxes, background point untouched
    assert np.linalg.norm(npnts[0] - pts[0]) > 0
    np.testing.assert_allclose(npnts[2], pts[2])
    # relative offset preserved approximately: point 0 moved by the same translation
    # as box 0 plus rotation about its center
    assert np.linalg.norm(npnts[0, :2] - nb[0, :2]) <= 1.2


def test_points_to_bev():
    from tdal.data.object_noise import points_to_bev

    pts = np.array([[0.5, 0.5, 1.0], [0.6, 0.6, 2.0], [-100, 0, 0]])
    bev = points_to_bev(pts, [-2, -2, -1, 2, 2, 3], [1.0, 1.0])
    assert bev.shape == (4, 4, 2)
    assert bev[2, 2, 0] == 1.0  # occupancy at (0.5, 0.5)
    assert bev[2, 2, 1] == 2.0  # max height
    assert bev[..., 0].sum() == 1.0  # out-of-range dropped


def test_registries_populated():
    import tdal.models  # noqa: F401
    from tdal.runtime.registry import DETECTORS, HEADS, LABELERS, NECKS, build_from_cfg

    assert {"PointPillars", "VoxelNet"} <= set(DETECTORS.module_dict)
    assert "CenterHead" in HEADS.module_dict
    assert "RPN" in NECKS.module_dict
    model = build_from_cfg({"type": "one_box_est", "n_object_points": 64}, LABELERS)
    assert model.n_object_points == 64


def test_box_corners_3d_axis_aligned():
    from tdal.utils.visualize import box_corners_3d

    corners = box_corners_3d([1.0, 2.0, 0.5, 4.0, 2.0, 1.0, 0.0])
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[:, 0].min(), -1.0)  # x - l/2
    np.testing.assert_allclose(corners[:, 0].max(), 3.0)
    np.testing.assert_allclose(corners[:, 1].min(), 1.0)
    np.testing.assert_allclose(corners[:, 2].max(), 1.0)
    # yaw rotation preserves the center
    rot = box_corners_3d([1.0, 2.0, 0.5, 4.0, 2.0, 1.0, 0.7])
    np.testing.assert_allclose(rot.mean(0), [1.0, 2.0, 0.5], atol=1e-12)


def test_show_open3d_gated():
    import pytest

    from tdal.utils.visualize import show_open3d, show_track_open3d

    try:
        import open3d  # noqa: F401

        pytest.skip("open3d installed")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        show_open3d(np.zeros((4, 3)))
    with pytest.raises(ImportError):
        show_track_open3d({"point": [np.zeros((2, 3))], "bbox": [np.zeros(7)]})
    from tdal.utils.visualize import show_sequence_open3d

    with pytest.raises(ImportError):
        show_sequence_open3d([{"points": np.zeros((4, 3)), "sets": []}])

"""Augmentation convention tests: points-in-box membership is preserved under the
global flip/rotation/scaling transforms (they move boxes and points consistently,
including the detector-convention heading math)."""

import numpy as np

from tdal.data.detection import global_rotation, global_scaling_v2, random_flip_both
from tdal.data.waymo_schema import points_in_rbbox_np


def _geo_box7(det_boxes):
    """detector convention [x,y,z,w,l,h,vx,vy,rot] -> geometric [x,y,z,l,w,h,yaw]."""
    g = det_boxes[:, [0, 1, 2, 4, 3, 5, 8]].copy()
    g[:, 6] = -np.pi / 2 - det_boxes[:, 8]
    return g


def _membership(boxes, points):
    return points_in_rbbox_np(points, _geo_box7(boxes)).sum(axis=0)


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((3, 9))
    boxes[:, :2] = rng.uniform(-20, 20, (3, 2))
    boxes[:, 3:6] = [[1.8, 4.8, 1.5]] * 3
    boxes[:, 8] = rng.uniform(-np.pi, np.pi, 3)
    pts = []
    for b in _geo_box7(boxes):
        local = (rng.random((50, 3)) - 0.5) * b[3:6] * 0.9
        c, s = np.cos(b[6]), np.sin(b[6])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        pts.append(local @ rot.T + b[:3])
    pts.append(rng.uniform(-30, 30, (100, 3)))
    return boxes, np.concatenate(pts)


def test_flip_preserves_membership():
    rng = np.random.default_rng(1)
    for seed in range(3):
        boxes, pts = _setup(seed)
        before = _membership(boxes, pts)
        b2, p2 = random_flip_both(boxes.copy(), pts.copy(), rng, probability=1.0)
        np.testing.assert_array_equal(_membership(b2, p2), before)


def test_rotation_preserves_membership():
    rng = np.random.default_rng(2)
    boxes, pts = _setup(1)
    before = _membership(boxes, pts)
    b2, p2 = global_rotation(boxes.copy(), pts.copy(), rng, rotation=(0.4, 0.4))
    np.testing.assert_array_equal(_membership(b2, p2), before)


def test_scaling_preserves_membership():
    rng = np.random.default_rng(3)
    boxes, pts = _setup(2)
    before = _membership(boxes, pts)
    b2, p2 = global_scaling_v2(boxes.copy(), pts.copy(), rng, 1.04, 1.04)
    np.testing.assert_array_equal(_membership(b2, p2), before)


def test_train_split_trackdata_shards(tmp_path):
    """create_pd_detection on a 'train' path applies the ratio and 16-way shard
    (waymo_common.py:77-80, 208-218)."""
    from tdal.data.synthetic import make_synthetic_dataset
    from tdal.data.waymo_schema import reorganize_info
    from tdal.pipeline.track_extraction import create_pd_detection

    infos, scenes = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=8, seed=4,
        points_per_object=64, n_background=128,
    )
    info_map = reorganize_info(infos)
    detections = {}
    for token in info_map:
        detections[token] = {
            "box3d_lidar": np.array([[1.0, 2.0, 0.5, 1.8, 4.8, 1.5, 0.3]]),
            "scores": np.array([0.9]),
            "label_preds": np.array([0]),
            "tracking_ids": np.array([7]),
        }
    out = tmp_path / "train"
    det_annos, trackData = create_pd_detection(
        detections, info_map, out, tracking=True, ratio=0.5, split=4
    )
    # ratio 0.5 of 8 frames -> 4 frames processed
    assert len(det_annos) == 4
    shards = sorted(out.glob("trackData_*.pkl"))
    assert len(shards) == 4

"""NuScenes dataset + info-builder tests on fabricated data (no devkit).

The info builder's geometry is pure numpy, so a stub object implementing the
NuScenes accessor protocol (get / get_sample_data_path / box_velocity / .scene /
.sample) exercises the real code path end-to-end: stub DB -> infos ->
NuScenesDataset items -> results json round trip.
"""

import json

import numpy as np
import pytest

from tdal.data.nuscenes import (
    NuScenesDataset,
    _fill_trainval_infos,
    class_balanced_resample,
    quaternion_yaw,
    transform_matrix,
    write_nusc_results_json,
)


def _yaw_quat(yaw):
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


class StubNusc:
    """Minimal NuScenes DB: one scene, n_samples keyframes, one prev sweep each."""

    def __init__(self, root, n_samples=3, n_annos=2, seed=0):
        rng = np.random.default_rng(seed)
        self.root = root
        self._tables = {"sample_data": {}, "ego_pose": {}, "calibrated_sensor": {},
                        "sample_annotation": {}, "sample": {}}
        self.sample = []
        self.scene = [{"token": "scene0", "name": "scene-0001",
                       "first_sample_token": "samp0"}]
        cs_tok = "cs0"
        self._tables["calibrated_sensor"][cs_tok] = {
            "translation": [0.9, 0.0, 1.8],
            "rotation": _yaw_quat(0.1).tolist(),
        }
        prev_tok = ""
        for i in range(n_samples):
            samp_tok, sd_tok, sweep_tok = f"samp{i}", f"sd{i}", f"sw{i}"
            # keyframe pose + a sweep 50ms earlier with a slightly different pose
            for tok, dt in ((sweep_tok, 0.05), (sd_tok, 0.0)):
                pose_tok = f"pose_{tok}"
                self._tables["ego_pose"][pose_tok] = {
                    "translation": [5.0 * (i - dt), 0.1 * i, 0.0],
                    "rotation": _yaw_quat(0.02 * i).tolist(),
                }
                ts = int((100.0 + i * 0.5 - dt) * 1e6)
                self._tables["sample_data"][tok] = {
                    "token": tok,
                    "timestamp": ts,
                    "ego_pose_token": pose_tok,
                    "calibrated_sensor_token": cs_tok,
                    "prev": prev_tok if tok == sweep_tok else sweep_tok,
                }
                # write a .bin point file for each sample_data
                pts = rng.uniform(-20, 20, (512, 5)).astype(np.float32)
                pts.tofile(str(root / f"{tok}.bin"))
            prev_tok = sd_tok
            anns = []
            for k in range(n_annos):
                tok = f"anno{i}_{k}"
                anns.append(tok)
                self._tables["sample_annotation"][tok] = {
                    "translation": [10.0 + 2 * k + 5.0 * i, 1.0 + k, 0.5],
                    "size": [1.9, 4.6, 1.6],  # (w, l, h)
                    "rotation": _yaw_quat(0.3 + 0.1 * k).tolist(),
                    "category_name": "vehicle.car" if k == 0 else
                                     "human.pedestrian.adult",
                    "num_lidar_pts": 5 if k == 0 else 0,
                    "num_radar_pts": 0,
                }
            rec = {"token": samp_tok, "scene_token": "scene0",
                   "data": {"LIDAR_TOP": sd_tok}, "anns": anns,
                   "timestamp": self._tables["sample_data"][sd_tok]["timestamp"]}
            self._tables["sample"][samp_tok] = rec
            self.sample.append(rec)

    def get(self, table, token):
        return self._tables[table][token]

    def get_sample_data_path(self, token):
        return str(self.root / f"{token}.bin")

    def box_velocity(self, anno_token):
        return np.array([1.0, 0.5, 0.0])


def test_transform_matrix_roundtrip():
    t, q = [1.0, 2.0, 3.0], _yaw_quat(0.7)
    fwd = transform_matrix(t, q)
    inv = transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)
    assert quaternion_yaw(q) == pytest.approx(0.7)


def test_fill_trainval_infos(tmp_path):
    nusc = StubNusc(tmp_path)
    train, val = _fill_trainval_infos(nusc, {"scene0"}, set(), nsweeps=3)
    assert len(train) == 3 and len(val) == 0
    info = train[1]
    assert len(info["sweeps"]) == 2
    # first sweep is the prev sample_data with a real transform
    sw = info["sweeps"][0]
    assert sw["transform_matrix"] is not None and sw["time_lag"] > 0
    # gt: filter_zero drops the 0-point pedestrian
    assert info["gt_boxes"].shape == (1, 9)
    assert list(info["gt_names"]) == ["car"]
    # -yaw - pi/2 convention, sensor-frame yaw = anno_yaw - pose_yaw - cs_yaw
    expected_yaw = 0.3 - 0.02 * 1 - 0.1
    assert info["gt_boxes"][0, 8] == pytest.approx(-expected_yaw - np.pi / 2, abs=1e-6)
    # sensor-frame center: rigid transforms preserve the box<->sensor distance.
    g_center = np.array([15.0, 1.0, 0.5])  # anno i=1, k=0 global translation
    pose_t = np.array([5.0, 0.1, 0.0])
    cs_t = np.array([0.9, 0.0, 1.8])
    sensor_origin_global = pose_t + transform_matrix(pose_t.tolist(), _yaw_quat(0.02))[:3, :3] @ cs_t
    assert np.linalg.norm(info["gt_boxes"][0, :3]) == pytest.approx(
        np.linalg.norm(g_center - sensor_origin_global), abs=1e-9
    )


def test_fill_infos_no_filter_keeps_all(tmp_path):
    nusc = StubNusc(tmp_path)
    train, _ = _fill_trainval_infos(nusc, {"scene0"}, set(), nsweeps=2,
                                    filter_zero=False)
    assert train[0]["gt_boxes"].shape == (2, 9)
    assert set(train[0]["gt_names"]) == {"car", "pedestrian"}


def test_first_sample_sweep_fallback(tmp_path):
    """The first keyframe has no prev chain long enough: duplicate-last fallback."""
    nusc = StubNusc(tmp_path)
    train, _ = _fill_trainval_infos(nusc, {"scene0"}, set(), nsweeps=4)
    sweeps = train[0]["sweeps"]
    assert len(sweeps) == 3
    assert sweeps[-1] == sweeps[-2]  # duplicated once the chain ran out


def test_dataset_items_from_stub_infos(tmp_path):
    from tdal.core.targets import AssignerConfig
    from tdal.core.voxel import VoxelConfig

    nusc = StubNusc(tmp_path)
    train, _ = _fill_trainval_infos(nusc, {"scene0"}, set(), nsweeps=3)
    tasks = [dict(num_class=1, class_names=["car"])]
    vox = VoxelConfig((-50, -50, -5, 50, 50, 3), (0.25, 0.25, 8.0), 10, 4000)
    ds = NuScenesDataset(
        train, ["car"], AssignerConfig(tasks=tasks, out_size_factor=4, max_objs=50),
        vox, mode="train", nsweeps=3, resample=False, max_points=4096,
    )
    item = ds[0]
    pts = item["points"]
    assert pts.shape[1] == 5  # xyzi + time channel
    finite = np.isfinite(pts[:, 4])
    assert np.unique(pts[finite][:, 4]).size >= 2  # >1 distinct sweep time lag


def test_cbgs_resample_balances():
    rng = np.random.default_rng(0)
    infos = [{"gt_names": ["car"]} for _ in range(90)] + [
        {"gt_names": ["bicycle"]} for _ in range(10)
    ]
    out = class_balanced_resample(infos, ["car", "bicycle"], rng)
    names = [i["gt_names"][0] for i in out]
    # duplication factor pushes the rare class toward parity
    assert names.count("bicycle") >= 30


def test_results_json_roundtrip(tmp_path):
    det = {
        "tok0": {
            "box3d_lidar": np.array([[1, 2, 0.5, 4.6, 1.9, 1.6, 0.5, 0.1, 0.3]]),
            "scores": np.array([0.9]),
            "label_preds": np.array([0]),
        }
    }
    p = write_nusc_results_json(det, None, tmp_path / "res.json", ["car"])
    data = json.loads(open(p).read())
    row = data["results"]["tok0"][0]
    assert row["detection_name"] == "car"
    assert row["size"] == [1.9, 4.6, 1.6]  # (w, l, h)
    assert row["velocity"] == [0.5, 0.1]

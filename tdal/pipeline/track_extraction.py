"""Prediction writing + per-object track-data extraction (pipeline stages 2b/2c).

Capability parity with reference ``det3d/datasets/waymo/waymo_common.py``:
- ``convert_detection_to_global_box``  ~ tools/waymo_tracking/test.py:201-249
- ``create_pd_detection``              ~ waymo_common._create_pd_detection (:67-231):
  detector->Waymo convention flip, det_annos + metrics_pb2 proto emission (gated on
  the optional waymo_open_dataset devkit), per-box point cropping into global frame,
  GT matching by 3D IoU > 0.75 cached per track id, trackData pickles (16-way train
  sharding).

TPU-native hot path: the per-frame point-in-box crop and det-vs-GT IoU matrix run as
ONE jit'd call on fixed-size padded buffers (tdal.core.geometry/iou) instead of the
reference's per-box numba crop + per-box CUDA IoU (waymo_common.py:168-188).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np

from tdal.data.waymo_schema import AnnoStore, load_pickle

LABEL_TO_TYPE = {0: 1, 1: 2, 2: 4}  # det label -> waymo proto type (veh, ped, cyc)
LABEL2NAME = {0: "Vehicle", 1: "Pedestrian", 2: "Cyclist"}
TRACK_NAMES = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]


def label_to_name(label: int) -> str:
    return TRACK_NAMES[int(label)]


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


_crop_and_match_impl = None


def _crop_and_match_jax(points, det_boxes, gt_boxes):
    # Module-level jit cache: a fresh jit object per call would recompile for every
    # frame (measured ~1s/frame of pure compilation).
    global _crop_and_match_impl
    if _crop_and_match_impl is None:
        import jax

        def impl(points, det_boxes, gt_boxes):
            from tdal.core.geometry import points_in_rbbox
            from tdal.core.iou import boxes_iou_3d

            inside = points_in_rbbox(points, det_boxes)  # (N, D)
            iou = boxes_iou_3d(det_boxes, gt_boxes)  # (D, G)
            return inside, iou

        _crop_and_match_impl = jax.jit(impl)
    return _crop_and_match_impl(points, det_boxes, gt_boxes)


def sort_detections_by_token(ret_list: List[dict]) -> List[dict]:
    """Order frames by (sequence, frame) parsed from the token filename.

    Parity: tools/waymo_tracking/test.py:184-199."""
    def key(det):
        f = det["token"]
        seq_id = int(f.split("_")[1])
        frame_id = int(f.split("_")[3][: -4])
        return seq_id * 1000 + frame_id

    return sorted(ret_list, key=key)


def convert_detection_to_global_box(detections: Dict[str, dict], infos: Dict[str, dict], annos: AnnoStore):
    """Per-frame detections (vehicle frame, detector convention) -> global-frame box
    dicts for the tracker. Parity: waymo_tracking/test.py:201-249."""
    ret_list = []
    detection_results = {}
    for token in infos.keys():
        if token not in detections:
            continue
        detection = detections[token]
        detection_results[token] = {
            k: np.asarray(v) for k, v in detection.items()
        }
        pose = annos.pose(token)
        box3d = np.array(detection["box3d_lidar"], np.float64)
        labels = np.asarray(detection["label_preds"])
        scores = np.asarray(detection["scores"])
        if box3d.shape[1] == 7:  # no velocity head: pad zeros
            box3d = np.concatenate(
                [box3d[:, :6], np.zeros((len(box3d), 2)), box3d[:, 6:]], axis=1
            )
        else:
            box3d = box3d[:, [0, 1, 2, 3, 4, 5, 6, 7, 8]]
        # detector (KITTI) -> Waymo convention (test.py:219-220)
        box3d[:, -1] = -box3d[:, -1] - np.pi / 2
        box3d[:, [3, 4]] = box3d[:, [4, 3]]
        # to global, velocity rotated (test.py:150-172)
        heading = box3d[:, -1] + np.arctan2(pose[1, 0], pose[0, 0])
        center = box3d[:, :3] @ pose[:3, :3].T + pose[:3, 3]
        vel = np.concatenate(
            [box3d[:, 6:8], np.zeros((len(box3d), 1))], axis=1
        ) @ pose[:3, :3].T
        anno_list = [
            {
                "translation": center[i],
                "velocity": vel[i, :2],
                "detection_name": label_to_name(labels[i]),
                "score": float(scores[i]),
                "box_id": i,
            }
            for i in range(len(box3d))
        ]
        ret_list.append(
            {
                "token": token,
                "frame_id": int(token.split("_")[3][:-4]),
                "global_boxs": anno_list,
                "timestamp": infos[token]["timestamp"],
            }
        )
    return sort_detections_by_token(ret_list), detection_results


def run_tracking(global_preds, detection_results, max_age=3, max_dist=None, score_thresh=0.75):
    """Sequential tracking over sorted frames. Parity: waymo_tracking/test.py:88-134.

    Returns (predictions {token: {box3d_lidar, label_preds, scores, tracking_ids}},
    id_count)."""
    from tdal.pipeline.tracker import GreedyTracker

    max_dist = max_dist or {"VEHICLE": 0.8, "PEDESTRIAN": 0.4, "CYCLIST": 0.6}
    tracker = GreedyTracker(max_age=max_age, max_dist=max_dist, score_thresh=score_thresh)
    predictions = {}
    last_time_stamp = 0.0
    for pred in global_preds:
        token = pred["token"]
        if pred["frame_id"] == 0:
            tracker.reset()
            last_time_stamp = pred["timestamp"]
        time_lag = pred["timestamp"] - last_time_stamp
        last_time_stamp = pred["timestamp"]
        outputs = tracker.step(pred["global_boxs"], time_lag)
        box_ids, tracking_ids = [], []
        for item in outputs:
            if item["active"] == 0:
                continue
            box_ids.append(item["box_id"])
            tracking_ids.append(item["tracking_id"])
        det = detection_results[token]
        sel = np.asarray(box_ids, np.int64)
        predictions[token] = {
            "tracking_ids": np.asarray(tracking_ids),
            "box3d_lidar": det["box3d_lidar"][sel],
            "label_preds": det["label_preds"][sel],
            "scores": det["scores"][sel],
        }
    return predictions, tracker.id_count


def create_pd_detection(
    detections: Dict[str, dict],
    infos: Dict[str, dict],
    result_path: str | os.PathLike,
    tracking: bool = False,
    ratio: float = 0.25,
    split: int = 16,
    logger=None,
):
    """Write det_annos.pkl (+ trackData pickles + metrics proto bin when available).

    Parity: waymo_common._create_pd_detection (:67-231); 'train' in result_path takes
    the first `ratio` of frames and shards trackData `split` ways."""
    import jax.numpy as jnp

    result_path = Path(result_path)
    result_path.mkdir(parents=True, exist_ok=True)
    annos = AnnoStore(infos)

    try:
        from waymo_open_dataset import label_pb2  # type: ignore
        from waymo_open_dataset.protos import metrics_pb2  # type: ignore

        objects = metrics_pb2.Objects()
        have_proto = True
    except Exception:
        objects = None
        have_proto = False
        proto_rows = []

    matching: Dict = {}
    trackData: Dict[str, dict] = {}
    det_annos = []

    items = list(detections.items())
    if "train" in str(result_path):
        items = items[: int(len(items) * ratio)]

    for token, detection in items:
        entry = annos.get(token)
        obj = entry["annos"]
        pose = entry["pose"]
        gt_box9 = np.array([o["box"] for o in obj["objects"]], np.float64).reshape(-1, 9)
        gt_box7 = gt_box9[:, [0, 1, 2, 3, 4, 5, 8]] if gt_box9.size else np.zeros((0, 7))
        lidars = load_pickle(infos[token]["path"])["lidars"]["points_xyz"]

        box3d = np.array(detection["box3d_lidar"], np.float64)
        scores = np.asarray(detection["scores"])
        labels = np.asarray(detection["label_preds"])
        # detector (KITTI) -> Waymo convention (waymo_common.py:106-111)
        if len(box3d):
            box3d[:, -1] = -box3d[:, -1] - np.pi / 2
            box3d = box3d[:, [0, 1, 2, 4, 3, 5, -1]]
        else:
            box3d = np.zeros((0, 7))

        frame_id = obj["frame_id"]
        det_annos.append(
            {
                "name": np.array([LABEL2NAME[int(i)] for i in labels]),
                "score": np.asarray(scores),
                "boxes_lidar": box3d.copy(),
                "frame_id": f"segment-{obj['scene_name']}_with_camera_labels_{frame_id:03d}",
                "metadata": {
                    "context_name": obj["scene_name"],
                    "timestamp_micros": int(str(infos[token]["timestamp"]).replace(".", "")),
                },
            }
        )

        # ---- fixed-shape on-device crop + IoU matching ----
        if len(box3d):
            d_pad = _round_up(len(box3d), 64)
            g_pad = _round_up(max(len(gt_box7), 1), 64)
            n_pad = _round_up(len(lidars), 32768)
            det_b = np.zeros((d_pad, 7)); det_b[: len(box3d)] = box3d
            det_b[len(box3d):, 3:6] = 1e-3  # degenerate padding boxes
            gt_b = np.zeros((g_pad, 7)); gt_b[: len(gt_box7)] = gt_box7
            gt_b[len(gt_box7):, 3:6] = 1e-3
            pts = np.full((n_pad, 3), 1e9); pts[: len(lidars)] = lidars
            inside, iou = _crop_and_match_jax(
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(det_b, jnp.float32),
                jnp.asarray(gt_b, jnp.float32),
            )
            inside = np.asarray(inside)[: len(lidars), : len(box3d)]
            iou = np.asarray(iou)[: len(box3d), : len(gt_box7)]
        else:
            inside = np.zeros((len(lidars), 0), bool)
            iou = np.zeros((0, len(gt_box7)))

        tracking_ids = detection.get("tracking_ids")
        td = {k: [] for k in ("id", "type", "bbox", "score", "point", "match")}
        # Single-pass crop split: transform all points to global once, then slice
        # per box from one nonzero pass (vs per-box boolean indexing over the full
        # cloud, waymo_common.py:168-171).
        lidars_global = lidars @ pose[:3, :3].T + pose[:3, 3]
        box_ids, pt_ids = np.nonzero(inside.T)
        split_at = np.searchsorted(box_ids, np.arange(1, len(box3d)))
        crops = np.split(lidars_global[pt_ids], split_at)
        for i in range(len(box3d)):
            det = box3d[i]
            obj_id = (
                str(int(tracking_ids[i])) if tracking_ids is not None else f"{token}_{i}"
            )
            if have_proto:
                o = metrics_pb2.Object()
                o.context_name = obj["scene_name"]
                o.frame_timestamp_micros = int(obj["frame_name"].split("_")[-1])
                box = label_pb2.Label.Box()
                box.center_x, box.center_y, box.center_z = det[:3]
                box.length, box.width, box.height = det[3:6]
                box.heading = det[-1]
                o.object.box.CopyFrom(box)
                o.score = float(scores[i])
                o.object.type = LABEL_TO_TYPE[int(labels[i])]
                if tracking:
                    o.object.id = obj_id
                objects.objects.append(o)
            else:
                proto_rows.append(
                    dict(context_name=obj["scene_name"],
                         frame_timestamp_micros=int(obj["frame_name"].split("_")[-1]),
                         box=det.tolist(), score=float(scores[i]),
                         type=LABEL_TO_TYPE[int(labels[i])],
                         id=obj_id if tracking else None)
                )

            # point crop -> global frame (waymo_common.py:168-171)
            pts_o = crops[i]

            # GT matching cached per track id (waymo_common.py:173-188)
            if obj_id in matching:
                match = matching[obj_id]
            elif iou.shape[1]:
                best = int(np.argmax(iou[i]))
                if iou[i, best] > 0.75:
                    match = obj["objects"][best]["name"]
                    matching[obj_id] = match
                else:
                    match = None
            else:
                match = None

            td["id"].append(obj_id)
            td["type"].append(LABEL_TO_TYPE[int(labels[i])])
            td["bbox"].append(
                _transform_box7(det, pose)
            )
            td["score"].append(float(scores[i]))
            td["point"].append(pts_o)
            td["match"].append(match)
        trackData[token] = td

    with open(result_path / "det_annos.pkl", "wb") as f:
        pickle.dump(det_annos, f)
    if logger:
        logger.info(f"Saved det_annos.pkl ({len(det_annos)} frames)")

    if tracking:
        if "train" in str(result_path):
            td_list = list(trackData.items())
            for i in range(split):
                shard = dict(
                    td_list[len(td_list) * i // split : len(td_list) * (i + 1) // split]
                )
                with open(result_path / f"trackData_{i}.pkl", "wb") as f:
                    pickle.dump(shard, f)
        else:
            with open(result_path / "trackData.pkl", "wb") as f:
                pickle.dump(trackData, f)

    bin_name = "tracking_pred.bin" if tracking else "detection_pred.bin"
    if have_proto:
        with open(result_path / bin_name, "wb") as f:
            f.write(objects.SerializeToString())
    else:
        with open(result_path / (bin_name + ".pkl"), "wb") as f:
            pickle.dump(proto_rows, f)
        if logger:
            logger.info(
                "waymo_open_dataset devkit not available - wrote pickle fallback "
                f"{bin_name}.pkl (schema-equivalent rows)"
            )
    return det_annos, trackData


def _transform_box7(box7: np.ndarray, pose: np.ndarray) -> np.ndarray:
    heading = box7[-1] + np.arctan2(pose[1, 0], pose[0, 0])
    center = box7[:3] @ pose[:3, :3].T + pose[:3, 3]
    return np.concatenate([center, box7[3:6], [heading]])


CAT_NAME_TO_ID = {"VEHICLE": 1, "PEDESTRIAN": 2, "SIGN": 3, "CYCLIST": 4}
TYPE_NAMES = ["UNKNOWN", "VEHICLE", "PEDESTRIAN", "SIGN", "CYCLIST"]


def create_gt_detection(infos: List[dict], result_path, logger=None):
    """Write gt_preds.bin (GT boxes as a metrics proto, score 1, id = object name)
    for local devkit evaluation. Parity: waymo_common._create_gt_detection
    (:233-290); pickle fallback without the devkit."""
    result_path = Path(result_path)
    result_path.mkdir(parents=True, exist_ok=True)
    try:
        from waymo_open_dataset import label_pb2  # type: ignore
        from waymo_open_dataset.protos import metrics_pb2  # type: ignore

        objects = metrics_pb2.Objects()
        have_proto = True
    except Exception:
        objects = None
        have_proto = False
        rows = []

    for info in infos:
        obj = load_pickle(info["anno_path"])
        annos = obj["objects"]
        if not annos:
            continue
        num_points = np.array([a["num_points"] for a in annos])
        box3d = np.array([a["box"] for a in annos], np.float64)[:, [0, 1, 2, 3, 4, 5, -1]]
        names = [TYPE_NAMES[a["label"]] for a in annos]
        for i in range(len(box3d)):
            if num_points[i] == 0 or names[i] == "UNKNOWN":
                continue
            det = box3d[i]
            if have_proto:
                o = metrics_pb2.Object()
                o.context_name = obj["scene_name"]
                o.frame_timestamp_micros = int(obj["frame_name"].split("_")[-1])
                box = label_pb2.Label.Box()
                box.center_x, box.center_y, box.center_z = det[:3]
                box.length, box.width, box.height = det[3:6]
                box.heading = det[-1]
                o.object.box.CopyFrom(box)
                o.score = 1.0
                o.object.type = CAT_NAME_TO_ID[names[i]]
                o.object.num_lidar_points_in_box = int(num_points[i])
                o.object.id = annos[i]["name"]
                objects.objects.append(o)
            else:
                rows.append(
                    dict(context_name=obj["scene_name"],
                         frame_timestamp_micros=int(obj["frame_name"].split("_")[-1]),
                         box=det.tolist(), score=1.0,
                         type=CAT_NAME_TO_ID[names[i]],
                         num_lidar_points_in_box=int(num_points[i]),
                         id=annos[i]["name"])
                )
    if have_proto:
        with open(result_path / "gt_preds.bin", "wb") as f:
            f.write(objects.SerializeToString())
    else:
        with open(result_path / "gt_preds.bin.pkl", "wb") as f:
            pickle.dump(rows, f)
        if logger:
            logger.info("devkit absent - wrote gt_preds.bin.pkl fallback")

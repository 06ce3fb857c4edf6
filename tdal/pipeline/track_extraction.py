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
CHUNK_FRAMES = 8  # frames batched per device call (amortizes ~5ms/transfer)


def _crop_and_match_jax(points, det_boxes, gt_boxes):
    """Batched crop + IoU: points (F, N, 3), det (F, D, 7), gt (F, G, 7) ->
    (packed (F, D*N/8) uint8, counts (F, D) int32, iou (F, D, G)).

    `packed` is the inside matrix bit-packed box-major (packbits of
    inside.T.ravel()): 8x less device->host traffic than the bool matrix
    (host fetches through the axon tunnel run at ~170 MB/s with ~5ms latency
    each, which dominated this stage at 194+ ms/frame), and the host decodes
    it sparsely (_decode_packed_nonzero) instead of np.nonzero over 4M bools.
    Device-side index compaction (jnp.nonzero with size=) was tried and is
    ~250ms/chunk on TPU — the packbits + sparse host decode is the fast path."""
    global _crop_and_match_impl
    if _crop_and_match_impl is None:
        import jax
        import jax.numpy as jnp

        def impl(points, det_boxes, gt_boxes):
            from tdal.core.geometry import points_in_rbbox
            from tdal.core.iou import boxes_iou_3d

            def one(pts, det, gt):
                inside = points_in_rbbox(pts, det)  # (N, D)
                iou = boxes_iou_3d(det, gt)  # (D, G)
                counts = inside.sum(axis=0).astype(jnp.int32)  # (D,)
                packed = jnp.packbits(inside.T.reshape(-1))  # box-major bits
                return packed, counts, iou

            return jax.vmap(one)(points, det_boxes, gt_boxes)

        _crop_and_match_impl = jax.jit(impl)
    return _crop_and_match_impl(points, det_boxes, gt_boxes)


def _decode_packed_nonzero(packed: np.ndarray) -> np.ndarray:
    """Sorted flat indices of the set bits of a packbits() array.

    Host-side sparse decode: nonzero over BYTES first (~1/100 the work of
    unpacking 4M bools), then expand bits only for the hit bytes."""
    nzb = np.flatnonzero(packed)
    if not len(nzb):
        return np.zeros((0,), np.int64)
    bits = np.unpackbits(packed[nzb]).reshape(-1, 8).astype(bool)
    offs = nzb[:, None] * 8 + np.arange(8)[None, :]
    return offs[bits]


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
    match_iou: float = 0.75,
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

    def emit_chunk(frames, packed_b=None, counts_b=None, iou_b=None):
        """Host emit phase for one fetched chunk. Device outputs are None on
        the tracking=False fast path (no crops/matching consumers)."""
        for fi in range(len(frames)):
            token, detection, entry, gt_box7, lidars, box3d = frames[fi]
            obj = entry["annos"]
            pose = entry["pose"]
            scores = np.asarray(detection["scores"])
            labels = np.asarray(detection["label_preds"])

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

            if packed_b is None:
                # tracking=False fast path: det_annos + proto rows only, and
                # neither consumes crops or IoU matching (the trackData dict
                # built below is discarded). The reference computes crops here
                # anyway (waymo_common.py:168-194) — pure waste skipped.
                crops = [np.zeros((0, 3))] * len(box3d)
                iou = np.zeros((len(box3d), 0))
            else:
                counts = counts_b[fi, : len(box3d)]
                iou = iou_b[fi, : len(box3d), : len(gt_box7)]
                n_pad = packed_b.shape[1] * 8 // max(counts_b.shape[1], 1)
                lidars_global = lidars @ pose[:3, :3].T + pose[:3, 3]
                # box-major bits: any padding-box bits sort after all real
                # boxes, so truncating at the real total drops them exactly
                flat = _decode_packed_nonzero(packed_b[fi])[: int(counts.sum())]
                pt_ids = flat % n_pad
                split_at = np.cumsum(counts)[:-1]
                crops = np.split(
                    lidars_global[np.minimum(pt_ids, max(len(lidars) - 1, 0))], split_at
                )

            tracking_ids = detection.get("tracking_ids")
            td = {k: [] for k in ("id", "type", "bbox", "score", "point", "match")}
            _emit_frame_boxes(
                box3d, scores, labels, tracking_ids, token, obj, pose, crops,
                iou, matching, td, objects if have_proto else None,
                None if have_proto else proto_rows, tracking, match_iou,
            )
            trackData[token] = td

    # Software pipeline over chunks: dispatch the device call for chunk i,
    # then fetch + emit chunk i-1 while chunk i computes. The fetch is ONE
    # jax.device_get of all three outputs (sequential per-array fetches each
    # pay ~100 ms of tunnel latency; one batched fetch pays it once).
    pending = None  # (frames, device outputs) of the previous chunk
    for chunk_start in range(0, len(items), CHUNK_FRAMES):
        chunk = items[chunk_start : chunk_start + CHUNK_FRAMES]
        # ---- host load phase ----
        frames = []
        for token, detection in chunk:
            entry = annos.get(token)
            obj = entry["annos"]
            gt_box9 = np.array(
                [o["box"] for o in obj["objects"]], np.float64
            ).reshape(-1, 9)
            gt_box7 = (
                gt_box9[:, [0, 1, 2, 3, 4, 5, 8]] if gt_box9.size else np.zeros((0, 7))
            )
            if tracking:
                from tdal.data.frame_cache import read_frame_points

                cached = read_frame_points(infos[token]["path"])
                lidars = (
                    cached[:, :3]
                    if cached is not None
                    else load_pickle(infos[token]["path"])["lidars"]["points_xyz"]
                )
            else:
                lidars = np.zeros((0, 3), np.float32)
            box3d = np.array(detection["box3d_lidar"], np.float64)
            # detector (KITTI) -> Waymo convention (waymo_common.py:106-111)
            if len(box3d):
                box3d[:, -1] = -box3d[:, -1] - np.pi / 2
                box3d = box3d[:, [0, 1, 2, 4, 3, 5, -1]]
            else:
                box3d = np.zeros((0, 7))
            frames.append((token, detection, entry, gt_box7, lidars, box3d))

        if not tracking:
            emit_chunk(frames)
            continue

        # ---- one fixed-shape device call per chunk (crop idx + IoU) ----
        d_pad = _round_up(max(len(f[5]) for f in frames), 64)
        g_pad = _round_up(max(max(len(f[3]) for f in frames), 1), 64)
        n_pad = _round_up(max(len(f[4]) for f in frames), 32768)
        F = len(frames)
        det_b = np.zeros((CHUNK_FRAMES, d_pad, 7), np.float32)
        det_b[..., 3:6] = 1e-3  # degenerate padding boxes
        gt_b = np.zeros((CHUNK_FRAMES, g_pad, 7), np.float32)
        gt_b[..., 3:6] = 1e-3
        pts_b = np.full((CHUNK_FRAMES, n_pad, 3), 1e9, np.float32)
        for fi, (_, _, _, gt_box7, lidars, box3d) in enumerate(frames):
            det_b[fi, : len(box3d)] = box3d
            gt_b[fi, : len(gt_box7)] = gt_box7
            pts_b[fi, : len(lidars)] = lidars
        import jax

        outs = _crop_and_match_jax(
            jax.device_put(pts_b), jax.device_put(det_b), jax.device_put(gt_b)
        )
        if pending is not None:
            emit_chunk(pending[0], *jax.device_get(pending[1]))
        pending = (frames, outs)

    if pending is not None:
        import jax

        emit_chunk(pending[0], *jax.device_get(pending[1]))

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


def _emit_frame_boxes(box3d, scores, labels, tracking_ids, token, obj, pose,
                      crops, iou, matching, td, objects, proto_rows, tracking,
                      match_iou: float = 0.75):
    """Per-box proto emission + GT matching + trackData rows (host loop).

    Parity: waymo_common.py:106-205 (proto fields, IoU>0.75 track-cached match;
    match_iou keeps 0.75 as the production default — test-scale chains with a
    briefly-trained detector lower it to get matched tracks)."""
    have_proto = objects is not None
    if have_proto:
        from waymo_open_dataset import label_pb2  # type: ignore
        from waymo_open_dataset.protos import metrics_pb2  # type: ignore

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
            if iou[i, best] > match_iou:
                match = obj["objects"][best]["name"]
                matching[obj_id] = match
            else:
                match = None
        else:
            match = None

        td["id"].append(obj_id)
        td["type"].append(LABEL_TO_TYPE[int(labels[i])])
        td["bbox"].append(_transform_box7(det, pose))
        td["score"].append(float(scores[i]))
        td["point"].append(pts_o)
        td["match"].append(match)


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

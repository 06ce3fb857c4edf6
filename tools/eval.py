"""Pipeline sanity eval CLI: mIoU of track boxes vs static labels against GT.

Capability parity with reference ``tools/eval.py:38-104`` (which needs the external
pcdet CUDA iou3d) — here the IoU matrix is one jit'd call into tdal.core.iou.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle

import numpy as np

from tdal.data.waymo_schema import AnnoStore, box7_from_box9, reorganize_info, transform_box_np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to track.pkl / trackStatic.pkl.")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--static", required=True, help="Path to static_labels.pkl: {ID: {'token', 'bbox'}}.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tdal.core.iou import boxes_iou_3d

    iou_fn = jax.jit(boxes_iou_3d)

    with open(args.track, "rb") as f:
        track = pickle.load(f)
    with open(args.infos, "rb") as f:
        infos = reorganize_info(pickle.load(f))
    annos = AnnoStore(infos)
    with open(args.static, "rb") as f:
        static = pickle.load(f)

    iou_track, iou_static = [], []
    for ID, obj in static.items():
        token = obj["token"]
        static_bbox = np.asarray(obj["bbox"], np.float64).reshape(-1, 7)
        score = track[ID]["score"]
        inv = annos.inv_pose(token)
        best = int(np.argmax(np.stack(score)))
        track_bbox = transform_box_np(
            np.asarray(track[ID]["bbox"][best], np.float64).reshape(1, 7), inv
        )
        gt = np.stack(
            [box7_from_box9(np.asarray(o["box"])) for o in annos.get(token)["annos"]["objects"]]
        )
        t_iou = np.asarray(iou_fn(jnp.asarray(track_bbox, jnp.float32), jnp.asarray(gt, jnp.float32)))[0]
        s_iou = np.asarray(iou_fn(jnp.asarray(static_bbox, jnp.float32), jnp.asarray(gt, jnp.float32)))[0]
        iou_track.append(float(t_iou.max()))
        if s_iou.max() <= 1:
            iou_static.append(float(s_iou.max()))

    print(f"[Info] mIOU of track: {np.mean(iou_track):.4f}")
    print(f"[Info] mIOU of static: {np.mean(iou_static):.4f}")


if __name__ == "__main__":
    main()

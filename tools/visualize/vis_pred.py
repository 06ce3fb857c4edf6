"""Visualize predictions vs GT per frame. Parity: tools/visualize/vis_pred.py
(headless BEV PNGs)."""

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tdal.data.waymo_schema import box7_from_box9, load_pickle, reorganize_info
from tdal.utils.visualize import plot_bev


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--prediction", required=True, help="prediction.pkl")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--out_dir", default="vis_out")
    parser.add_argument("--n_frames", type=int, default=5)
    parser.add_argument("--score_thresh", type=float, default=0.3)
    parser.add_argument("--open3d", action="store_true",
                        help="interactive 3D viewer (needs open3d)")
    parser.add_argument("--prediction2", default=None,
                        help="second prediction.pkl for A/B comparison "
                             "(reference vis_pred.py --pred1/--pred2)")
    parser.add_argument("--sequence", action="store_true",
                        help="with --open3d: one window, N/P keys step frames")
    args = parser.parse_args()

    with open(args.prediction, "rb") as f:
        preds = pickle.load(f)
    preds2 = None
    if args.prediction2:
        with open(args.prediction2, "rb") as f:
            preds2 = pickle.load(f)
    with open(args.infos, "rb") as f:
        infos = reorganize_info(pickle.load(f))

    def det_sets(token):
        """Prediction box sets (waymo convention) for one frame."""
        sets = []
        for name, color, src in (
            ("pred", (0.9, 0.1, 0.1), preds),
            ("pred2", (0.1, 0.3, 0.9), preds2),
        ):
            if src is None or token not in src:
                continue
            det = src[token]
            keep = np.asarray(det["scores"]) > args.score_thresh
            boxes = np.asarray(det["box3d_lidar"])[keep][:, :7].copy()
            if len(boxes):
                boxes[:, -1] = -boxes[:, -1] - np.pi / 2
                boxes[:, [3, 4]] = boxes[:, [4, 3]]
            sets.append({"boxes": boxes, "color": color, "name": name,
                         "scores": np.asarray(det["scores"])[keep]})
        return sets

    if args.open3d and args.sequence:
        from tdal.utils.visualize import show_sequence_open3d

        frames = []
        for token in list(preds)[: args.n_frames]:
            info = infos[token]
            lidar = load_pickle(info["path"])
            anno = load_pickle(info["anno_path"])
            gt = np.array([box7_from_box9(o["box"]) for o in anno["objects"]])
            frames.append({
                "points": lidar["lidars"]["points_xyz"],
                "gt": gt,
                "sets": det_sets(token),
            })
        show_sequence_open3d(frames, score_thresh=args.score_thresh)
        return

    for token in list(preds)[: args.n_frames]:
        det = preds[token]
        info = infos[token]
        lidar = load_pickle(info["path"])
        anno = load_pickle(info["anno_path"])
        gt = np.array([box7_from_box9(o["box"]) for o in anno["objects"]])
        keep = np.asarray(det["scores"]) > args.score_thresh
        sets = det_sets(token)
        boxes = sets[0]["boxes"] if sets else np.zeros((0, 7))
        if args.open3d:
            from tdal.utils.visualize import show_open3d

            show_open3d(
                lidar["lidars"]["points_xyz"],
                boxes=gt,
                box_sets=sets,
                score_thresh=args.score_thresh,
            )
            continue
        out = Path(args.out_dir) / f"{token}.png"
        plot_bev(
            points=lidar["lidars"]["points_xyz"],
            boxes=boxes,
            labels=np.asarray(det["label_preds"])[keep],
            gt_boxes=gt,
            out_path=out,
            title=token,
        )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Visualize raw frames: points + GT boxes. Parity: tools/visualize/vis_data.py
(open3d interactive -> headless BEV PNGs by default)."""

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tdal.data.waymo_schema import box7_from_box9, load_pickle
from tdal.utils.visualize import plot_bev


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--infos", required=True)
    parser.add_argument("--out_dir", default="vis_out")
    parser.add_argument("--n_frames", type=int, default=5)
    parser.add_argument("--open3d", action="store_true")
    args = parser.parse_args()

    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    for info in infos[: args.n_frames]:
        lidar = load_pickle(info["path"])
        anno = load_pickle(info["anno_path"])
        points = lidar["lidars"]["points_xyz"]
        boxes = np.array([box7_from_box9(o["box"]) for o in anno["objects"]])
        if args.open3d:
            from tdal.utils.visualize import show_open3d

            show_open3d(points, boxes)
        else:
            out = Path(args.out_dir) / f"{info['token']}.png"
            plot_bev(points=points, gt_boxes=boxes, out_path=out, title=info["token"])
            print(f"wrote {out}")


if __name__ == "__main__":
    main()

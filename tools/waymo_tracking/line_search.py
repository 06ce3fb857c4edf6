"""Tracker hyperparameter grid search.

Capability parity with reference ``tools/waymo_tracking/line_search.py:16-35`` (which
shells out per combination); here the search calls the tracking library in-process and
reports id-switch-free track counts per setting.
"""

import argparse
import itertools
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tdal.data.waymo_schema import AnnoStore, reorganize_info
from tdal.pipeline.track_extraction import convert_detection_to_global_box, run_tracking


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="prediction.pkl")
    parser.add_argument("--info_path", required=True)
    parser.add_argument("--score_thresholds", type=float, nargs="+",
                        default=[0.5, 0.65, 0.75, 0.85])
    parser.add_argument("--vehicle_dists", type=float, nargs="+", default=[0.6, 0.8, 1.0])
    parser.add_argument("--max_age", type=int, default=3)
    args = parser.parse_args()

    with open(args.checkpoint, "rb") as f:
        detections = pickle.load(f)
    with open(args.info_path, "rb") as f:
        infos = reorganize_info(pickle.load(f))
    annos = AnnoStore(infos)
    global_preds, det_results = convert_detection_to_global_box(detections, infos, annos)

    for score, vdist in itertools.product(args.score_thresholds, args.vehicle_dists):
        max_dist = {"VEHICLE": vdist, "PEDESTRIAN": vdist / 2, "CYCLIST": vdist * 0.75}
        preds, id_count = run_tracking(
            global_preds, det_results, max_age=args.max_age,
            max_dist=max_dist, score_thresh=score,
        )
        n_boxes = sum(len(p["scores"]) for p in preds.values())
        print(f"score_thresh={score:.2f} vehicle_dist={vdist:.2f} "
              f"-> {id_count} tracks, {n_boxes} boxes")


if __name__ == "__main__":
    main()

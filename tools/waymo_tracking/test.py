"""3D multi-object tracking + track-data extraction CLI (pipeline stage 2).

Capability parity with reference ``tools/waymo_tracking/test.py``: loads the detector's
prediction.pkl + infos, converts detections to global-frame boxes, runs the greedy
tracker sequentially per sequence, writes per-frame tracked results, det_annos.pkl,
trackData pickles, and the Waymo metrics proto (pickle fallback without the devkit).
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tdal.data.waymo_schema import AnnoStore, reorganize_info
from tdal.pipeline.track_extraction import (
    convert_detection_to_global_box,
    create_gt_detection,
    create_pd_detection,
    run_tracking,
)
from tdal.runtime.logging_utils import create_logger


def parse_args():
    parser = argparse.ArgumentParser(description="Tracking Evaluation")
    parser.add_argument("--work_dir", required=True, help="dir to save logs and tracking results")
    parser.add_argument("--checkpoint", required=True, help="path to prediction file")
    parser.add_argument("--info_path", type=str, required=True)
    parser.add_argument("--max_age", type=int, default=3)
    parser.add_argument("--vehicle", type=float, default=0.8)
    parser.add_argument("--pedestrian", type=float, default=0.4)
    parser.add_argument("--cyclist", type=float, default=0.6)
    parser.add_argument("--score_thresh", type=float, default=0.75)
    return parser.parse_args()


def main():
    args = parse_args()
    logger = create_logger(Path(args.work_dir) / "tracking.log")
    logger.info("Deploy OK")

    max_dist = {
        "VEHICLE": args.vehicle,
        "PEDESTRIAN": args.pedestrian,
        "CYCLIST": args.cyclist,
    }
    with open(args.checkpoint, "rb") as f:
        detections = pickle.load(f)
    with open(args.info_path, "rb") as f:
        infos = reorganize_info(pickle.load(f))
    annos = AnnoStore(infos)

    global_preds, detection_results = convert_detection_to_global_box(
        detections, infos, annos
    )
    logger.info(f"Begin Tracking {len(global_preds)} frames")
    predictions, id_count = run_tracking(
        global_preds,
        detection_results,
        max_age=args.max_age,
        max_dist=max_dist,
        score_thresh=args.score_thresh,
    )
    logger.info(f"Total track object: {id_count}")
    create_pd_detection(
        predictions, infos, args.work_dir, tracking=True, logger=logger
    )
    create_gt_detection(list(infos.values()), args.work_dir, logger=logger)
    logger.info(
        "Use the Waymo devkit compute_tracking_metrics_main on tracking_pred.bin "
        "for official metrics"
    )


if __name__ == "__main__":
    main()

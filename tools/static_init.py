"""No-learning static baselines: raw-detection IoU and best-box-broadcast IoU.

Capability parity with reference ``tools/static_init.py``: the two lower bounds the
learned static labeler must beat; optionally patches det_annos with the broadcast box.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle
from pathlib import Path

from tdal.data.track_datasets import preprocess_tracks
from tdal.data.waymo_schema import AnnoStore, dump_pickle, reorganize_info
from tdal.pipeline.factories import load_track_data
from tdal.pipeline.labeler_run import (
    build_token2idx,
    calculate_init_iou,
    calculate_static_iou,
    sort_detections,
)
from tdal.runtime.logging_utils import DEFAULT_SEED, create_logger, fix_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to trackStatic.pkl.")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--det_annos", default=None)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--work_dir", default=None)
    args = parser.parse_args()

    fix_seed(args.seed)
    work_dir = (
        Path(args.work_dir) if args.work_dir else Path(args.track).parent / "static"
    )
    (work_dir / "box").mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "log" / "init.txt")

    track = load_track_data(args.track, prefix="trackStatic")
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    info_map = reorganize_info(infos)
    annos = AnnoStore(info_map)
    track, _ = preprocess_tracks(track, annos, ratio=0.0, seed=args.seed)

    det_annos, token2idx = None, None
    if args.det_annos:
        with open(args.det_annos, "rb") as f:
            det_annos = pickle.load(f)
        det_annos = sort_detections(det_annos)
        token2idx = build_token2idx(info_map, annos, det_annos)

    calculate_init_iou(track, annos, logger)
    calculate_static_iou(track, annos, logger, det_annos, token2idx)
    if det_annos is not None:
        out_path = work_dir / "box" / "static_init.pkl"
        dump_pickle(det_annos, out_path)
        logger.info(f"Saved patched det_annos to {out_path}")


if __name__ == "__main__":
    main()

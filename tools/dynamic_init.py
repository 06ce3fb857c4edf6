"""No-learning dynamic baseline: per-frame raw detection IoU over dynamic tracks.

Capability parity with reference ``tools/dynamic_init.py:37-139``: the lower bound
the learned dynamic labeler must beat (the reference computes only the init-box
IoU here — unlike ``static_init`` there is no best-score broadcast baseline,
because broadcasting one box across a MOVING track is meaningless).

The IoU convention matches the reference's ``compute_box3d_iou`` path (fpointnet
corner IoU with the heading/size class round-trip), via
``labeler_run.calculate_init_iou``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle

from tdal.data.waymo_schema import AnnoStore, reorganize_info
from tdal.pipeline.factories import load_track_data
from tdal.pipeline.labeler_run import calculate_init_iou
from tdal.runtime.logging_utils import DEFAULT_SEED, create_logger, fix_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to trackDynamic.pkl.")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--work_dir", default=None)
    args = parser.parse_args()

    fix_seed(args.seed)
    work_dir = (
        Path(args.work_dir) if args.work_dir else Path(args.track).parent / "dynamic"
    )
    work_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "log" / "init.txt")

    track = load_track_data(args.track, prefix="trackDynamic")
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    info_map = reorganize_info(infos)
    annos = AnnoStore(info_map)

    calculate_init_iou(track, annos, logger)


if __name__ == "__main__":
    main()

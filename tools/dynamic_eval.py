"""Dynamic-object auto-labeler evaluation / label emission CLI.

Capability parity with reference ``tools/dynamic_eval.py``: runs the trained dynamic
labeler over every per-frame sample (ordered), decodes one refined box per frame in
that frame's vehicle coords, reports corner-IoU metrics and patches det_annos rows.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle
from pathlib import Path

import numpy as np

from tdal.data.track_datasets import DynamicTrackDataset, preprocess_tracks
from tdal.data.waymo_schema import AnnoStore, dump_pickle, reorganize_info
from tdal.pipeline.factories import load_track_data, make_labeler, restore_labeler_state
from tdal.pipeline.labeler_run import (
    build_token2idx,
    postprocess_dynamic,
    predict_final_boxes,
    sort_detections,
)
from tdal.runtime.logging_utils import DEFAULT_SEED, create_logger, fix_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to trackDynamic.pkl.")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--model_path", required=True, help="Checkpoint dir of dynamic_train.")
    parser.add_argument("--det_annos", default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--npoints", type=int, default=1024)
    parser.add_argument("--n_object_points", type=int, default=2560)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--work_dir", default=None)
    args = parser.parse_args()

    fix_seed(args.seed)
    work_dir = (
        Path(args.work_dir) if args.work_dir else Path(args.track).parent / "dynamic"
    )
    result_dir = work_dir / "box"
    result_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "log" / "eval.txt")

    track = load_track_data(args.track, prefix="trackDynamic")
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    info_map = reorganize_info(infos)
    annos = AnnoStore(info_map)

    det_annos, token2idx = None, None
    if args.det_annos:
        with open(args.det_annos, "rb") as f:
            det_annos = pickle.load(f)
        det_annos = sort_detections(det_annos)
        token2idx = build_token2idx(info_map, annos, det_annos)

    track, _ = preprocess_tracks(track, annos, ratio=0.0, seed=args.seed)
    test_ds = DynamicTrackDataset(track, annos, npoints=args.npoints, seed=args.seed)

    model, _, inputs_fn, kind = make_labeler("dynamic", args.n_object_points)
    example = test_ds[0]
    state, meta = restore_labeler_state(
        model,
        args.model_path,
        (
            np.tile(example["pts"][None], (args.batch_size, 1, 1)),
            np.tile(example["boxes"][None], (args.batch_size, 1, 1)),
            np.tile(example["bbox_gt"][None], (args.batch_size, 1)),
        ),
    )
    logger.info(f"Loaded checkpoint meta: {meta}")

    logger.info("Start testing")
    final_bboxes = predict_final_boxes(
        model, state, test_ds, inputs_fn, kind, args.batch_size
    )
    logger.info("Start post processing")
    postprocess_dynamic(track, annos, final_bboxes, logger, det_annos, token2idx)
    if det_annos is not None:
        out_path = result_dir / "box.pkl"
        dump_pickle(det_annos, out_path)
        logger.info(f"Saved patched det_annos to {out_path}")


if __name__ == "__main__":
    main()

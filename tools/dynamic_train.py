"""Dynamic-object auto-labeler training CLI.

Capability parity with reference ``tools/dynamic_train.py``: loads track shards + infos,
drops unmatched tracks, 90/10 split, trains the per-frame dynamic Frustum-PointNet
(+ box-trajectory embedding) labeler, per-epoch eval, best-checkpoint saving.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle
from pathlib import Path

import numpy as np

from tdal.data.track_datasets import DynamicTrackDataset, preprocess_tracks
from tdal.data.waymo_schema import AnnoStore, reorganize_info
from tdal.parallel.mesh import make_mesh
from tdal.pipeline.factories import load_track_data, make_labeler
from tdal.pipeline.labeler_run import train_labeler
from tdal.runtime.logging_utils import DEFAULT_SEED, create_logger, fix_seed
from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
from tdal.runtime.train_state import TrainState, init_model, param_count


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to trackDynamic.pkl or shard dir.")
    parser.add_argument("--infos", required=True)
    parser.add_argument("--split", type=int, default=16)
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--npoints", type=int, default=1024, help="Points per frame.")
    parser.add_argument("--n_object_points", type=int, default=2560, help="Gathered object points (5*512).")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--num_workers", type=int, default=0,
                        help="multiprocess batch-building workers (0 = in-process)")
    parser.add_argument("--data_parallel", action="store_true")
    args = parser.parse_args()

    root_key = fix_seed(args.seed)
    work_dir = Path(args.work_dir) if args.work_dir else Path(args.track) / "dynamic"
    result_dir = work_dir / "model"
    result_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "log" / "train.txt")

    logger.info("Load track data")
    track = load_track_data(args.track, args.split, prefix="trackDynamic")
    logger.info(f"{len(track)} tracks")
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    annos = AnnoStore(reorganize_info(infos))

    train_track, val_track = preprocess_tracks(track, annos, ratio=0.1, seed=args.seed)
    train_ds = DynamicTrackDataset(train_track, annos, npoints=args.npoints, seed=args.seed)
    val_ds = DynamicTrackDataset(val_track, annos, npoints=args.npoints, seed=args.seed + 1)
    logger.info(f"train samples: {len(train_ds)}, val samples: {len(val_ds)}")

    model, loss_fn, inputs_fn, _ = make_labeler("dynamic", args.n_object_points)
    example = train_ds[0]
    pts = np.tile(example["pts"][None], (args.batch_size, 1, 1))
    boxes = np.tile(example["boxes"][None], (args.batch_size, 1, 1))
    bbox_gt = np.tile(example["bbox_gt"][None], (args.batch_size, 1))
    params, bs = init_model(
        model, {"params": root_key, "gather": root_key, "dropout": root_key},
        pts, boxes, bbox_gt,
    )
    logger.info(f"model params: {param_count(params)}")

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    tx = adam_with_schedule(
        labeler_step_decay(args.lr, steps_per_epoch), weight_decay=args.weight_decay
    )
    state = TrainState.create(params, tx, bs)
    mesh = make_mesh() if args.data_parallel else None

    logger.info("Start training")
    state, best = train_labeler(
        model, loss_fn, inputs_fn, state, train_ds, val_ds,
        n_epoch=args.n_epoch, batch_size=args.batch_size, rng=root_key,
        logger=logger, ckpt_dir=result_dir, mesh=mesh, seed=args.seed,
        num_workers=args.num_workers,
    )
    logger.info(f"Best: {best}")
    logger.info("Done.")


if __name__ == "__main__":
    main()

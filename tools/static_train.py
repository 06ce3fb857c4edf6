"""Static-object auto-labeler training CLI.

Capability parity with reference ``tools/static_train.py:168-230``: loads trackStatic
shards + infos, drops unmatched tracks, 90/10 split, trains a one-box or two-box
Frustum-PointNet labeler with Adam + step-decay LR, evaluates per epoch, saves the
best-by-eval-acc checkpoint. TPU-native: one jit'd train step, data-sharded Mesh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle
from pathlib import Path


from tdal.data.track_datasets import StaticTrackDataset, preprocess_tracks
from tdal.data.waymo_schema import AnnoStore, reorganize_info
from tdal.parallel.mesh import make_mesh
from tdal.pipeline.factories import load_track_data, make_labeler
from tdal.pipeline.labeler_run import train_labeler
from tdal.runtime.logging_utils import DEFAULT_SEED, create_logger, fix_seed
from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
from tdal.runtime.train_state import TrainState, init_model, param_count


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="Path to trackStatic.pkl or shard dir.")
    parser.add_argument("--infos", required=True, help="Path to infos file.")
    parser.add_argument("--model_type", required=True, choices=["one_box_est", "two_box_est"])
    parser.add_argument("--split", type=int, default=16, help="Number of train shards.")
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--npoints", type=int, default=4096, help="Points per track sample.")
    parser.add_argument("--n_object_points", type=int, default=512)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--work_dir", default=None, help="Output dir (default: <track>/static).")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="multiprocess batch-building workers (0 = in-process)")
    parser.add_argument("--data_parallel", action="store_true", help="Shard batches over all devices.")
    args = parser.parse_args()

    root_key = fix_seed(args.seed)
    work_dir = Path(args.work_dir) if args.work_dir else Path(args.track) / "static"
    result_dir = work_dir / "model" / args.model_type
    result_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "log" / "train" / f"{args.model_type}.txt")

    logger.info("Load track data")
    track = load_track_data(args.track, args.split, prefix="trackStatic")
    logger.info(f"{len(track)} tracks")

    logger.info("Load info data")
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    annos = AnnoStore(reorganize_info(infos))

    train_track, val_track = preprocess_tracks(track, annos, ratio=0.1, seed=args.seed)
    train_ds = StaticTrackDataset(train_track, annos, npoints=args.npoints, seed=args.seed)
    val_ds = StaticTrackDataset(val_track, annos, npoints=args.npoints, seed=args.seed + 1)
    logger.info(f"train tracks: {len(train_ds)}, val tracks: {len(val_ds)}")

    model, loss_fn, inputs_fn, _ = make_labeler(args.model_type, args.n_object_points)
    example = train_ds[0]
    import numpy as np

    pts = np.tile(example["pts"][None], (args.batch_size, 1, 1))
    init_box = np.tile(example["init_box"][None], (args.batch_size, 1))
    bbox_gt = np.tile(example["bbox_gt"][None], (args.batch_size, 1))
    params, bs = init_model(
        model, {"params": root_key, "gather": root_key, "dropout": root_key},
        pts, init_box, bbox_gt,
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

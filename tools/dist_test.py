"""Detector inference / evaluation CLI.

Capability parity with reference ``tools/dist_test.py:33-209``: runs the detector over
a split, saves ``prediction.pkl`` keyed by token, measures middle-third per-frame
latency with --speed_test, and emits det_annos + metrics proto via the dataset
evaluation path (create_pd_detection). Data-parallel eval sharding is the Mesh, not
NCCL/apex (dist_test.py:89-133).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle
from pathlib import Path

import jax
import numpy as np

from tdal.data.detection import DetectionDataset
from tdal.data.waymo_schema import reorganize_info
from tdal.models.builder import (
    build_assigner,
    build_detector,
    build_test_cfg,
    build_voxel_config,
)
from tdal.pipeline.detector_run import run_inference
from tdal.pipeline.track_extraction import create_pd_detection
from tdal.runtime.checkpoint import CheckpointManager
from tdal.runtime.config import Config
from tdal.runtime.logging_utils import create_logger, fix_seed
from tdal.runtime.train_state import TrainState, init_model


def parse_args():
    parser = argparse.ArgumentParser(description="Test a detector")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--checkpoint", required=True, help="checkpoint dir (orbax)")
    parser.add_argument("--info_path", help="override infos path")
    parser.add_argument("--split", default="val", choices=["val", "mytrain", "test", "train"])
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--speed_test", action="store_true")
    parser.add_argument("--double_flip", action="store_true", help="4-variant flip TTA")
    parser.add_argument("--evaluate", action="store_true", help="write det_annos/proto")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of middle batches")
    parser.add_argument("--spatial_shards", type=int, default=1,
                        help="split the BEV canvas H over N devices (XLA SPMD "
                             "spatial conv partitioning with automatic halo "
                             "exchange; single-frame latency scaling)")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    work_dir = Path(args.work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "test.log")
    rng = fix_seed(0)

    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=False)
    two_stage = cfg.model["type"] == "TwoStageDetector"
    base_model_cfg = cfg.model["first_stage_cfg"] if two_stage else cfg.model
    detector = build_detector(base_model_cfg, voxel_cfg)
    test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    engine = None
    if two_stage:
        from tdal.models.builder import build_two_stage_engine

        engine = build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)
        detector = engine.first
    if args.spatial_shards > 1:
        from tdal.parallel.mesh import make_mesh, spatial_sharding

        sp_mesh = make_mesh(
            axis_names=("spatial",), axis_sizes=(args.spatial_shards,),
            devices=jax.devices()[: args.spatial_shards],
        )
        detector = detector.copy(bev_sharding=spatial_sharding(sp_mesh))
        if two_stage:
            engine.first = detector
        logger.info(
            f"spatial partitioning: BEV canvas H over {args.spatial_shards} devices"
        )
    assigner = build_assigner(cfg.train_cfg["assigner"], detector)

    split_key = "train" if args.split in ("train", "mytrain") else "val"
    info_path = args.info_path or cfg.data[split_key]["info_path"]
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    ds = DetectionDataset(
        infos,
        class_names=cfg.data[split_key]["class_names"],
        assigner=assigner,
        voxel_cfg=voxel_cfg,
        mode="val",
        nsweeps=cfg.data[split_key].get("nsweeps", 1),
        max_points=cfg.data[split_key].get("max_points", 200000),
        shuffle_points=False,
    )
    logger.info(f"{len(ds)} frames to run")

    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 4)
    example = ds[0]
    points = np.stack([example["points"]] * batch_size)
    import optax

    if two_stage:
        gt = jax.numpy.zeros(
            (batch_size, assigner.max_objs, 10), jax.numpy.float32
        )
        params, bstats = engine.init(rng, jax.numpy.asarray(points), gt)
    else:
        params, bstats = init_model(detector, {"params": rng}, jax.numpy.asarray(points))
    state = TrainState.create(params, optax.adam(1e-3), bstats)
    mgr = CheckpointManager(args.checkpoint)
    tree, meta = mgr.restore(target={"params": params, "batch_stats": bstats})
    state = state.replace(params=tree["params"], batch_stats=tree["batch_stats"])
    logger.info(f"restored checkpoint: {meta}")

    if two_stage:
        from tdal.pipeline.two_stage_run import run_two_stage_inference

        detections = run_two_stage_inference(
            engine, state, ds, batch_size=batch_size, logger=logger,
            speed_test=args.speed_test,
        )
    else:
        code_weights = base_model_cfg["bbox_head"].get("code_weights", [1.0] * 8)
        detections = run_inference(
            detector, state, ds, test_cfg, code_weights,
            batch_size=batch_size, logger=logger, speed_test=args.speed_test,
            double_flip=args.double_flip, profile_dir=args.profile_dir,
        )
    with open(work_dir / "prediction.pkl", "wb") as f:
        pickle.dump(detections, f)
    logger.info(f"saved prediction.pkl ({len(detections)} frames)")

    if args.evaluate:
        create_pd_detection(
            detections, reorganize_info(infos), work_dir, tracking=False, logger=logger
        )


if __name__ == "__main__":
    main()

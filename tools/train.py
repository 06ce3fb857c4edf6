"""Detector training CLI.

Capability parity with reference ``tools/train.py:26-133``: config-driven CenterPoint
training (model tree, voxel generator, assigner, OneCycle optimizer, total_epochs),
with the TPU-native runtime: jit'd step, data-parallel Mesh over all devices (replaces
NCCL DDP init at tools/train.py:84-88), orbax checkpoints.
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
from tdal.models.builder import (
    build_assigner,
    build_detector,
    build_test_cfg,
    build_voxel_config,
)
from tdal.parallel.mesh import make_mesh
from tdal.pipeline.detector_run import train_detector
from tdal.runtime.config import Config
from tdal.runtime.logging_utils import create_logger, fix_seed
from tdal.runtime.schedules import adam_with_schedule, one_cycle
from tdal.runtime.train_state import TrainState, init_model, param_count


def parse_args():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="train config file path")
    parser.add_argument("--work_dir", help="the dir to save logs and models")
    parser.add_argument("--info_path", help="override train infos path")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--no_data_parallel", action="store_true")
    parser.add_argument("--resume_from", default=None, help="checkpoint dir to resume")
    parser.add_argument("--val_info_path", help="val infos for in-training eval "
                        "(overrides cfg.data.val.info_path)")
    parser.add_argument("--val_every", type=int, default=1, help="val every N epochs")
    parser.add_argument("--val_max_frames", type=int, default=None)
    parser.add_argument("--no_val", action="store_true", help="disable in-training val")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of train steps 5-9")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    work_dir = Path(args.work_dir or cfg.get("work_dir", "./work_dirs/train"))
    work_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(work_dir / "train.log")
    rng = fix_seed(args.seed if args.seed is not None else 0)

    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
    two_stage = cfg.model["type"] == "TwoStageDetector"
    if two_stage:
        from tdal.models.builder import build_two_stage_engine

        base_model_cfg = cfg.model["first_stage_cfg"]
        detector = build_detector(base_model_cfg, voxel_cfg)
        test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
        engine = build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)
        detector = engine.first
    else:
        base_model_cfg = cfg.model
        detector = build_detector(cfg.model, voxel_cfg)
        test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    assigner = build_assigner(cfg.train_cfg["assigner"], detector)

    info_path = args.info_path or cfg.data["train"]["info_path"]
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    pre = cfg.get("train_preprocessor", {})
    from tdal.data.gt_augment import build_db_sampler

    point_features = 5 if cfg.data["train"].get("nsweeps", 1) == 1 else 6
    db_sampler = build_db_sampler(pre.get("db_sampler"), point_features=point_features)
    if db_sampler is not None:
        logger.info("GT-aug database sampler enabled")
    train_ds = DetectionDataset(
        infos,
        class_names=cfg.data["train"]["class_names"],
        assigner=assigner,
        voxel_cfg=voxel_cfg,
        mode="train",
        nsweeps=cfg.data["train"].get("nsweeps", 1),
        max_points=cfg.data["train"].get("max_points", 200000),
        global_rot_noise=tuple(pre.get("global_rot_noise", (-0.785398, 0.785398))),
        global_scale_noise=tuple(pre.get("global_scale_noise", (0.95, 1.05))),
        shuffle_points=pre.get("shuffle_points", True),
        db_sampler=db_sampler,
    )
    logger.info(f"{len(train_ds)} train frames")

    val_ds = None
    val_info_path = args.val_info_path or cfg.data.get("val", {}).get("info_path")
    if val_info_path and not args.no_val:
        with open(val_info_path, "rb") as f:
            val_infos = pickle.load(f)
        val_ds = DetectionDataset(
            val_infos,
            class_names=cfg.data["train"]["class_names"],
            assigner=assigner,
            voxel_cfg=voxel_cfg,
            mode="val",
            nsweeps=cfg.data["train"].get("nsweeps", 1),
            max_points=cfg.data["train"].get("max_points", 200000),
        )
        logger.info(f"{len(val_ds)} val frames (every {args.val_every} epochs)")

    batch_size = args.batch_size or cfg.data.get("samples_per_gpu", 4) * jax.device_count()
    total_epochs = args.total_epochs or cfg.total_epochs
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    total_steps = steps_per_epoch * total_epochs

    lr_sched, mom_sched = one_cycle(
        cfg.lr_config["lr_max"],
        total_steps,
        moms=tuple(cfg.lr_config.get("moms", (0.95, 0.85))),
        div_factor=cfg.lr_config.get("div_factor", 10.0),
        pct_start=cfg.lr_config.get("pct_start", 0.4),
    )
    tx = adam_with_schedule(
        lr_sched,
        weight_decay=cfg.optimizer.get("wd", 0.01),
        grad_clip=cfg.get("grad_clip", {}).get("max_norm"),
        momentum_schedule=mom_sched,
    )

    example = train_ds[0]
    points = np.stack([example["points"]] * batch_size)
    mesh = None if args.no_data_parallel else make_mesh()
    if mesh is not None:
        logger.info(f"data-parallel mesh over {mesh.devices.size} devices")

    if two_stage:
        from tdal.pipeline.two_stage_run import train_two_stage

        train_two_stage(
            engine, cfg, train_ds, tx, batch_size=batch_size,
            n_epoch=total_epochs, logger=logger, work_dir=work_dir, rng=rng,
            mesh=mesh,
        )
    else:
        params, bs = init_model(detector, {"params": rng}, jax.numpy.asarray(points))
        logger.info(f"detector params: {param_count(params)}")
        state = TrainState.create(params, tx, bs)
        if args.resume_from:
            from tdal.runtime.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.resume_from)
            tree, meta = mgr.restore(target={"params": params, "batch_stats": bs})
            state = state.replace(
                params=tree["params"], batch_stats=tree["batch_stats"],
                step=meta.get("step", 0),
            )
            logger.info(f"resumed from {args.resume_from}: {meta}")
        code_weights = base_model_cfg["bbox_head"].get("code_weights", [1.0] * 8)
        weight = base_model_cfg["bbox_head"].get("weight", 2.0)
        train_detector(
            detector, state, train_ds, test_cfg, code_weights,
            n_epoch=total_epochs, batch_size=batch_size, logger=logger,
            work_dir=work_dir, weight=weight, mesh=mesh,
            val_ds=val_ds, val_every=args.val_every,
            val_max_frames=args.val_max_frames, profile_dir=args.profile_dir,
        )
    logger.info("Done.")


if __name__ == "__main__":
    main()

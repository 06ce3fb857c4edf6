"""Audit jitted programs for sliced gathers (slice_sizes > 1 on a non-batch
dim with many index rows) — the TPU serialized-loop landmine (CLAUDE.md).

Runs entirely on CPU: the gather shapes are visible in StableHLO before any
TPU lowering. Scans the PointPillars train+predict steps and the labeler
forward.

Usage: python benchmarks/gather_audit.py
"""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def audit(name, fn, *args):
    txt = jax.jit(fn).lower(*args).as_text()
    hits = []
    for m in re.finditer(
        r"\"stablehlo.gather\".*?slice_sizes = array<i64: ([\d, ]+)>", txt
    ):
        sizes = [int(s) for s in m.group(1).split(",")]
        big = [s for s in sizes if s > 1]
        # risky: >= 2 dims with extent > 1 in slice_sizes AND the gather isn't
        # a plain row gather (one sliced dim = feature row is fine)
        if len(big) >= 2:
            hits.append(sizes)
    status = "RISKY" if hits else "ok"
    print(f"{name:40s} {status}  {hits[:6] if hits else ''}")
    return hits


def pp_programs():
    from tdal.core.targets import AssignerConfig, assign_centernet_targets
    from tdal.core.voxel import VoxelConfig, pad_points
    from tdal.data.detection import collate_detection
    from tdal.models.detectors import PointPillars
    from tdal.pipeline.detector_engine import make_detector_steps
    from tdal.runtime.train_state import TrainState, init_model

    VOX = VoxelConfig((-8, -8, -2, 8, 8, 2), (0.5, 0.5, 4.0), 8, 1024)
    TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
    det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, (5000, 5)).astype(np.float32)
    padded = pad_points(pts, 6000)
    boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=50)
    t = assign_centernet_targets(
        boxes, np.array([1], np.int32), asg, VOX.grid_size,
        VOX.point_cloud_range, VOX.voxel_size,
    )
    items = [dict(t, points=padded, token=f"t{i}") for i in range(2)]
    batch = collate_detection(items)
    batch.pop("token"); batch.pop("gt_boxes_and_cls")
    batch = {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in batch.items()
    }
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(1e-3), bs)
    cfg = dict(
        post_center_limit_range=[-10, -10, -5, 10, 10, 5],
        nms=dict(nms_pre_max_size=512, nms_post_max_size=64, nms_iou_threshold=0.7),
        score_threshold=0.1, pc_range=[-8, -8], out_size_factor=1,
        voxel_size=[0.5, 0.5],
    )
    train_step, predict_step = make_detector_steps(det, cfg, [1.0] * 8, donate=False)
    audit("pp train_step", lambda s, b: train_step(s, b)[0].params, state, batch)
    audit("pp predict_step", lambda s, p: predict_step(s, p), state, batch["points"])


def labeler_programs():
    from tdal.models import StaticLabelerOneBox
    from tdal.runtime.train_state import init_model

    key = jax.random.PRNGKey(0)
    model = StaticLabelerOneBox(n_object_points=128)
    pts = jax.random.normal(key, (4, 128, 3))
    init_box = jnp.tile(jnp.array([0.0, 0, 0, 4.8, 1.8, 1.5, 0.0]), (4, 1))
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key}, pts, init_box
    )
    variables = {"params": params, "batch_stats": bs}
    audit(
        "static labeler fwd",
        lambda p, ib: model.apply(variables, p, ib, train=False)["center"],
        pts, init_box,
    )


pp_programs()
labeler_programs()

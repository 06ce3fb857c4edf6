"""Micro-benchmark suite: hot kernels + model steps on the current JAX device.

Prints one JSON object per line, one per benchmark (bench.py at the repo root stays
the single-line headline metric the driver records). Run: python benchmarks/micro.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


from tdal.utils.timing import timeit_chained as timeit  # noqa: E402


def report(name, ms, unit="ms", **extra):
    print(json.dumps({"bench": name, "value": round(ms, 3), "unit": unit, **extra}), flush=True)


def bench_voxelize():
    from tdal.core.voxel import VoxelConfig, pad_points, voxelize

    cfg = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = jnp.asarray(pad_points(pts, 180000))
    fj = jax.jit(lambda p: voxelize(p, cfg))

    def step(p):
        voxels, coords, num_points, n_vox = fj(p)
        return p + (n_vox.astype(p.dtype) * 0.0)

    report("voxelize_180k_points", timeit(step, padded, iters=20) * 1e3, points=180000)


def bench_nms():
    from tdal.core.nms import rotated_nms

    key = jax.random.PRNGKey(0)
    boxes = jax.random.normal(key, (219024, 7)) * 5
    boxes = boxes.at[:, 3:6].set(jnp.abs(boxes[:, 3:6]) + 1)
    scores = jax.random.uniform(key, (219024,))
    fj = jax.jit(lambda b, s: rotated_nms(b, s, 0.7, 4096, 500))

    def step(s, b):
        idx, valid = fj(b, s)
        return s + (valid.sum().astype(s.dtype) * 0.0)

    report("rotated_nms_pre4096_post500", timeit(step, scores, boxes, iters=10) * 1e3)


def bench_labeler_train():
    from tdal.models import StaticLabelerOneBox, frustum_loss_one_box
    from tdal.pipeline.labeler_engine import make_steps
    from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
    from tdal.runtime.train_state import TrainState, init_model

    key = jax.random.PRNGKey(0)
    B, N = 32, 4096
    pts = jax.random.normal(key, (B, N, 3))
    init_box = jnp.tile(jnp.array([0.0, 0, 0, 4.8, 1.8, 1.5, 0.0]), (B, 1))
    batch = {
        "pts": pts, "init_box": init_box, "bbox_gt": init_box,
        "mask_label": (jax.random.uniform(key, (B, N)) > 0.5).astype(jnp.float32),
        "center_label": init_box[:, :3],
        "heading_class_label": jnp.zeros((B,), jnp.int32),
        "heading_residuals_label": jnp.zeros((B,)),
        "size_class_label": jnp.zeros((B,), jnp.int32),
        "size_residuals_label": jnp.zeros((B, 3)),
    }
    model = StaticLabelerOneBox()
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key}, pts, init_box
    )
    tx = adam_with_schedule(labeler_step_decay(1e-3, 100), weight_decay=1e-4)
    state = TrainState.create(params, tx, bs)
    train_step, _ = make_steps(
        model, frustum_loss_one_box,
        lambda b: (b["pts"], b["init_box"], b["bbox_gt"]), donate=False,
    )

    def step(s):
        s, m = train_step(s, batch, key)
        return s

    report("static_labeler_train_step_b32_n4096", timeit(step, state, iters=20) * 1e3, batch=32)


def bench_pointpillars():
    from tdal.core.targets import AssignerConfig, assign_centernet_targets
    from tdal.core.voxel import VoxelConfig, pad_points
    from tdal.data.detection import collate_detection
    from tdal.models.detectors import PointPillars
    from tdal.pipeline.detector_engine import make_detector_steps
    from tdal.runtime.train_state import TrainState, init_model

    VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
    TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
    det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = pad_points(pts, 180000)
    boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=500)
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
        post_center_limit_range=[-80, -80, -10, 80, 80, 10],
        nms=dict(nms_pre_max_size=4096, nms_post_max_size=500, nms_iou_threshold=0.7),
        score_threshold=0.1, pc_range=[-74.88, -74.88], out_size_factor=1,
        voxel_size=[0.32, 0.32],
    )
    train_step, predict_step = make_detector_steps(det, cfg, [1.0] * 8, donate=False)

    def step(s):
        s, logs = train_step(s, batch)
        return s

    report("pointpillars_train_step_b2_waymo_scale", timeit(step, state, iters=10) * 1e3, batch=2)

    def pstep(p):
        preds = predict_step(state, p)
        return p + (preds["scores"].sum() * 0.0)

    report(
        "pointpillars_predict_b2_waymo_scale",
        timeit(pstep, batch["points"], iters=10) * 1e3,
        batch=2,
    )


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    bench_voxelize()
    bench_nms()
    bench_labeler_train()
    bench_pointpillars()


if __name__ == "__main__":
    main()

"""Headline benchmark suite — the BASELINE.md north-star metrics on the current device.

Prints ONE JSON line. The headline metric (static labeler forward throughput, the
BASELINE.json primary config with a measured torch-CPU baseline) is at the top level;
the rest of the north-star set (BASELINE.md "Numbers to measure") rides in "extra":

  - pointpillars_train_step_ms_b2 (+ model_tflops and mfu vs v5e bf16 peak)
  - detector_frames_per_sec_b2 (predict incl. decode + NMS, per frame)
  - voxelize_180k_points_ms
  - dynamic_labeler_train_step_ms_b32
  - trackdata_extraction_ms_per_frame (detect->track->extract stage 2c, host+device)

All timings chain iterations through a data dependency and end with a scalar host
fetch (tdal.utils.timing) — block_until_ready is unreliable through the axon tunnel.
"""

import json
import os
import tempfile
import time

B, N, NOBJ = 32, 512, 512
WARMUP, ITERS = 5, 50  # the labeler fwd is ~2.6ms; long runs damp tunnel jitter
V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def measure_torch_cpu_baseline() -> float:
    """Reference-equivalent torch CPU forward (tools/static_model.py:241-339), sets/sec."""
    import torch
    import torch.nn as nn

    class SegNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, 64), (64, 64), (64, 64), (64, 128), (128, 1024)]
            self.enc = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in chans]
            )
            dchans = [(1088, 512), (512, 256), (256, 128), (128, 128)]
            self.dec = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in dchans]
            )
            self.head = nn.Conv1d(128, 2, 1)

        def forward(self, x):
            skips = []
            for i, m in enumerate(self.enc):
                x = m(x)
                if i == 1:
                    skips.append(x)
            g = torch.max(x, 2, keepdim=True)[0].repeat(1, 1, x.shape[2])
            x = torch.cat([skips[0], g], 1)
            for m in self.dec:
                x = m(x)
            return self.head(x).transpose(2, 1)

    class BoxNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, 128), (128, 128), (128, 256), (256, 512)]
            self.enc = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in chans]
            )
            self.fc = nn.Sequential(
                nn.Linear(512, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Linear(256, 59),
            )

        def forward(self, x):
            for m in self.enc:
                x = m(x)
            return self.fc(torch.max(x, 2)[0])

    torch.manual_seed(0)
    seg, box = SegNet().eval(), BoxNet().eval()
    pts = torch.randn(B, 3, N)
    with torch.no_grad():
        for _ in range(WARMUP):
            logits = seg(pts)
            _ = box(pts)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            logits = seg(pts)
            _ = box(pts)
        dt = (time.perf_counter() - t0) / ITERS
    return B / dt


def measure_labeler_forward() -> float:
    """tdal JAX static labeler forward on the default device, sets/sec."""
    import jax
    import jax.numpy as jnp

    from tdal.models import StaticLabelerOneBox
    from tdal.runtime.train_state import init_model
    from tdal.utils.timing import chain, timeit_chained

    key = jax.random.PRNGKey(0)
    model = StaticLabelerOneBox(n_object_points=NOBJ)
    pts = jax.random.normal(key, (B, N, 3))
    init_box = jnp.tile(jnp.array([0.0, 0.0, 0.0, 4.8, 1.8, 1.5, 0.0]), (B, 1))
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key}, pts, init_box
    )
    variables = {"params": params, "batch_stats": bs}

    @jax.jit
    def fwd(pts, init_box):
        return model.apply(variables, pts, init_box, train=False)["center"]

    def step(p, init_box):
        return chain(p, fwd(p, init_box))

    dt = timeit_chained(step, pts, init_box, iters=ITERS, warmup=WARMUP)
    return B / dt


def measure_pointpillars():
    """Train-step ms, predict frames/sec, and MFU for the flagship detector @B=2."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tdal.core.targets import AssignerConfig, assign_centernet_targets
    from tdal.core.voxel import VoxelConfig, pad_points
    from tdal.data.detection import collate_detection
    from tdal.models.detectors import PointPillars
    from tdal.pipeline.detector_engine import make_detector_steps
    from tdal.runtime.train_state import TrainState, init_model
    from tdal.utils.timing import chain, force_completion, timeit_chained

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

    def tstep(s):
        s, logs = train_step(s, batch)
        return s

    for _ in range(2):
        state2 = tstep(state)
    force_completion(state2.params)
    t0 = time.perf_counter()
    s = state
    for _ in range(10):
        s = tstep(s)
    force_completion(s.params)
    train_ms = (time.perf_counter() - t0) / 10 * 1e3

    # MFU: XLA post-fusion flop count of the compiled train step / measured time.
    try:
        from tdal.utils.flops import cost_analysis

        costs = cost_analysis(lambda st, b: train_step(st, b)[0].params, state, batch)
        tflops = costs.get("flops", 0.0) / 1e12
        mfu = (tflops * 1e12) / (train_ms / 1e3) / V5E_BF16_PEAK
    except Exception:
        tflops, mfu = 0.0, 0.0

    def pstep(p):
        return chain(p, predict_step(state, p))

    pred_dt = timeit_chained(pstep, batch["points"], iters=10, warmup=2)
    frames_per_sec = 2 / pred_dt
    return train_ms, frames_per_sec, round(tflops, 3), round(mfu, 4)


def measure_voxelize() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdal.core.voxel import VoxelConfig, pad_points, voxelize
    from tdal.utils.timing import chain, timeit_chained

    cfg = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = jnp.asarray(pad_points(pts, 180000))
    fj = jax.jit(lambda p: voxelize(p, cfg))

    def step(p):
        return chain(p, fj(p)[3])

    return timeit_chained(step, padded, iters=20, warmup=2) * 1e3


def measure_dynamic_labeler() -> float:
    import jax
    import jax.numpy as jnp

    from tdal.models import DynamicLabeler, dynamic_loss
    from tdal.pipeline.labeler_engine import make_steps
    from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
    from tdal.runtime.train_state import TrainState, init_model
    from tdal.utils.timing import force_completion

    key = jax.random.PRNGKey(0)
    npts = 5 * 1024
    init_box = jnp.tile(jnp.array([0.0, 0, 0, 4.8, 1.8, 1.5, 0.0]), (B, 1))
    batch = {
        "pts": jax.random.normal(key, (B, npts, 4)),
        "boxes": jax.random.normal(key, (B, 101, 8)),
        "bbox_gt": init_box,
        "mask_label": (jax.random.uniform(key, (B, npts)) > 0.5).astype(jnp.float32),
        "center_label": jnp.full((B, 3), 0.2),
        "heading_class_label": jnp.zeros((B,), jnp.int32),
        "heading_residuals_label": jnp.zeros((B,)),
        "size_class_label": jnp.zeros((B,), jnp.int32),
        "size_residuals_label": jnp.zeros((B, 3)),
    }
    model = DynamicLabeler()
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key},
        batch["pts"], batch["boxes"], batch["bbox_gt"],
    )
    tx = adam_with_schedule(labeler_step_decay(1e-3, 100), weight_decay=1e-4)
    state = TrainState.create(params, tx, bs)
    train_step, _ = make_steps(
        model, dynamic_loss, lambda b: (b["pts"], b["boxes"], b["bbox_gt"]), donate=False
    )
    s = state
    for _ in range(2):
        s, _m = train_step(s, batch, key)
    force_completion(s.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, _m = train_step(s, batch, key)
    force_completion(s.params)
    return (time.perf_counter() - t0) / ITERS * 1e3


def measure_voxelnet_full_grid() -> float:
    """Sparse VoxelNet middle backbone forward at the production Waymo grid
    (41, 1504, 1504), ~178k voxels, ms/frame."""
    import sys

    sys.path.insert(0, "benchmarks")
    import jax
    import jax.numpy as jnp
    from voxelnet_full import GRID, fabricate_voxels

    from tdal.models.scn_sparse import SparseMiddleBackbone
    from tdal.utils.timing import chain, force_completion, timeit_chained

    coords, feats, valid, v = fabricate_voxels(180000)
    model = SparseMiddleBackbone(grid_size=GRID, dtype=jnp.bfloat16)
    cb, fb, vb = jnp.asarray(coords)[None], jnp.asarray(feats)[None], jnp.asarray(valid)[None]
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnums=4)({"params": key}, fb, cb, vb, False)
    force_completion(variables["params"]["w_in"])
    fwd = jax.jit(lambda f: model.apply(variables, f, cb, vb, train=False))
    dt = timeit_chained(lambda z, ff: chain(z, fwd(ff)), jnp.zeros(()), fb, iters=5, warmup=1)
    return dt * 1e3


def measure_trackdata_extraction() -> float:
    """Pipeline stage 2c (create_pd_detection: crop + GT match + emit), ms/frame."""
    import numpy as np

    from tdal.data.synthetic import make_synthetic_dataset
    from tdal.data.waymo_schema import reorganize_info
    from tdal.pipeline.track_extraction import create_pd_detection

    with tempfile.TemporaryDirectory() as tmp:
        infos, _scenes = make_synthetic_dataset(
            tmp, n_scenes=1, n_frames=24, seed=0,
            n_static=16, n_dynamic=16, points_per_object=256, n_background=20000,
        )
        info_map = reorganize_info(infos)
        rng = np.random.default_rng(0)
        detections = {}
        for token in info_map:
            nb = 128
            box = np.zeros((nb, 7))
            box[:, :2] = rng.uniform(-40, 40, (nb, 2))
            box[:, 3:6] = [4.8, 1.8, 1.5]
            box[:, 6] = rng.uniform(-np.pi, np.pi, nb)
            detections[token] = {
                "box3d_lidar": box,
                "scores": rng.uniform(0.5, 1.0, nb),
                "label_preds": np.zeros(nb, np.int64),
                "tracking_ids": np.arange(nb),
            }
        out = os.path.join(tmp, "val")
        # warm the jit cache on the first 2 frames
        warm = dict(list(detections.items())[:2])
        create_pd_detection(warm, info_map, out, tracking=True)
        t0 = time.perf_counter()
        create_pd_detection(detections, info_map, out, tracking=True)
        dt = (time.perf_counter() - t0) / len(detections)
    return dt * 1e3


def main():
    baseline = measure_torch_cpu_baseline()
    value = measure_labeler_forward()
    pp_train_ms, det_fps, pp_tflops, pp_mfu = measure_pointpillars()
    vox_ms = measure_voxelize()
    dyn_ms = measure_dynamic_labeler()
    td_ms = measure_trackdata_extraction()
    vn_ms = measure_voxelnet_full_grid()
    extra = [
        {"metric": "voxelnet_forward_ms_full_grid", "value": round(vn_ms, 1),
         "unit": "ms/frame (41x1504x1504, 178k voxels)"},
        {"metric": "pointpillars_train_step_ms_b2", "value": round(pp_train_ms, 1),
         "unit": "ms", "model_tflops": pp_tflops, "mfu_vs_v5e_bf16": pp_mfu},
        {"metric": "detector_frames_per_sec_b2", "value": round(det_fps, 1),
         "unit": "frames/sec (decode+NMS incl.)"},
        {"metric": "voxelize_180k_points_ms", "value": round(vox_ms, 2), "unit": "ms"},
        {"metric": "dynamic_labeler_train_step_ms_b32", "value": round(dyn_ms, 2), "unit": "ms"},
        {"metric": "trackdata_extraction_ms_per_frame", "value": round(td_ms, 1),
         "unit": "ms/frame (128 boxes, 28k pts)"},
    ]
    print(
        json.dumps(
            {
                "metric": "static_labeler_forward_sets_per_sec_b32_n512",
                "value": round(value, 1),
                "unit": "object point-sets/sec",
                "vs_baseline": round(value / baseline, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()

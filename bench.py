"""Headline benchmark suite — the BASELINE.md north-star metrics on the current device.

Prints ONE JSON line. The headline metric (static labeler forward throughput, the
BASELINE.json primary config with a measured torch-CPU baseline) is at the top level;
the rest of the north-star set (BASELINE.md "Numbers to measure") rides in "extra":

  - voxelnet_forward_ms_full_grid (sparse middle backbone, production grid)
  - voxelnet_two_stage_predict_ms_per_frame (THE production offboard config)
  - pointpillars_train_step_ms_b2 (+ model_tflops and mfu vs v5e bf16 peak)
  - detector_frames_per_sec_b2 (predict incl. decode + NMS, per frame)
  - voxelize_180k_points_ms
  - dynamic_labeler_train_step_ms_b32
  - trackdata_extraction_ms_per_frame — CANONICAL config: 24 frames, 128 boxes/frame,
    ~28k pts/frame, tracking=True (this bench supersedes ad-hoc numbers in RESULTS.md)
  - pipeline_end_to_end_frames_per_sec (all 6 offboard stages chained on one
    synthetic segment; benchmarks/pipeline_e2e.py)

Protocol (VERDICT r2 item 5): every device metric reports the MEDIAN over
independent repeats with min/max attached (the axon tunnel's latency varies
hour-to-hour; the round-2 headline swung 2.7x on unchanged code). All timings
chain iterations through a data dependency and end with a scalar host fetch
(tdal.utils.timing) — block_until_ready is unreliable through the axon tunnel.
Each metric is fault-isolated: a failure emits {"metric", "error"} instead of
killing the bench.

Budget protocol (VERDICT r3 item 1 — round 3 produced NO driver-visible perf
because the all-or-nothing bench ran past the driver timeout, rc=124):

  - A hard wall-clock budget (env TDAL_BENCH_BUDGET_S, default 1200 s) governs
    the whole run. Cheap metrics run first; expensive metrics run in
    descending value order, each behind a remaining-budget check. A metric
    that doesn't fit emits {"metric": ..., "skipped": "budget", "est_s": ...}
    instead of running over — the ONE JSON line always prints.
  - Per-metric cost estimates are adaptive: each successful run records its
    elapsed seconds in .bench_state.json (gitignored); the next run budgets
    with those measurements x1.4 margin. First-ever runs use conservative
    cold-compile defaults.
  - The XLA persistent compilation cache (~/.cache/tdal/jax_cache, enabled on
    import tdal) makes the multi-minute full-grid compiles happen once per
    machine, not once per bench invocation.
"""

import json
import os
import tempfile
import threading
import time
import traceback
from pathlib import Path

_ROOT = Path(__file__).resolve().parent
_STATE_PATH = _ROOT / ".bench_state.json"
BUDGET_S = float(os.environ.get("TDAL_BENCH_BUDGET_S", "1200"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _enable_compile_cache():
    """Persistent XLA compilation cache — enabled by ``import tdal``
    (~/.cache/tdal/jax_cache): the multi-minute full-grid compiles happen once
    per machine, so the driver's bench run after a warm in-round run loads
    instead of recompiling."""
    try:
        import tdal  # noqa: F401  (side effect: jax_compilation_cache_dir)
    except Exception:
        traceback.print_exc()

B, N, NOBJ = 32, 512, 512
# The labeler fwd is ~1.5 ms, and each timed block ends with ONE host fetch
# whose tunnel latency varies by ~50-150 ms run-to-run. At 50 iters the block
# (~75 ms) was comparable to that latency, so the headline swung 2x (16k-30k
# sets/s within one bench run). 400 iters makes each block ~0.6 s so the fetch
# contributes <10%.
WARMUP, ITERS = 5, 400
# 3 repeat blocks (not 5): min/max already expose tunnel variance, and the
# saved ~1.5 min of headline time is what lets the two-stage predict metric
# fit the 1200 s budget (VERDICT r4 item 2).
HEADLINE_REPEATS = 3
V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def _stats_ms(stats, scale=1e3):
    """timing stats dict (seconds) -> rounded ms fields."""
    return {
        "value": round(stats["median"] * scale, 2),
        "min": round(stats["min"] * scale, 2),
        "max": round(stats["max"] * scale, 2),
        "repeats": stats["repeats"],
    }


def measure_torch_cpu_baseline():
    """Reference-equivalent torch CPU forward (tools/static_model.py:241-339), sets/sec."""
    import torch
    import torch.nn as nn

    from tdal.utils.timing import stats_timer

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

    # CPU timing has no tunnel variance, so short blocks are stable: each
    # seg+box pair is ~1 s single-core; the device metrics' 400-iter chains
    # would cost >10 min here and blow the whole bench budget.
    cpu_iters = 12

    def once():
        with torch.no_grad():
            t0 = time.perf_counter()
            for _ in range(cpu_iters):
                seg(pts)
                box(pts)
            return (time.perf_counter() - t0) / cpu_iters

    with torch.no_grad():
        for _ in range(2):
            seg(pts)
            box(pts)
    st = stats_timer(once, repeats=3)
    return B / st["median"]


def measure_labeler_forward():
    """tdal JAX static labeler forward on the default device, sets/sec stats."""
    import jax
    import jax.numpy as jnp

    from tdal.models import StaticLabelerOneBox
    from tdal.runtime.train_state import init_model
    from tdal.utils.timing import chain, timeit_chained_stats

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

    stats = timeit_chained_stats(
        step, pts, init_box, iters=ITERS, warmup=WARMUP, repeats=HEADLINE_REPEATS
    )

    # Companion DEVICE-RATE measurement (VERDICT r4 item 4/reconcile): the
    # protocol above issues ITERS separate dispatches over the axon tunnel, so
    # its sets/s is bounded by min(device rate, host+tunnel dispatch rate) —
    # the 26.6k-vs-51.4k round-4 discrepancy tracks HOST/TUNNEL conditions,
    # not tdal code. This variant runs the same chained iterations inside ONE
    # lax.scan (one dispatch per block), isolating pure device throughput.
    import jax.lax as lax

    @jax.jit
    def fwd_block(p, init_box):
        def body(carry, _):
            out = model.apply(variables, carry, init_box, train=False)["center"]
            return carry + 0.0 * jnp.sum(out), None

        c, _ = lax.scan(body, p, None, length=ITERS)
        return c

    def scan_step(c, init_box):
        return chain(c, fwd_block(c, init_box))

    scan_stats = timeit_chained_stats(
        scan_step, pts, init_box, iters=1, warmup=1, repeats=HEADLINE_REPEATS
    )
    stats["scan_median"] = scan_stats["median"] / ITERS
    stats["scan_min"] = scan_stats["min"] / ITERS
    return stats


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
    from tdal.utils.timing import chain, force_completion, stats_timer, timeit_chained_stats

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

    def train_block():
        t0 = time.perf_counter()
        s = state
        for _ in range(10):
            s = tstep(s)
        force_completion(s.params)
        return (time.perf_counter() - t0) / 10

    train_stats = stats_timer(train_block, repeats=3)
    train_ms = train_stats["median"] * 1e3

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

    pred_stats = timeit_chained_stats(
        pstep, batch["points"], iters=10, warmup=2, repeats=3
    )
    return train_stats, pred_stats, round(tflops, 3), round(mfu, 4)


def measure_voxelize():
    import jax
    import numpy as np

    from tdal.core.voxel import VoxelConfig, pad_points, voxelize
    from tdal.utils.timing import chain, timeit_chained_stats

    import jax.numpy as jnp

    cfg = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = jnp.asarray(pad_points(pts, 180000))
    fj = jax.jit(lambda p: voxelize(p, cfg))

    def step(p):
        return chain(p, fj(p)[3])

    return timeit_chained_stats(step, padded, iters=20, warmup=2, repeats=3)


def measure_dynamic_labeler():
    import jax
    import jax.numpy as jnp

    from tdal.models import DynamicLabeler, dynamic_loss
    from tdal.pipeline.labeler_engine import make_steps
    from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
    from tdal.runtime.train_state import TrainState, init_model
    from tdal.utils.timing import force_completion, stats_timer

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

    def block():
        t0 = time.perf_counter()
        s = state
        for _ in range(30):
            s, _m = train_step(s, batch, key)
        force_completion(s.params)
        return (time.perf_counter() - t0) / 30

    return stats_timer(block, repeats=3)


def measure_voxelnet_full_grid():
    """Sparse VoxelNet middle backbone forward at the production Waymo grid
    (41, 1504, 1504), ~178k voxels, ms/frame stats."""
    import sys

    sys.path.insert(0, "benchmarks")
    import jax
    import jax.numpy as jnp
    from voxelnet_full import GRID, fabricate_voxels

    from tdal.models.scn_sparse import SparseMiddleBackbone
    from tdal.utils.timing import chain, force_completion, timeit_chained_stats

    coords, feats, valid, v = fabricate_voxels(180000)
    model = SparseMiddleBackbone(grid_size=GRID, dtype=jnp.bfloat16)
    cb, fb, vb = jnp.asarray(coords)[None], jnp.asarray(feats)[None], jnp.asarray(valid)[None]
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnums=4)({"params": key}, fb, cb, vb, False)
    force_completion(variables["params"]["w_in"])
    fwd = jax.jit(lambda f: model.apply(variables, f, cb, vb, train=False))
    return timeit_chained_stats(
        lambda z, ff: chain(z, fwd(ff)), jnp.zeros(()), fb, iters=4, warmup=1, repeats=3
    )


def measure_voxelnet_two_stage_predict():
    """Predict ms/frame for THE production offboard config (VoxelNet two-stage
    with velocity, full grid) — VERDICT r2 item 3. Stats over repeats."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tdal.core.voxel import pad_points
    from tdal.models.builder import (
        build_test_cfg,
        build_two_stage_engine,
        build_voxel_config,
        build_detector,
    )
    from tdal.runtime.config import Config
    from tdal.runtime.train_state import TrainState
    from tdal.utils.timing import chain, force_completion, timeit_chained_stats

    cfg_path = Path("configs/waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_sweep_two_stage_bev_5point_ft_6epoch_freeze_with_vel.py")
    cfg = Config.fromfile(str(cfg_path))
    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=False)
    first_cfg = cfg.model["first_stage_cfg"]
    detector = build_detector(first_cfg, voxel_cfg)
    test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    engine = build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = pad_points(pts, 180000)
    batch_points = jnp.asarray(np.stack([padded, padded]))
    key = jax.random.PRNGKey(0)
    gt = jnp.zeros((2, 500, 10), jnp.float32)
    params, bs = engine.init(key, batch_points, gt)
    force_completion(params)
    state = TrainState.create(params, optax.adam(1e-3), bs)
    _, predict_step = engine.make_steps(donate=False)

    def pchain(c, p):
        return chain(c, predict_step(state, p))

    stats = timeit_chained_stats(
        pchain, jnp.zeros(()), batch_points, iters=3, warmup=1, repeats=3
    )
    # per-frame (batch of 2)
    return {k: (v / 2 if k not in ("repeats",) else v) for k, v in stats.items()}


def measure_trackdata_extraction():
    """Pipeline stage 2c (create_pd_detection: crop + GT match + emit), ms/frame.

    CANONICAL trackData config: 24 frames, 128 boxes/frame, ~28k pts/frame,
    tracking=True. RESULTS.md ad-hoc numbers with other box counts are
    superseded by this one (VERDICT r2 item 5)."""
    import numpy as np

    from tdal.data.synthetic import make_synthetic_dataset
    from tdal.data.waymo_schema import reorganize_info
    from tdal.pipeline.track_extraction import create_pd_detection
    from tdal.utils.timing import stats_timer

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

        def once():
            t0 = time.perf_counter()
            create_pd_detection(detections, info_map, out, tracking=True)
            return (time.perf_counter() - t0) / len(detections)

        return stats_timer(once, repeats=3)


_AP_STACK = {}


def measure_pipeline_e2e(n_frames=16):
    """All 6 offboard stages chained on one synthetic segment, frames/sec.

    n_frames scales the segment (VERDICT r3 item 7: 200-frame segments
    amortize compiles/host latency the way real Waymo segments do). When
    detector_ap_synthetic ran first, its TRAINED detector drives stage 1 so
    the downstream track population is bounded and representative (VERDICT
    r4 item 6); otherwise falls back to the fresh-init production config.

    With the trained stack the scene is matched to the AP gate's TRAINING
    distribution (background density, points/object) and objects are spread
    along the ego path (x_range) so they stay in detector range over the
    whole segment — otherwise the trained detector sees an out-of-
    distribution, mostly-empty scene, detects nothing, and every downstream
    stage measures an empty pipeline (the r4-era default anchored both
    objects AND background at the origin, so a 200-frame segment went dark
    after ~70 frames). The returned ``counts`` prove the pipeline is full."""
    import sys

    sys.path.insert(0, "benchmarks")
    from pipeline_e2e import measure

    stack = _AP_STACK.get("stack")
    kw = {}
    if stack is not None:
        kw = dict(
            n_background=1500, points_per_object=200, n_static=10, n_dynamic=10,
            x_range="path",  # spread static objects along each segment's ego path
            dynamic_motion="traffic",  # dynamics cruise with the ego, stay in view
            score_thresh=0.75,  # the reference tracker's threshold (trained
            # detector scores support it; the 0.1 default exists for the
            # near-random fresh-init fallback path)
        )
    return measure(n_frames=n_frames, detector_stack=stack, **kw)


def measure_detector_ap_synthetic(epochs=60, n_scenes=4, n_frames=16, bsz=8):
    """From-scratch short train of the synthetic PointPillars config, scored by
    the in-framework AP evaluator — the driver-visible detector-quality gate
    (VERDICT r3 item 5). Guards the whole train path (data -> targets -> train
    step -> decode -> NMS -> eval) against silent numerics regressions; the
    measurable stand-in for the environment-blocked real-Waymo mAPH target.
    tests/test_detector_quality_gate.py asserts the hard floor in CI."""
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdal.data.detection import DetectionDataset
    from tdal.data.synthetic import make_synthetic_dataset
    from tdal.data.waymo_schema import reorganize_info
    from tdal.models.builder import (
        build_assigner,
        build_detector,
        build_test_cfg,
        build_voxel_config,
    )
    from tdal.pipeline.detector_engine import make_detector_steps, predictions_to_host
    from tdal.pipeline.detector_run import detection_batches
    from tdal.runtime.config import Config
    from tdal.runtime.schedules import adam_with_schedule, one_cycle
    from tdal.runtime.train_state import TrainState, init_model
    from tdal.utils.detection_metrics import (
        detections_to_eval_format,
        evaluate_detection,
        gt_from_annos,
    )

    with tempfile.TemporaryDirectory() as tmp:
        infos, _ = make_synthetic_dataset(
            tmp, n_scenes=n_scenes, n_frames=n_frames, seed=1, n_static=3,
            n_dynamic=2, points_per_object=200, n_background=1500,
        )
        cfg = Config.fromfile(str(_ROOT / "configs/synthetic/pp_tiny.py"))
        voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
        det = build_detector(cfg.model, voxel_cfg)
        assigner = build_assigner(cfg.train_cfg["assigner"], det)
        test_cfg = build_test_cfg(cfg.test_cfg, det, voxel_cfg)
        names = cfg.data["train"]["class_names"]
        train_ds = DetectionDataset(
            infos, class_names=names, assigner=assigner, voxel_cfg=voxel_cfg,
            mode="train", max_points=4096,
        )
        val_ds = DetectionDataset(
            infos, class_names=names, assigner=assigner, voxel_cfg=voxel_cfg,
            mode="val", max_points=4096, shuffle_points=False,
        )
        steps = max(1, len(train_ds) // bsz) * epochs
        lr, mom = one_cycle(1e-3, steps)
        tx = adam_with_schedule(lr, weight_decay=0.01, grad_clip=35.0, momentum_schedule=mom)
        ex = train_ds[0]
        key = jax.random.PRNGKey(0)
        params, bs = init_model(det, {"params": key}, jnp.asarray(np.stack([ex["points"]] * bsz)))
        state = TrainState.create(params, tx, bs)
        code_w = cfg.model["bbox_head"]["code_weights"]
        train_step, predict_step = make_detector_steps(det, test_cfg, code_w, donate=False)
        for ep in range(epochs):
            for batch in detection_batches(train_ds, bsz, shuffle=True, seed=ep):
                for k in ("n_valid", "token", "gt_boxes_and_cls"):
                    batch.pop(k, None)
                batch = {
                    k: ([jnp.asarray(x) for x in v] if isinstance(v, list) else jnp.asarray(v))
                    for k, v in batch.items()
                }
                state, _logs = train_step(state, batch)
        detections = {}
        for batch in detection_batches(val_ds, bsz, shuffle=False, prefetch=False):
            n_valid = batch.pop("n_valid")
            tokens = batch.pop("token")
            preds = predict_step(state, jnp.asarray(batch["points"]))
            preds = {k: np.asarray(v) for k, v in preds.items()}
            detections.update(predictions_to_host(preds, tokens[:n_valid]))
        gts = gt_from_annos(reorganize_info(infos))
        m = evaluate_detection(
            detections_to_eval_format(detections), gts, iou_thresholds={"VEHICLE": 0.3}
        )
        ap = m.get("VEHICLE_AP", 0.0)
        # Stash the TRAINED detector for the e2e metric (VERDICT r4 item 6):
        # a fresh-init detector emits near-random boxes, so the e2e track
        # population grows unboundedly and the metric characterizes a regime
        # the real pipeline never sees. The trained stack bounds it.
        _AP_STACK["stack"] = (voxel_cfg, det, assigner, test_cfg, code_w, state, 4096)
        return {"ap_iou03": round(float(ap), 4), "epochs": epochs,
                "metrics": {k: round(float(v), 4) for k, v in m.items()}}


def _load_state():
    try:
        return json.loads(_STATE_PATH.read_text())
    except Exception:
        return {}


_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _assemble_and_print(results, extra, baseline, backend):
    """Assemble the ONE JSON line from whatever has completed and print it.

    Called exactly once — either by main() after the metric sequence, or by
    the deadline watchdog if a metric overruns mid-flight (the per-metric
    budget checks run BEFORE each metric starts; they cannot stop one that
    blows through its estimate — round 3 lost all perf evidence that way)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True

    ap_gate = results.get("detector_ap_synthetic")
    if ap_gate:
        extra.append({"metric": "detector_ap_synthetic", "value": ap_gate["ap_iou03"],
                      "unit": f"VEHICLE AP@IoU0.3, {ap_gate['epochs']}ep from scratch",
                      "all": ap_gate["metrics"]})
    vn_stats = results.get("voxelnet_full_grid")
    if vn_stats:
        extra.append({"metric": "voxelnet_forward_ms_full_grid",
                      **_stats_ms(vn_stats),
                      "unit": "ms/frame (41x1504x1504, 178k voxels)"})
    ts_stats = results.get("voxelnet_two_stage")
    if ts_stats:
        extra.append({"metric": "voxelnet_two_stage_predict_ms_per_frame",
                      **_stats_ms(ts_stats),
                      "unit": "ms/frame (production offboard config, B=2)"})
    pp = results.get("pointpillars")
    if pp:
        train_stats, pred_stats, pp_tflops, pp_mfu = pp
        extra.append({"metric": "pointpillars_train_step_ms_b2",
                      **_stats_ms(train_stats), "unit": "ms",
                      "model_tflops": pp_tflops, "mfu_vs_v5e_bf16": pp_mfu})
        fps = {
            "value": round(2 / pred_stats["median"], 1),
            "min": round(2 / pred_stats["max"], 1),
            "max": round(2 / pred_stats["min"], 1),
            "repeats": pred_stats["repeats"],
        }
        extra.append({"metric": "detector_frames_per_sec_b2", **fps,
                      "unit": "frames/sec (decode+NMS incl.)"})
    vox_stats = results.get("voxelize")
    if vox_stats:
        extra.append({"metric": "voxelize_180k_points_ms", **_stats_ms(vox_stats),
                      "unit": "ms"})
    dyn_stats = results.get("dynamic_labeler")
    if dyn_stats:
        extra.append({"metric": "dynamic_labeler_train_step_ms_b32",
                      **_stats_ms(dyn_stats), "unit": "ms"})
    td_stats = results.get("trackdata_extraction")
    if td_stats:
        extra.append({"metric": "trackdata_extraction_ms_per_frame",
                      **_stats_ms(td_stats),
                      "unit": "ms/frame (CANONICAL: 24f, 128 boxes, 28k pts, tracking)"})
    e2e = next((v for k, v in results.items() if k.startswith("pipeline_e2e")), None)
    if e2e:
        extra.append({"metric": "pipeline_end_to_end_frames_per_sec",
                      "value": round(e2e["frames_per_sec"], 2),
                      "unit": "frames/sec (detect+track+extract+motion+label, "
                              f"{e2e['n_frames']}f segment)",
                      "stage_s": e2e["stage_s"],
                      "counts": e2e.get("counts", {})})

    fwd_stats = results.get("static_labeler_forward")
    if fwd_stats:
        value = B / fwd_stats["median"]
        vmin, vmax = B / fwd_stats["max"], B / fwd_stats["min"]
    else:
        value, vmin, vmax = 0.0, 0.0, 0.0
    # Pure device throughput (single-dispatch lax.scan variant): headline
    # minus host/tunnel dispatch overhead — the round-4 26.6k-vs-51.4k
    # discrepancy axis (VERDICT r4 item 3).
    device_rate = (
        round(B / fwd_stats["scan_median"], 1)
        if fwd_stats and fwd_stats.get("scan_median")
        else None
    )
    print(
        json.dumps(
            {
                "metric": "static_labeler_forward_sets_per_sec_b32_n512",
                "backend": backend,
                "value": round(value, 1),
                "min": round(vmin, 1),
                "max": round(vmax, 1),
                "device_rate_scan": device_rate,
                "unit": "object point-sets/sec",
                "vs_baseline": round(value / baseline, 2) if baseline else 0.0,
                "budget_s": BUDGET_S,
                "elapsed_s": round(time.monotonic() - _T0, 1),
                "extra": extra,
            }
        ),
        flush=True,
    )


def main():
    extra = []
    results = {}
    _enable_compile_cache()
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        backend = "unknown"

    # Adaptive cost estimates: last measured elapsed x1.4, else cold defaults.
    state_est = _load_state()
    new_est = dict(state_est)
    in_flight = [None]

    # Deadline watchdog: if a metric overruns past the budget (+grace), print
    # the line from completed results and exit 0 — the ONE JSON line always
    # reaches the driver even when a single metric stalls (tunnel slow phase,
    # uncached compile). Grace covers a final host fetch in flight.
    baseline_box = [state_est.get("torch_cpu_baseline_value", 0.0)]

    def _watchdog():
        rem = BUDGET_S + 90.0 - (time.monotonic() - _T0)
        if rem > 0:
            time.sleep(rem)
        if not _EMITTED:
            if in_flight[0]:
                extra.append({"metric": in_flight[0], "skipped": "deadline",
                              "note": "overran its estimate; killed by watchdog"})
            _assemble_and_print(results, extra, baseline_box[0], backend)
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    only = os.environ.get("TDAL_BENCH_ONLY")

    def guard(name, fn, cold_est_s=30.0, reserve_s=15.0):
        """Run fn if it fits the remaining budget; else emit a skip record.

        reserve_s keeps headroom for the final JSON print + cheaper
        must-run metrics still queued. TDAL_BENCH_ONLY=<substring> restricts
        the run to matching metrics (maintenance: re-seed one metric's
        .bench_state.json estimate after a cache-warming run without paying
        for the whole suite)."""
        if only and only not in name:
            return None
        est = state_est.get(name, cold_est_s) * (1.4 if name in state_est else 1.0)
        if _remaining() < est + reserve_s:
            extra.append({"metric": name, "skipped": "budget",
                          "est_s": round(est, 1), "remaining_s": round(_remaining(), 1)})
            return None
        t0 = time.monotonic()
        in_flight[0] = name
        try:
            result = fn()
            new_est[name] = round(time.monotonic() - t0, 1)
            # persist immediately: if a later metric overruns and the driver
            # kills the process, completed measurements still inform the
            # next run's budgeting
            try:
                _STATE_PATH.write_text(json.dumps(new_est, indent=1))
            except Exception:
                pass
            if result is not None:
                results[name] = result
            return result
        except Exception as e:
            traceback.print_exc()
            extra.append({"metric": name, "error": f"{type(e).__name__}: {e}"})
            return None
        finally:
            in_flight[0] = None

    # Phase A — the headline metric first (it anchors the JSON line), then the
    # cheap metrics (seconds each).
    guard("static_labeler_forward", measure_labeler_forward, 120)
    baseline = guard("torch_cpu_baseline", measure_torch_cpu_baseline, 60)
    if baseline:
        new_est["torch_cpu_baseline_value"] = round(baseline, 1)
    else:
        # budget-skipped or failed: the torch reference speed is a property of
        # this machine, not of tdal code — reuse the last measured value so
        # vs_baseline stays meaningful instead of dividing by 1.0
        baseline = state_est.get("torch_cpu_baseline_value", 1.0)
    baseline_box[0] = baseline
    guard("voxelize", measure_voxelize, 30)
    guard("dynamic_labeler", measure_dynamic_labeler, 60)
    guard("trackdata_extraction", measure_trackdata_extraction, 60)

    # Phase B — expensive metrics in descending value order, each behind a
    # remaining-budget check (VERDICT r3 item 1). The two-stage predict goes
    # FIRST: it is the 4-round-old north-star number (tools/dist_test.py on
    # the production config) and must not lose the budget race again
    # (VERDICT r4 item 2). detector_ap_synthetic runs before the e2e chain
    # so the e2e can reuse its trained detector (VERDICT r4 item 6).
    guard("voxelnet_two_stage", measure_voxelnet_two_stage_predict, 2400)
    guard("pointpillars", measure_pointpillars, 200)
    guard("voxelnet_full_grid", measure_voxelnet_full_grid, 700)
    guard("detector_ap_synthetic", measure_detector_ap_synthetic, 400)
    e2e_frames = int(os.environ.get("TDAL_BENCH_E2E_FRAMES", "200"))
    guard(f"pipeline_e2e_{e2e_frames}f",
          lambda: measure_pipeline_e2e(n_frames=e2e_frames), 900)

    try:
        _STATE_PATH.write_text(json.dumps(new_est, indent=1))
    except Exception:
        traceback.print_exc()

    _assemble_and_print(results, extra, baseline, backend)


if __name__ == "__main__":
    main()

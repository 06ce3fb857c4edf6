"""Two-stage PointPillars (production config) train/predict at Waymo scale.

Builds the REAL configs/waymo/pp/two_stage config (no shrinking) and times one
jit'd train step and the predict step at B=2 x 180k points.
Usage: python benchmarks/two_stage_bench.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tdal.core.targets import assign_centernet_targets
from tdal.core.voxel import pad_points
from tdal.data.detection import collate_detection
from tdal.models.builder import (
    build_assigner,
    build_test_cfg,
    build_two_stage_engine,
    build_detector,
    build_voxel_config,
)
from tdal.pipeline.two_stage_engine import make_frozen_tx
from tdal.runtime.config import Config
from tdal.runtime.train_state import TrainState
from tdal.utils.timing import chain, force_completion, timeit_chained

import os

CFG = Path(__file__).resolve().parent.parent / os.environ.get(
    "TDAL_TS_CONFIG",
    "configs/waymo/pp/two_stage/waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch.py",
)


def main():
    cfg = Config.fromfile(str(CFG))
    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
    first_cfg = cfg.model["first_stage_cfg"]
    detector = build_detector(first_cfg, voxel_cfg)
    assigner = build_assigner(cfg.train_cfg["assigner"], detector)
    test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    engine = build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = pad_points(pts, 180000)
    boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
    t = assign_centernet_targets(
        boxes, np.array([1], np.int32), assigner, voxel_cfg.grid_size,
        voxel_cfg.point_cloud_range, voxel_cfg.voxel_size,
    )
    items = [dict(t, points=padded, token=f"t{i}") for i in range(2)]
    batch = collate_detection(items)
    batch.pop("token")
    batch = {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in batch.items()
    }
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params, bs = engine.init(key, batch["points"], batch["gt_boxes_and_cls"])
    force_completion(params)
    print(f"init {time.perf_counter() - t0:.0f}s")
    tx = make_frozen_tx(optax.adam(1e-3)) if engine.freeze_first else optax.adam(1e-3)
    state = TrainState.create(params, tx, bs)
    train_step, predict_step = engine.make_steps(donate=False)

    t0 = time.perf_counter()
    s2, logs = train_step(state, batch, key)
    force_completion(s2.params)
    print(f"train compile+1st {time.perf_counter() - t0:.0f}s loss={float(logs['loss']):.3f}")

    def tchain(c):
        s, _ = train_step(state, batch, key)
        return chain(c, jax.tree_util.tree_leaves(s.params)[0])

    dt = timeit_chained(tchain, jnp.zeros(()), iters=10, warmup=2)
    print(f"two-stage train step b2: {dt*1e3:.1f} ms")

    def pchain(c, p):
        return chain(c, predict_step(state, p))

    dt = timeit_chained(pchain, jnp.zeros(()), batch["points"], iters=10, warmup=2)
    print(f"two-stage predict b2: {dt*1e3:.1f} ms ({dt/2*1e3:.1f} ms/frame)")


if __name__ == "__main__":
    main()

"""Stage-by-stage timing of the production VoxelNet two-stage predict path.

Splits predict into its device phases (voxelize, backbone, RPN+head, decode+NMS,
BEV-extract + RoI head + post) by jitting each piece separately and chaining
honest timings, to localize where the ms/frame goes. Usage:
    python benchmarks/two_stage_profile.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
from tdal.models.center_head import predict as head_predict
from tdal.runtime.config import Config
from tdal.runtime.train_state import TrainState
from tdal.utils.timing import chain, force_completion, timeit_chained

CFG = "configs/waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_sweep_two_stage_bev_5point_ft_6epoch_freeze_with_vel.py"


def main():
    cfg = Config.fromfile(CFG)
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
    t0 = time.perf_counter()
    params, bs = engine.init(key, batch_points, gt)
    force_completion(params)
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)
    state = TrainState.create(params, optax.adam(1e-3), bs)
    vf = {"params": state.params["first"], "batch_stats": state.batch_stats["first"]}

    def time_fn(name, fn, *args, iters=3):
        jfn = jax.jit(fn)
        out = jfn(*args)
        force_completion(out)

        def body(c, *a):
            return chain(c, jfn(*a))

        dt = timeit_chained(body, jnp.zeros(()), *args, iters=iters, warmup=1)
        print(f"{name}: {dt*1e3:.1f} ms (b2)", flush=True)
        return out

    # phase 1: first stage full forward -> preds + bev
    def first_fwd(points):
        return detector.apply(vf, points, train=False, return_feature=True)

    preds_bev = time_fn("first.apply (vox+backbone+rpn+head)", first_fwd, batch_points)
    preds_dicts, bev = preds_bev

    # phase 2: decode + NMS
    def decode(preds_dicts):
        return head_predict(preds_dicts, test_cfg, detector.num_classes)

    boxes = time_fn("head predict (decode+NMS)", decode, preds_dicts)

    # phase 3: everything downstream (bev extract + roi head + post)
    def downstream(boxes, bev):
        from tdal.pipeline.two_stage_engine import (
            generate_predicted_boxes,
            get_box_centers,
            two_stage_post_process,
        )

        raw = boxes["box3d_lidar"]
        valid = boxes["valid"]
        centers = get_box_centers(raw, engine.num_point)
        feats = engine.bev_extractor(bev, centers)
        rois = raw
        if raw.shape[-1] == 9:
            rois = raw[..., [0, 1, 2, 3, 4, 5, 8, 6, 7]]
        rois = rois * valid[..., None]
        roi_labels = jnp.where(valid, boxes["label_preds"] + 1, 0)
        roi_scores = jnp.where(valid, boxes["scores"], 0.0)
        feats = feats * valid[..., None]
        rcnn_cls, rcnn_reg = engine.roi_head.apply(
            {"params": state.params["roi"], "batch_stats": state.batch_stats["roi"]},
            feats,
            train=False,
        )
        batch_box_preds = generate_predicted_boxes(rois, rcnn_reg)
        return two_stage_post_process(
            batch_box_preds, rcnn_cls, roi_scores, roi_labels, valid
        )

    time_fn("bev-extract + roi head + post", downstream, boxes, bev)

    # whole step for reference
    _, predict_step = engine.make_steps(donate=False)

    def pchain(c, p):
        return chain(c, predict_step(state, p))

    out = predict_step(state, batch_points)
    force_completion(out)
    dt = timeit_chained(pchain, jnp.zeros(()), batch_points, iters=3, warmup=1)
    print(f"full predict_step: {dt*1e3:.1f} ms (b2) = {dt/2*1e3:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

"""Two-stage detector tests: BEV gather, proposal targets, roi decode, end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdal.core.targets import AssignerConfig, assign_centernet_targets
from tdal.core.voxel import VoxelConfig, pad_points
from tdal.data.detection import collate_detection
from tdal.models.detectors import PointPillars
from tdal.models.two_stage import (
    BEVFeatureExtractor,
    RoIHead,
    RoiTargetConfig,
    assign_roi_targets,
    bilinear_interpolate,
    generate_predicted_boxes,
    get_box_centers,
    proposal_targets,
)
from tdal.pipeline.two_stage_engine import TwoStageEngine, make_frozen_tx
from tdal.runtime.train_state import TrainState

TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
VOX = VoxelConfig(
    point_cloud_range=(-8, -8, -2, 8, 8, 2),
    voxel_size=(0.5, 0.5, 4.0),
    max_points_per_voxel=8,
    max_voxels=1024,
)
TEST_CFG = dict(
    post_center_limit_range=[-10, -10, -5, 10, 10, 5],
    nms=dict(nms_pre_max_size=256, nms_post_max_size=32, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-8, -8],
    out_size_factor=1,
    voxel_size=[0.5, 0.5],
)
BOX = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0.0, 0.0, 0.3]], np.float32)


def test_bilinear_interpolate_exact():
    im = jnp.arange(12.0).reshape(3, 4, 1)
    # exact grid points
    v = bilinear_interpolate(im, jnp.array([1.0, 2.0]), jnp.array([0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(v)[:, 0], [1.0, 10.0])
    # midpoint
    v = bilinear_interpolate(im, jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], (0 + 1 + 4 + 5) / 4)


def test_get_box_centers_five_point():
    boxes = jnp.asarray(BOX[None, :, [0, 1, 2, 3, 4, 5, 8]])  # (1, 1, 7)
    pts = get_box_centers(boxes, 5)
    assert pts.shape == (1, 1, 5, 3)
    p = np.asarray(pts)[0, 0]
    np.testing.assert_allclose(p[0], BOX[0, :3], atol=1e-6)
    # side midpoints are half-dim away from center
    d = np.linalg.norm(p[1:, :2] - BOX[0, :2], axis=1)
    np.testing.assert_allclose(np.sort(d), [0.9, 0.9, 2.4, 2.4], atol=1e-5)


def test_assign_roi_targets_identity_roi():
    """GT == ROI -> residuals all zero (and heading flip keeps 0)."""
    rois = jnp.asarray(np.tile(BOX[:, [0, 1, 2, 3, 4, 5, 8]], (1, 1)).reshape(1, 1, 7))
    gt = jnp.concatenate([rois, jnp.ones((1, 1, 1))], axis=-1)
    out = assign_roi_targets(rois, gt)
    np.testing.assert_allclose(np.asarray(out)[0, 0, :7], 0.0, atol=1e-6)


def test_generate_predicted_boxes_roundtrip():
    """decode(assign(gt)) must recover the GT box."""
    rng = np.random.default_rng(0)
    rois = rng.uniform(-5, 5, (2, 8, 7)).astype(np.float32)
    rois[..., 3:6] = rng.uniform(1, 3, (2, 8, 3))
    gt = rois.copy()
    gt[..., :3] += rng.uniform(-0.5, 0.5, (2, 8, 3))
    gt[..., 6] += rng.uniform(-0.3, 0.3, (2, 8))
    gt_aug = np.concatenate([gt, np.ones((2, 8, 1), np.float32)], -1)
    residuals = assign_roi_targets(jnp.asarray(rois), jnp.asarray(gt_aug))
    # decode: residual (canonical) -> world; note decode adds roi dims to reg
    reg = np.asarray(residuals)[..., :7].copy()
    reg[..., 3:6] = gt[..., 3:6] - rois[..., 3:6]  # decode expects dim deltas
    decoded = generate_predicted_boxes(jnp.asarray(rois), jnp.asarray(reg))
    d = np.asarray(decoded)
    np.testing.assert_allclose(d[..., :6], gt[..., :6], atol=1e-4)
    dh = (d[..., 6] - gt[..., 6] + np.pi / 2) % np.pi - np.pi / 2
    np.testing.assert_allclose(dh, 0.0, atol=1e-4)  # heading mod pi (flip-invariant)


def test_proposal_targets_shapes_and_labels():
    rng = jax.random.PRNGKey(0)
    K, G, M = 32, 8, 16
    rois = np.zeros((1, K, 7), np.float32)
    rois[0, :, 3:6] = 2.0
    rois[0, :, 0] = np.arange(K) * 4.0  # spread out
    gt = np.zeros((1, G, 8), np.float32)
    gt[0, 0] = [0, 0, 0, 2, 2, 2, 0, 1]  # overlaps roi 0 exactly
    cfg = RoiTargetConfig(roi_per_image=M)
    t = proposal_targets(
        rng,
        jnp.asarray(rois),
        jnp.ones((1, K)),
        jnp.ones((1, K), jnp.int32),
        jnp.zeros((1, K, 10)),
        jnp.asarray(gt),
        cfg,
    )
    assert t["rois"].shape == (1, M, 7)
    ious = np.asarray(t["gt_iou_of_rois"][0])
    # roi 0 (exact match, iou 1.0) must be sampled as fg in slot 0
    assert ious[0] == pytest.approx(1.0, abs=1e-5)
    assert np.asarray(t["rcnn_cls_labels"][0])[0] == pytest.approx(1.0)
    assert np.asarray(t["reg_valid_mask"][0])[0] == 1
    # bg slots have label 0
    assert np.asarray(t["rcnn_cls_labels"][0])[-1] == pytest.approx(0.0)


def _two_stage_setup():
    det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), rpn_layer_nums=(1, 1, 1))
    roi_head = RoIHead(shared_fc=(64, 64), cls_fc=(64,), reg_fc=(64,), code_size=7)
    bev = BEVFeatureExtractor(
        pc_start=(-8, -8), voxel_size=(0.5, 0.5), out_stride=1
    )
    engine = TwoStageEngine(
        det, roi_head, TEST_CFG, bev,
        roi_cfg=RoiTargetConfig(roi_per_image=16),
        code_weights_roi=(1.0,) * 7,
        freeze_first=True,
    )
    rng = np.random.default_rng(0)
    local = (rng.random((300, 3)) - 0.5) * BOX[0, 3:6][[1, 0, 2]]
    c, s = np.cos(0.3), np.sin(0.3)
    obj = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]) + BOX[0, :3]
    pts = np.concatenate([obj, rng.uniform(-8, 8, (200, 3))], 0).astype(np.float32)
    pts = np.concatenate([pts, np.ones((len(pts), 2), np.float32)], 1)
    padded = pad_points(pts, 512)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=50)
    t = assign_centernet_targets(
        BOX, np.array([1], np.int32), asg, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size
    )
    items = [dict(t, points=padded, token=f"t{i}") for i in range(2)]
    batch = collate_detection(items)
    batch.pop("token")
    batch = {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in batch.items()
    }
    return engine, batch


def test_two_stage_trains_and_predicts():
    engine, batch = _two_stage_setup()
    key = jax.random.PRNGKey(0)
    params, bs = engine.init(key, batch["points"], batch["gt_boxes_and_cls"])
    tx = make_frozen_tx(optax.adam(1e-3))
    state = TrainState.create(params, tx, bs)
    train_step, predict_step = engine.make_steps(donate=False)
    first_before = jax.tree_util.tree_leaves(state.params["first"])[0]
    l0 = None
    for _ in range(5):
        state, logs = train_step(state, batch, key)
        if l0 is None:
            l0 = float(logs["loss"])
    assert float(logs["loss"]) < l0
    # frozen first stage params unchanged
    first_after = jax.tree_util.tree_leaves(state.params["first"])[0]
    np.testing.assert_array_equal(np.asarray(first_before), np.asarray(first_after))
    preds = predict_step(state, batch["points"])
    assert preds["box3d_lidar"].shape[:2] == (2, 32)
    assert preds["scores"].shape == (2, 32)
    assert preds["valid"].dtype == jnp.bool_

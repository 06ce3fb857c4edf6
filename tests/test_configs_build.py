"""Every config under configs/waymo/** builds and runs one tiny train step.

Closes the config-matrix parity check: the reference ships 11 waymo configs
(configs/waymo/{pp,voxelnet}{,/two_stage}); each must construct through
build_detector / build_two_stage_engine and execute a step. The voxel grid and
NMS sizes are shrunk to test scale; the model tree, heads, code weights, assigner
factors and loss weights come verbatim from each config file.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdal.core.targets import assign_centernet_targets
from tdal.core.voxel import pad_points
from tdal.data.detection import collate_detection
from tdal.models.builder import (
    build_assigner,
    build_detector,
    build_test_cfg,
    build_two_stage_engine,
    build_voxel_config,
)
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.pipeline.two_stage_engine import make_frozen_tx
from tdal.runtime.config import Config
from tdal.runtime.train_state import TrainState, init_model

REPO = Path(__file__).resolve().parent.parent
CONFIGS = sorted((REPO / "configs" / "waymo").rglob("*.py"))

# Test-size grid shared by all configs: 32x32x1 voxels.
TINY_RANGE = [-8.0, -8.0, -2.0, 8.0, 8.0, 4.0]
TINY_VOXEL = [0.5, 0.5, 6.0]
BOX = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0.0, 0.0, 0.3]], np.float32)


def _tiny_batch(assigner, voxel_cfg, batch=2, n_pts=512):
    rng = np.random.default_rng(0)
    local = (rng.random((300, 3)) - 0.5) * BOX[0, 3:6][[1, 0, 2]]
    c, s = np.cos(0.3), np.sin(0.3)
    obj = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]) + BOX[0, :3]
    pts = np.concatenate([obj, rng.uniform(-8, 8, (200, 3))], 0).astype(np.float32)
    pts = np.concatenate([pts, np.ones((len(pts), 2), np.float32)], 1)
    padded = pad_points(pts, n_pts)
    t = assign_centernet_targets(
        BOX,
        np.array([1], np.int32),
        assigner,
        voxel_cfg.grid_size,
        voxel_cfg.point_cloud_range,
        voxel_cfg.voxel_size,
    )
    items = [dict(t, points=padded, token=f"t{i}") for i in range(batch)]
    out = collate_detection(items)
    out.pop("token")
    return {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in out.items()
    }


def _shrink(cfg):
    """Swap the Waymo-scale grid/NMS sizes for test-scale ones, in place."""
    cfg.voxel_generator["range"] = TINY_RANGE
    cfg.voxel_generator["voxel_size"] = TINY_VOXEL
    cfg.voxel_generator["max_voxel_num"] = [512, 512]
    cfg.test_cfg["nms"] = dict(
        nms_pre_max_size=64, nms_post_max_size=32, nms_iou_threshold=0.7
    )
    cfg.test_cfg["pc_range"] = TINY_RANGE[:2]
    cfg.test_cfg["voxel_size"] = TINY_VOXEL[:2]
    cfg.test_cfg["post_center_limit_range"] = [-10, -10, -5, 10, 10, 5]
    cfg.train_cfg["assigner"]["max_objs"] = 50
    if cfg.model["type"] == "TwoStageDetector":
        sec = cfg.model["second_stage_modules"][0]
        sec["pc_start"] = TINY_RANGE[:2]
        sec["voxel_size"] = TINY_VOXEL[:2]
        tc = cfg.model["roi_head"]["model_cfg"]["TARGET_CONFIG"]
        tc["ROI_PER_IMAGE"] = 16


_STEPPED_SIGNATURES = set()


def _model_signature(cfg):
    """Configs that build byte-identical models (e.g. 3epoch vs 6epoch) only
    need the expensive compiled step once; the rest just build."""
    import json

    tree = {k: v for k, v in cfg.model.items() if k not in ("pretrained",)}
    return json.dumps(tree, sort_keys=True, default=str)


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=lambda p: p.stem)
def test_config_builds_and_steps(cfg_path):
    cfg = Config.fromfile(str(cfg_path))
    _shrink(cfg)
    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
    two_stage = cfg.model["type"] == "TwoStageDetector"
    model_cfg = cfg.model["first_stage_cfg"] if two_stage else cfg.model
    detector = build_detector(model_cfg, voxel_cfg)
    assigner = build_assigner(cfg.train_cfg["assigner"], detector)
    test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    sig = _model_signature(cfg)
    if sig in _STEPPED_SIGNATURES:
        if two_stage:
            build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)
        return
    _STEPPED_SIGNATURES.add(sig)

    batch = _tiny_batch(assigner, voxel_cfg)
    key = jax.random.PRNGKey(0)

    if two_stage:
        engine = build_two_stage_engine(cfg.model, voxel_cfg, test_cfg)
        params, bs = engine.init(key, batch["points"], batch["gt_boxes_and_cls"])
        tx = make_frozen_tx(optax.adam(1e-3)) if engine.freeze_first else optax.adam(1e-3)
        state = TrainState.create(params, tx, bs)
        train_step, predict_step = engine.make_steps(donate=False)
        state, logs = train_step(state, batch, key)
        preds = predict_step(state, batch["points"])
    else:
        params, bs = init_model(detector, {"params": key}, batch["points"])
        state = TrainState.create(params, optax.adam(1e-3), bs)
        code_weights = list(model_cfg["bbox_head"]["code_weights"])
        train_step, predict_step = make_detector_steps(
            detector, test_cfg, code_weights=code_weights, donate=False
        )
        state, logs = train_step(state, batch)
        preds = predict_step(state, batch["points"])

    assert np.isfinite(float(logs["loss"])), cfg_path.name
    box_dim = 9 if detector.with_velocity else 7
    assert preds["box3d_lidar"].shape[-1] == box_dim
    assert preds["scores"].shape == preds["label_preds"].shape


def test_dcn_head_config_builds_and_steps():
    """dcn_head=True config parity (reference center_head.py:181,219-231):
    the builder wires DCNSepHead into every task and the model trains +
    predicts. No shipped reference config enables it, so this drives the
    switch directly on a shrunk PP config."""
    cfg = Config.fromfile(
        str(REPO / "configs" / "waymo" / "pp" / "waymo_centerpoint_pp_two_pfn_stride1_3x.py")
    )
    _shrink(cfg)
    cfg.model["bbox_head"]["dcn_head"] = True
    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
    detector = build_detector(cfg.model, voxel_cfg)
    assert detector.dcn_head
    assigner = build_assigner(cfg.train_cfg["assigner"], detector)
    test_cfg = build_test_cfg(cfg.test_cfg, detector, voxel_cfg)
    batch = _tiny_batch(assigner, voxel_cfg)
    key = jax.random.PRNGKey(0)
    params, bs = init_model(detector, {"params": key}, batch["points"])
    # the deformable branches exist in the tree
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("DCNSepHead" in jax.tree_util.keystr(kp) for kp, _ in flat)
    state = TrainState.create(params, optax.adam(1e-3), bs)
    train_step, predict_step = make_detector_steps(
        detector, test_cfg, code_weights=list(cfg.model["bbox_head"]["code_weights"]),
        donate=False,
    )
    state, logs = train_step(state, batch)
    preds = predict_step(state, batch["points"])
    assert np.isfinite(float(logs["loss"]))
    assert preds["scores"].shape == preds["label_preds"].shape


def test_config_matrix_complete():
    """11 waymo configs, mirroring the reference's configs/waymo tree."""
    rel = sorted(str(p.relative_to(REPO / "configs" / "waymo")) for p in CONFIGS)
    assert len(rel) == 11, rel
    assert "pp/two_stage/waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch.py" in rel
    assert "voxelnet/waymo_centerpoint_voxelnet_3epoch.py" in rel
    assert (
        "voxelnet/two_stage/waymo_centerpoint_voxelnet_two_stage_bev_5point_ft_6epoch_freeze.py"
        in rel
    )

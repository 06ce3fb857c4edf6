"""Config-driven detector construction.

Capability parity with reference ``det3d/models/builder.py:16-52`` (build_detector from
the config's model tree) for the tdal flax detectors. Returns the module plus derived
assigner/test configs so tools stay declarative (configs/waymo/** schema).
"""

from __future__ import annotations

import numpy as np

from tdal.core.targets import AssignerConfig
from tdal.core.voxel import VoxelConfig
from tdal.models.detectors import PointPillars, VoxelNet


def build_voxel_config(cfg_vox: dict, train: bool = True) -> VoxelConfig:
    max_num = cfg_vox["max_voxel_num"]
    if isinstance(max_num, (list, tuple)):
        max_num = max_num[0] if train else max_num[1]
    return VoxelConfig(
        point_cloud_range=tuple(cfg_vox["range"]),
        voxel_size=tuple(cfg_vox["voxel_size"]),
        max_points_per_voxel=int(cfg_vox["max_points_in_voxel"]),
        max_voxels=int(max_num),
    )


def build_detector(cfg_model: dict, voxel_cfg: VoxelConfig):
    """cfg_model: the config's `model` dict. Returns a flax detector module.

    cfg_model['dtype'] = 'bfloat16' enables bf16 compute (fp32 params/accumulation)
    — measured 14% faster train steps at Waymo scale on v5e."""
    import jax.numpy as jnp

    mtype = cfg_model["type"]
    dtype = jnp.bfloat16 if cfg_model.get("dtype") == "bfloat16" else jnp.float32
    tasks = tuple(
        dict(num_class=t["num_class"], class_names=tuple(t["class_names"]))
        for t in cfg_model["bbox_head"]["tasks"]
    )
    neck = cfg_model.get("neck", {})
    common = dict(
        voxel_cfg=voxel_cfg,
        tasks=tasks,
        dtype=dtype,
        rpn_layer_nums=tuple(neck.get("layer_nums", (3, 5, 5))),
        rpn_ds_strides=tuple(neck.get("ds_layer_strides", (1, 2, 2))),
        rpn_ds_filters=tuple(neck.get("ds_num_filters", (64, 128, 256))),
        rpn_us_strides=tuple(neck.get("us_layer_strides", (1, 2, 4))),
        rpn_us_filters=tuple(neck.get("us_num_filters", (128, 128, 128))),
        with_velocity="vel" in cfg_model["bbox_head"].get("common_heads", {}),
        # Reference center_head.py:181,219-231: config-level dcn_head switch.
        dcn_head=bool(cfg_model["bbox_head"].get("dcn_head", False)),
    )
    if mtype == "PointPillars":
        return PointPillars(
            num_filters=tuple(cfg_model["reader"].get("num_filters", (64, 64))),
            **common,
        )
    if mtype == "VoxelNet":
        return VoxelNet(**common)
    raise KeyError(f"unknown detector type {mtype!r}")


def build_two_stage_engine(cfg_model: dict, voxel_cfg: VoxelConfig, test_cfg: dict):
    """Build a TwoStageEngine from the config's TwoStageDetector model tree.

    Parity: reference TwoStageDetector construction (two_stage.py:9-46) from
    configs/waymo/*/two_stage/*.py."""
    from tdal.models.two_stage import BEVFeatureExtractor, RoIHead, RoiTargetConfig
    from tdal.pipeline.two_stage_engine import TwoStageEngine

    first = build_detector(cfg_model["first_stage_cfg"], voxel_cfg)
    mc = cfg_model["roi_head"]["model_cfg"]
    tc = mc["TARGET_CONFIG"]
    roi_head = RoIHead(
        shared_fc=tuple(mc["SHARED_FC"]),
        cls_fc=tuple(mc["CLS_FC"]),
        reg_fc=tuple(mc["REG_FC"]),
        code_size=int(cfg_model["roi_head"].get("code_size", 7)),
        dp_ratio=float(mc.get("DP_RATIO", 0.3)),
    )
    sec = cfg_model["second_stage_modules"][0]
    bev = BEVFeatureExtractor(
        pc_start=tuple(sec["pc_start"]),
        voxel_size=tuple(sec["voxel_size"]),
        out_stride=int(sec["out_stride"]),
    )
    roi_cfg = RoiTargetConfig(
        roi_per_image=int(tc["ROI_PER_IMAGE"]),
        fg_ratio=float(tc["FG_RATIO"]),
        sample_roi_by_each_class=bool(tc.get("SAMPLE_ROI_BY_EACH_CLASS", True)),
        cls_score_type=str(tc.get("CLS_SCORE_TYPE", "roi_iou")),
        cls_fg_thresh=float(tc["CLS_FG_THRESH"]),
        cls_bg_thresh=float(tc["CLS_BG_THRESH"]),
        cls_bg_thresh_lo=float(tc["CLS_BG_THRESH_LO"]),
        hard_bg_ratio=float(tc["HARD_BG_RATIO"]),
        reg_fg_thresh=float(tc["REG_FG_THRESH"]),
    )
    loss_cfg = mc.get("LOSS_CONFIG", {})
    weights = loss_cfg.get("LOSS_WEIGHTS", {})
    return TwoStageEngine(
        first,
        roi_head,
        test_cfg,
        bev,
        roi_cfg=roi_cfg,
        num_point=int(cfg_model.get("num_point", 5)),
        code_weights_first=tuple(
            cfg_model["first_stage_cfg"]["bbox_head"].get("code_weights", [1.0] * 8)
        ),
        code_weights_roi=tuple(weights.get("code_weights", [1.0] * 7)),
        first_weight=float(cfg_model["first_stage_cfg"]["bbox_head"].get("weight", 2.0)),
        freeze_first=bool(cfg_model.get("freeze", False)),
    )


def build_assigner(cfg_assigner: dict, detector) -> AssignerConfig:
    return AssignerConfig(
        tasks=[
            dict(num_class=len(t["class_names"]), class_names=list(t["class_names"]))
            for t in detector.tasks
        ],
        out_size_factor=int(cfg_assigner.get("out_size_factor", detector.out_size_factor)),
        gaussian_overlap=float(cfg_assigner.get("gaussian_overlap", 0.1)),
        max_objs=int(cfg_assigner.get("max_objs", 500)),
        min_radius=int(cfg_assigner.get("min_radius", 2)),
    )


def build_test_cfg(cfg_test: dict, detector, voxel_cfg: VoxelConfig) -> dict:
    return dict(
        post_center_limit_range=list(cfg_test["post_center_limit_range"]),
        nms=dict(cfg_test["nms"]),
        score_threshold=float(cfg_test["score_threshold"]),
        pc_range=list(cfg_test.get("pc_range", voxel_cfg.point_cloud_range[:2])),
        out_size_factor=int(cfg_test.get("out_size_factor", detector.out_size_factor)),
        voxel_size=list(cfg_test.get("voxel_size", voxel_cfg.voxel_size[:2])),
    )

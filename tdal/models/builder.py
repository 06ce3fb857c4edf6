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
    """cfg_model: the config's `model` dict. Returns a flax detector module."""
    mtype = cfg_model["type"]
    tasks = tuple(
        dict(num_class=t["num_class"], class_names=tuple(t["class_names"]))
        for t in cfg_model["bbox_head"]["tasks"]
    )
    neck = cfg_model.get("neck", {})
    common = dict(
        voxel_cfg=voxel_cfg,
        tasks=tasks,
        rpn_layer_nums=tuple(neck.get("layer_nums", (3, 5, 5))),
        rpn_ds_strides=tuple(neck.get("ds_layer_strides", (1, 2, 2))),
        rpn_ds_filters=tuple(neck.get("ds_num_filters", (64, 128, 256))),
        rpn_us_strides=tuple(neck.get("us_layer_strides", (1, 2, 4))),
        rpn_us_filters=tuple(neck.get("us_num_filters", (128, 128, 128))),
        with_velocity="vel" in cfg_model["bbox_head"].get("common_heads", {}),
    )
    if mtype == "PointPillars":
        return PointPillars(
            num_filters=tuple(cfg_model["reader"].get("num_filters", (64, 64))),
            **common,
        )
    if mtype == "VoxelNet":
        return VoxelNet(**common)
    raise KeyError(f"unknown detector type {mtype!r}")


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

"""Tiny two-stage PointPillars config over synthetic scenes (CI scale)."""

import itertools

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

first_stage_cfg = dict(
    type="PointPillars",
    pretrained=None,
    reader=dict(
        type="PillarFeatureNet",
        num_filters=[32, 32],
        voxel_size=(0.8, 0.8, 6.0),
        pc_range=(-25.6, -25.6, -2, 51.2, 25.6, 4.0),
    ),
    backbone=dict(type="PointPillarsScatter", ds_factor=1),
    neck=dict(
        type="RPN",
        layer_nums=[1, 1, 1],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[32, 64, 128],
        us_layer_strides=[1, 2, 4],
        us_num_filters=[64, 64, 64],
    ),
    bbox_head=dict(
        type="CenterHead",
        tasks=tasks,
        dataset="waymo",
        weight=2,
        code_weights=[1.0] * 8,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)},
    ),
)

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage_cfg,
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=[-25.6, -25.6],
            voxel_size=[0.8, 0.8],
            out_stride=1,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=192 * 5,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[64, 64],
            CLS_FC=[64],
            REG_FC=[64],
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=32,
                FG_RATIO=0.5,
                SAMPLE_ROI_BY_EACH_CLASS=True,
                CLS_SCORE_TYPE="roi_iou",
                CLS_FG_THRESH=0.75,
                CLS_BG_THRESH=0.25,
                CLS_BG_THRESH_LO=0.1,
                HARD_BG_RATIO=0.8,
                REG_FG_THRESH=0.55,
            ),
            LOSS_CONFIG=dict(
                CLS_LOSS="BinaryCrossEntropy",
                REG_LOSS="L1",
                LOSS_WEIGHTS={
                    "rcnn_cls_weight": 1.0,
                    "rcnn_reg_weight": 1.0,
                    "code_weights": [1.0] * 7,
                },
            ),
        ),
        code_size=7,
    ),
    num_point=5,
    freeze=True,
    NMS_POST_MAXSIZE=128,
)

assigner = dict(
    target_assigner=dict(tasks=tasks),
    out_size_factor=1,
    gaussian_overlap=0.1,
    max_objs=50,
    min_radius=2,
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-30, -30, -10.0, 60, 30, 10.0],
    nms=dict(nms_pre_max_size=1024, nms_post_max_size=128, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-25.6, -25.6],
    out_size_factor=1,
    voxel_size=[0.8, 0.8],
)

voxel_generator = dict(
    range=[-25.6, -25.6, -2, 51.2, 25.6, 4.0],
    voxel_size=[0.8, 0.8, 6.0],
    max_points_in_voxel=20,
    max_voxel_num=[4096, 4096],
)

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    class_names=class_names,
)

data = dict(
    samples_per_gpu=2,
    train=dict(info_path="", nsweeps=1, class_names=class_names, max_points=4096),
    val=dict(info_path="", nsweeps=1, class_names=class_names, max_points=4096, test_mode=True),
)

optimizer = dict(type="adam", wd=0.01)
lr_config = dict(type="one_cycle", lr_max=3e-3, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)
grad_clip = dict(max_norm=35)
total_epochs = 1
work_dir = "./work_dirs/synthetic_pp_two_stage_tiny"

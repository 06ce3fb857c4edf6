"""Two-class PointPillars CenterPoint (frozen) + BEV 5-point RoIHead second stage.

Semantic parity with reference configs/waymo/pp/two_stage/
waymo_centerpoint_pp_two_cls_two_pfn_stride1_two_stage_bev_6epoch.py:1-238 (two-class
vehicle+pedestrian task, db_sampler=None, otherwise identical to the 3-class variant).
"""

import itertools

tasks = [dict(num_class=2, class_names=["VEHICLE", "PEDESTRIAN"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

first_stage_cfg = dict(
    type="PointPillars",
    pretrained="./work_dirs/waymo_centerpoint_pp_two_cls_two_pfn_stride1_3x/checkpoints",
    reader=dict(
        type="PillarFeatureNet",
        num_filters=[64, 64],
        num_input_features=5,
        with_distance=False,
        voxel_size=(0.32, 0.32, 6.0),
        pc_range=(-74.88, -74.88, -2, 74.88, 74.88, 4.0),
    ),
    backbone=dict(type="PointPillarsScatter", ds_factor=1),
    neck=dict(
        type="RPN",
        layer_nums=[3, 5, 5],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[64, 128, 256],
        us_layer_strides=[1, 2, 4],
        us_num_filters=[128, 128, 128],
        num_input_features=64,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=128 * 3,
        tasks=tasks,
        dataset="waymo",
        weight=2,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)},
    ),
)

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage_cfg,
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=[-74.88, -74.88],
            voxel_size=[0.32, 0.32],
            out_stride=1,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=128 * 3 * 5,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[256, 256],
            CLS_FC=[256, 256],
            REG_FC=[256, 256],
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=128,
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
                    "code_weights": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
                },
            ),
        ),
        code_size=7,
    ),
    num_point=5,
    freeze=True,
    NMS_POST_MAXSIZE=500,
)

assigner = dict(
    target_assigner=dict(tasks=tasks),
    out_size_factor=1,
    dense_reg=1,
    gaussian_overlap=0.1,
    max_objs=500,
    min_radius=2,
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-80, -80, -10.0, 80, 80, 10.0],
    nms=dict(nms_pre_max_size=4096, nms_post_max_size=500, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-74.88, -74.88],
    out_size_factor=1,
    voxel_size=[0.32, 0.32],
)

dataset_type = "WaymoDataset"
nsweeps = 1
data_root = "data/Waymo"

voxel_generator = dict(
    range=[-74.88, -74.88, -2, 74.88, 74.88, 4.0],
    voxel_size=[0.32, 0.32, 6.0],
    max_points_in_voxel=20,
    max_voxel_num=[32000, 60000],
)


db_sampler = None  # reference two_cls two-stage config ships db_sampler=None

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    db_sampler=db_sampler,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    class_names=class_names,
)

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type,
        info_path=data_root + "/infos_train_01sweeps_filter_zero_gt.pkl",
        nsweeps=nsweeps,
        class_names=class_names,
        max_points=200000,
    ),
    val=dict(
        type=dataset_type,
        info_path=data_root + "/infos_val_01sweeps_filter_zero_gt.pkl",
        nsweeps=nsweeps,
        class_names=class_names,
        max_points=200000,
        test_mode=True,
    ),
)

optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True, moving_average=False)
lr_config = dict(type="one_cycle", lr_max=3e-3, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)
grad_clip = dict(max_norm=35, norm_type=2)
total_epochs = 6
work_dir = "./work_dirs/waymo_centerpoint_pp_two_cls_two_pfn_stride1_two_stage_bev_6epoch"

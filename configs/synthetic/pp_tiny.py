"""Tiny PointPillars config over the synthetic fabricated scenes: smoke/CI scale."""

import itertools

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="PointPillars",
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
        # vel head (production with_vel family): the tracker associates on
        # ct - vel*dt with a 0.8 m gate for vehicles, so without predicted
        # velocities any object moving >~0.5 m/frame fragments into sub-7-
        # frame tracks and the motion classifier never sees a dynamic one.
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={
            "reg": (2, 2), "height": (1, 2), "dim": (3, 2),
            "vel": (2, 2), "rot": (2, 2),
        },
    ),
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
total_epochs = 2
work_dir = "./work_dirs/synthetic_pp_tiny"

"""CenterPoint-VoxelNet on Waymo, two sweeps, velocity head.

Semantic parity with reference
configs/waymo/voxelnet/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo.py.
"""

import itertools

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="VoxelNet",
    # bf16 compute / fp32 params+accumulation (TPU-native production setting)
    dtype="bfloat16",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=6),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=6, ds_factor=8),
    neck=dict(
        type="RPN",
        layer_nums=[5, 5],
        ds_layer_strides=[1, 2],
        ds_num_filters=[128, 256],
        us_layer_strides=[1, 2],
        us_num_filters=[256, 256],
        num_input_features=256,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=512,
        tasks=tasks,
        dataset="waymo",
        weight=2,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={
            "reg": (2, 2), "height": (1, 2), "dim": (3, 2),
            "vel": (2, 2), "rot": (2, 2),
        },
    ),
)

assigner = dict(
    target_assigner=dict(tasks=tasks),
    out_size_factor=8,
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
    pc_range=[-75.2, -75.2],
    out_size_factor=8,
    voxel_size=[0.1, 0.1],
)

dataset_type = "WaymoDataset"
nsweeps = 2
data_root = "data/Waymo"

voxel_generator = dict(
    range=[-75.2, -75.2, -2, 75.2, 75.2, 4],
    voxel_size=[0.1, 0.1, 0.15],
    max_points_in_voxel=5,
    max_voxel_num=[180000, 400000],
)


db_sampler = dict(
    type="GT-AUG",
    enable=False,  # reference ships GT-aug disabled for waymo (db_sampler enable=False)
    db_info_path=data_root + "/dbinfos_train_{:02d}sweeps_withvelo.pkl".format(nsweeps),
    sample_groups=[
        dict(VEHICLE=15),
        dict(PEDESTRIAN=10),
        dict(CYCLIST=10),
    ],
    db_prep_steps=[
        dict(filter_by_min_num_points=dict(VEHICLE=5, PEDESTRIAN=5, CYCLIST=5)),
        dict(filter_by_difficulty=[-1]),
    ],
    rate=1.0,
)

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
    workers_per_gpu=8,
    train=dict(
        type=dataset_type,
        info_path=data_root + "/infos_train_02sweeps_filter_zero_gt.pkl",
        nsweeps=nsweeps,
        class_names=class_names,
        max_points=400000,
    ),
    val=dict(
        type=dataset_type,
        info_path=data_root + "/infos_val_02sweeps_filter_zero_gt.pkl",
        nsweeps=nsweeps,
        class_names=class_names,
        max_points=400000,
        test_mode=True,
    ),
)

optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True, moving_average=False)
lr_config = dict(type="one_cycle", lr_max=3e-3, moms=[0.95, 0.85], div_factor=10.0, pct_start=0.4)
grad_clip = dict(max_norm=35, norm_type=2)
total_epochs = 36
work_dir = "./work_dirs/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo"

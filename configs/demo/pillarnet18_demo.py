"""Tiny PillarNet-18 on the synthetic DemoDataset.

CPU-runnable end-to-end training slice (BASELINE.json config #1 analog):
small grid so tests and the compile-check stay fast.
"""

import itertools

tasks = [
    dict(stride=8, class_names=["car"]),
    dict(stride=8, class_names=["pedestrian"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

pillar_size = 0.5
point_cloud_range = [-16.0, -16.0, -5.0, 16.0, 16.0, 3.0]
post_center_limit_range = [-20.0, -20.0, -10.0, 20.0, 20.0, 10.0]

model = dict(
    type="PillarNet",
    reader=dict(
        type="DynamicPFE",
        in_channels=5,
        num_filters=(16,),
        pillar_size=pillar_size,
        pc_range=point_cloud_range,
    ),
    backbone=dict(type="PillarResNet18", in_channels=16),
    neck=dict(
        type="RPNV1",
        layer_nums=[2, 2],
        num_filters=64,
        in_channels=[128, 128],
    ),
    bbox_head=dict(
        type="CenterHead",
        tasks=tasks,
        in_channels=[64],
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={
            "reg": (2, 2),
            "height": (1, 2),
            "dim": (3, 2),
            "rot": (2, 2),
            "vel": (2, 2),
            "iou": (1, 2),
        },
        reg_iou="GIoU",
        pillar_size=pillar_size,
        point_cloud_range=point_cloud_range,
    ),
)

train_cfg = dict(
    assigner=dict(
        target_assigner=dict(tasks=tasks),
        dense_reg=1,
        gaussian_overlap=0.1,
        max_objs=100,
        min_radius=2,
        pc_range=point_cloud_range,
        pillar_size=pillar_size,
    ),
    hm_weight=1,
    bbox_weight=0.25,
    iou_weight=1,
    reg_iou_weight=0.25,
)

test_cfg = dict(
    nms=dict(
        use_rotate_nms=True,
        nms_pre_max_size=128,
        nms_post_max_size=32,
        nms_iou_threshold=0.2,
    ),
    rectifier=0.0,
    score_threshold=0.1,
    post_center_limit_range=post_center_limit_range,
)

dataset_type = "DemoDataset"

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.9, 1.1],
    global_translate_std=0.5,
    db_sampler=None,
    class_names=class_names,
)

train_pipeline = [
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="AssignLabel", cfg=train_cfg["assigner"]),
    dict(type="Reformat"),
]

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=2,
    max_points=8192,
    train=dict(
        type=dataset_type,
        num_frames=8,
        num_points=4096,
        pc_range=point_cloud_range,
        class_names=class_names,
        pipeline=train_pipeline,
    ),
    # keeps tools/dist_test.py runnable end-to-end without real data
    val=dict(
        type=dataset_type,
        num_frames=4,
        num_points=4096,
        pc_range=point_cloud_range,
        class_names=class_names,
        pipeline=[dict(type="Reformat")],
        test_mode=True,
    ),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(
    type="one_cycle", lr_max=0.001, moms=[0.95, 0.85], div_factor=10.0,
    pct_start=0.4,
)

checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
total_epochs = 1
work_dir = "./work_dirs/pillarnet18_demo"

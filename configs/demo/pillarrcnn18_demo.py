"""Pillar R-CNN at demo scale: tiny grid + synthetic DemoDataset.

CPU-runnable two-stage config for CI smoke tests (bench measurement path,
train/eval wiring) — the PillarRCNN counterpart of pillarnet18_demo.
"""

import itertools

pillar_size = 0.5
point_cloud_range = [-16.0, -16.0, -5.0, 16.0, 16.0, 3.0]
post_center_limit_range = [-18, -18, -10.0, 18, 18, 10.0]
nsweeps = 1

tasks = [
    dict(stride=8, class_names=["VEHICLE"]),
    dict(stride=4, class_names=["PEDESTRIAN", "CYCLIST"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="PillarRCNN",
    freeze=False,
    first_stage_cfg=dict(
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
            type="RPNG",
            layer_nums=[5, 5],
            num_filters=[256, 128],
            in_channels=[256, 256, 128],
        ),
        bbox_head=dict(
            type="CenterHead",
            tasks=tasks,
            in_channels=[256, 128],
            code_weights=[1.0] * 8,
            common_heads={
                "reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
            },
            reg_iou="GIoU",
            pillar_size=pillar_size,
            point_cloud_range=point_cloud_range,
        ),
    ),
    second_stage_modules=[
        dict(
            type="BEVStrideFeature",
            feature_sources=["conv3"],
            grid_size=7,
            out_stride=4,
            in_channels=128,
            share_channels=64,
            pillar_size=pillar_size,
            pc_range=point_cloud_range,
        )
    ],
    point_head=dict(
        type="PointHead",
        in_channels=64,
        num_class=1,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            CLS_FC=[256, 256],
            TARGET_CONFIG=dict(GT_EXTRA_WIDTH=[0.2, 0.2, 0.2]),
            LOSS_CONFIG=dict(
                LOSS_REG="smooth-l1",
                LOSS_WEIGHTS={"point_cls_weight": 1.0},
            ),
        ),
    ),
    roi_head=dict(
        type="RoIMIXHead",
        in_channels=64,
        mixer_type="",
        num_patches=49,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[256, 256],
            CLS_FC=[256, 256],
            REG_FC=[256, 256],
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=32,
                FG_RATIO=0.5,
                SAMPLE_ROI_BY_EACH_CLASS=True,
                CLS_SCORE_TYPE="roi_iou",
                CLS_FG_THRESH=0.7,
                CLS_BG_THRESH=0.25,
                CLS_BG_THRESH_LO=0.1,
                HARD_BG_RATIO=0.8,
                REG_FG_THRESH=0.5,
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
    bbox_weight=2,
    iou_weight=1,
    reg_iou_weight=2,
)

test_cfg = dict(
    nms=dict(
        use_multi_class_nms=True,
        nms_pre_max_size=[256, 128, 128],
        nms_post_max_size=[64, 32, 32],
        nms_iou_threshold=[0.8, 0.55, 0.55],
    ),
    rectifier=[0, 0, 0],
    score_threshold=0.1,
    post_center_limit_range=post_center_limit_range,
)

dataset_type = "DemoDataset"


train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    global_translate_std=0.5,
    class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="AssignLabel", cfg=train_cfg["assigner"]),
    dict(type="Reformat"),
]
test_pipeline = [
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Reformat"),
]

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    max_points=4096,
    train=dict(
        type=dataset_type,
        num_frames=4,
        num_points=2048,
        class_names=class_names,
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        num_frames=4,
        num_points=2048,
        test_mode=True,
        class_names=class_names,
        pipeline=test_pipeline,
    ),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(
    type="one_cycle", lr_max=0.003, moms=[0.95, 0.85], div_factor=10.0,
    pct_start=0.4,
)

checkpoint_config = dict(interval=1)
log_config = dict(interval=5)
total_epochs = 1
work_dir = "./work_dirs/pillarrcnn18_demo"

"""Tiny legacy TwoStageDetector (box-center BEV pooling, `two_stage.py:10-194`)
on the synthetic DemoDataset: PillarNet-18 first stage + 5-point
BEVFeatureExtractor + flattened-MLP RoIHead."""

import itertools

tasks = [
    dict(stride=8, class_names=["car"]),
    dict(stride=8, class_names=["pedestrian"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

pillar_size = 0.5
point_cloud_range = [-16.0, -16.0, -5.0, 16.0, 16.0, 3.0]
post_center_limit_range = [-20.0, -20.0, -10.0, 20.0, 20.0, 10.0]

first_stage = dict(
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

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage,
    num_point=5,
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=point_cloud_range[:2],
            voxel_size=[pillar_size, pillar_size],
            out_stride=8,
            num_point=5,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=64 * 5,
        add_box_param=True,
        code_size=7,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[64, 64],
            CLS_FC=[64],
            REG_FC=[64],
            DP_RATIO=0.0,
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
work_dir = "./work_dirs/twostage18_demo"

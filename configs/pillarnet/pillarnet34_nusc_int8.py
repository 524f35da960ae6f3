"""PillarNet-34 nuScenes, int8-quantized deploy configuration.

The bf16 serving config with the conv/matmul compute path — PFE MLP,
backbone, and neck — switched to the int8 deploy path (the center head
stays bf16: its int8 mode measurably costs mAP, see runtime/quantize.py).
Post-training quantization, `models/backbones/base.py`. Calibrate
activation scales before serving:
`tools/dist_test.py --int8` does it inline; `tools/export_serving.py
--int8` bakes them into the StableHLO artifact. Checkpoints are identical
to the bf16 config's. Standalone copy of the bf16 config (the config
system deliberately has no include mechanism — work-dir snapshots must
reload anywhere).
"""

import itertools

pillar_size = 0.075
point_cloud_range = [-54, -54, -5.0, 54, 54, 3.0]
post_center_limit_range = [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0]
nsweeps = 10

tasks = [
    dict(stride=8, class_names=["car"]),
    dict(stride=8, class_names=["truck", "construction_vehicle"]),
    dict(stride=8, class_names=["bus", "trailer"]),
    dict(stride=8, class_names=["barrier"]),
    dict(stride=8, class_names=["motorcycle", "bicycle"]),
    dict(stride=8, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="PillarNet",
    dtype="bfloat16",
    reader=dict(
        type="DynamicPFE",
        in_channels=5,
        num_filters=(32,),
        pillar_size=pillar_size,
        pc_range=point_cloud_range,
        quant=True,
    ),
    backbone=dict(type="PillarResNet34", in_channels=32, quant=True),
    neck=dict(
        type="RPNV1",
        layer_nums=[5, 5],
        num_filters=256,
        in_channels=[256, 256],
        quant=True,
    ),
    bbox_head=dict(
        type="CenterHead",
        # int8 head measurably costs mAP (see runtime/quantize.py) — bf16
        quant=False,
        tasks=tasks,
        in_channels=[256],
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={
            "reg": (2, 2),
            "height": (1, 2),
            "dim": (3, 2),
            "rot": (2, 2),
            "vel": (2, 2),
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
        max_objs=500,
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
        nms_pre_max_size=1000,
        nms_post_max_size=83,
        nms_iou_threshold=0.2,
    ),
    rectifier=0,
    score_threshold=0.1,
    double_flip=False,
    post_center_limit_range=post_center_limit_range,
)

dataset_type = "NuScenesDataset"
data_root = "data/nuScenes/"
train_anno = data_root + "infos_train_10sweeps_withvelo_filter_True.pkl"
val_anno = data_root + "infos_val_10sweeps_withvelo_filter_True.pkl"

db_sampler = dict(
    type="GT-AUG",
    enable=False,
    rate=1.0,
    global_random_rotation_range_per_object=[0, 0],
    db_info_path=data_root + "dbinfos_train_10sweeps_withvelo.pkl",
    sample_groups=[
        dict(car=2),
        dict(truck=3),
        dict(construction_vehicle=7),
        dict(bus=4),
        dict(trailer=6),
        dict(barrier=2),
        dict(motorcycle=6),
        dict(bicycle=6),
        dict(pedestrian=2),
        dict(traffic_cone=2),
    ],
    db_prep_steps=[
        dict(
            filter_by_min_num_points=dict(
                car=5, truck=5, bus=5, trailer=5, construction_vehicle=5,
                traffic_cone=5, barrier=5, motorcycle=5, bicycle=5,
                pedestrian=5,
            )
        ),
        dict(filter_by_difficulty=[-1]),
    ],
)

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.9, 1.1],
    global_translate_std=0.5,
    db_sampler=db_sampler,
    class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="AssignLabel", cfg=train_cfg["assigner"]),
    dict(type="Reformat"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Reformat"),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=6,
    max_points=262144,  # static point bucket (10-sweep nuScenes ~ 250k)
    train=dict(
        type=dataset_type,
        root_path=data_root,
        info_path=train_anno,
        ann_file=train_anno,
        nsweeps=nsweeps,
        class_names=class_names,
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        root_path=data_root,
        info_path=val_anno,
        test_mode=True,
        ann_file=val_anno,
        nsweeps=nsweeps,
        class_names=class_names,
        pipeline=test_pipeline,
    ),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(
    type="one_cycle", lr_max=0.001, moms=[0.95, 0.85], div_factor=10.0,
    pct_start=0.4,
)

checkpoint_config = dict(interval=1)
log_config = dict(interval=5)
total_epochs = 20
work_dir = "./work_dirs/pillarnet34_nusc_int8"

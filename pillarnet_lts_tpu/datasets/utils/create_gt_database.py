"""Offline GT-database creation for GT-AUG sampling.

Port of `det3d/datasets/utils/create_gt_database.py:16-170`: run the loading
pipeline over the train split, crop per-object points with
`points_in_rbbox`, write one .bin per object plus a dbinfos pkl keyed by
class name.
"""

import pickle
from pathlib import Path

import numpy as np

from ...core.bbox import box_np_ops
from ..builder import build_dataset


def create_groundtruth_database(
    dataset_class_name,
    data_path,
    info_path=None,
    used_classes=None,
    db_path=None,
    dbinfo_path=None,
    relative_path=True,
    nsweeps=None,
    **kwargs,
):
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset=dataset_class_name),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
    ]
    if dataset_class_name == "NuScenesDataset":
        nsweeps = nsweeps or 10
        point_features = 5
    elif dataset_class_name == "WaymoDataset":
        nsweeps = nsweeps or 1
        point_features = 5 if nsweeps == 1 else 6
    else:
        raise NotImplementedError(dataset_class_name)

    dataset = build_dataset(
        dict(
            type=dataset_class_name,
            root_path=data_path,
            info_path=info_path,
            pipeline=pipeline,
            test_mode=False,
            nsweeps=nsweeps,
            class_names=used_classes or [],
            sample=False,
        )
    )

    root_path = Path(data_path)
    suffix = f"_{nsweeps}sweeps_withvelo" if dataset_class_name == "NuScenesDataset" \
        else f"_{nsweeps}sweeps"
    db_path = Path(db_path) if db_path else root_path / f"gt_database{suffix}"
    dbinfo_path = (
        Path(dbinfo_path) if dbinfo_path
        else root_path / f"dbinfos_train{suffix}.pkl"
    )
    db_path.mkdir(parents=True, exist_ok=True)

    all_db_infos = {}
    group_counter = 0
    for index in range(len(dataset)):
        # the pipeline here ends at annotation loading, so get raw res dict
        res = dataset.get_sensor_data(index)
        if isinstance(res, tuple):
            res = res[0]
        sensor_data = res
        if "lidar" in sensor_data:
            points = sensor_data["lidar"].get("combined",
                                              sensor_data["lidar"]["points"])
            annos = sensor_data["lidar"]["annotations"]
        else:
            continue
        if annos is None:
            continue
        image_idx = sensor_data["metadata"]["token"]
        gt_boxes = annos["boxes"]
        names = np.asarray(annos["names"])
        if gt_boxes.shape[0] == 0:
            continue

        group_dict = {}
        group_ids = np.arange(gt_boxes.shape[0], dtype=np.int64)
        point_indices = box_np_ops.points_in_rbbox(points, gt_boxes)

        for i in range(gt_boxes.shape[0]):
            if used_classes is not None and names[i] not in used_classes:
                continue
            filename = f"{image_idx}_{names[i]}_{i}.bin"
            filepath = db_path / filename
            gt_points = points[point_indices[:, i]].copy()
            gt_points[:, :3] -= gt_boxes[i, :3]
            gt_points[:, :point_features].astype(np.float32).tofile(filepath)

            db_dump_path = (
                str(db_path.stem + "/" + filename) if relative_path
                else str(filepath)
            )
            db_info = {
                "name": names[i],
                "path": db_dump_path,
                "image_idx": image_idx,
                "gt_idx": i,
                "box3d_lidar": gt_boxes[i],
                "num_points_in_gt": gt_points.shape[0],
                "difficulty": 0,
            }
            local_group_id = group_ids[i]
            if local_group_id not in group_dict:
                group_dict[local_group_id] = group_counter
                group_counter += 1
            db_info["group_id"] = group_dict[local_group_id]
            all_db_infos.setdefault(names[i], []).append(db_info)

        if index % 100 == 0:
            print(f"gt database: {index}/{len(dataset)}")

    for k, v in all_db_infos.items():
        print(f"load {len(v)} {k} database infos")
    with open(dbinfo_path, "wb") as f:
        pickle.dump(all_db_infos, f)

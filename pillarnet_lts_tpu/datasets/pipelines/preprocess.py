"""Train/val preprocessing + CenterNet target assignment (CPU numpy).

Ports of the reference pipeline stages
(`det3d/datasets/pipelines/preprocess.py:27-350`): class filtering, GT-AUG
database sampling injection, global augmentations, point shuffling, then the
per-task gaussian heatmap / index / regression target encoding. Target
encoding is byte-compatible (same radius rounding, same ``ind = y*W + x``
flattening, same 10-dim anno_box layout) since mAP parity is decided here
(SURVEY.md §7 hard part 5).
"""

import numpy as np

from ...core.bbox import box_np_ops
from ...core.sampler import augment as prep
from ...core.target.center_target import draw_gaussian, gaussian_radius
from ..registry import PIPELINES


def _dict_select(dict_, inds):
    for k, v in dict_.items():
        if isinstance(v, dict):
            _dict_select(v, inds)
        else:
            dict_[k] = v[inds]


def drop_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x not in used_classes]
    return np.array(inds, dtype=np.int64)


@PIPELINES.register_module
class Preprocess:
    """`Preprocess` (`pipelines/preprocess.py:27-159`)."""

    def __init__(self, cfg=None, **kwargs):
        self.shuffle_points = cfg["shuffle_points"]
        self.min_points_in_gt = cfg.get("min_points_in_gt", -1)
        self.mode = cfg["mode"]
        if self.mode == "train":
            self.global_rotation_noise = cfg["global_rot_noise"]
            self.global_scaling_noise = cfg["global_scale_noise"]
            self.global_translate_std = cfg.get("global_translate_std", 0)
            self.class_names = cfg["class_names"]
            db_sampler_cfg = cfg.get("db_sampler", None)
            if db_sampler_cfg is not None and db_sampler_cfg.get("enable", True):
                from ...core.sampler.db_sampler import build_db_sampler

                self.db_sampler = build_db_sampler(db_sampler_cfg)
            else:
                self.db_sampler = None
            self.npoints = cfg.get("npoints", -1)
        self.no_augmentation = cfg.get("no_augmentation", False)

    def __call__(self, res, info):
        res["mode"] = self.mode

        if res["type"] in ["WaymoDataset"]:
            if "combined" in res["lidar"]:
                points = res["lidar"]["combined"]
            else:
                points = res["lidar"]["points"]
        elif res["type"] in ["NuScenesDataset", "DemoDataset"]:
            points = res["lidar"]["combined"]
        else:
            raise NotImplementedError

        if self.mode == "train":
            anno_dict = res["lidar"]["annotations"]
            gt_dict = {
                "gt_boxes": anno_dict["boxes"],
                "gt_names": np.array(anno_dict["names"]).reshape(-1),
            }

        if self.mode == "train" and not self.no_augmentation:
            selected = drop_arrays_by_name(
                gt_dict["gt_names"], ["DontCare", "ignore", "UNKNOWN"]
            )
            _dict_select(gt_dict, selected)

            if self.min_points_in_gt > 0:
                point_counts = box_np_ops.points_count_rbbox(
                    points, gt_dict["gt_boxes"]
                )
                mask = point_counts >= self.min_points_in_gt
                _dict_select(gt_dict, mask)

            gt_boxes_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]],
                dtype=np.bool_,
            )

            if self.db_sampler:
                sampled_dict = self.db_sampler.sample_all(
                    res["metadata"]["image_prefix"],
                    gt_dict["gt_boxes"],
                    gt_dict["gt_names"],
                    res["metadata"]["num_point_features"],
                )
                if sampled_dict is not None:
                    gt_dict["gt_names"] = np.concatenate(
                        [gt_dict["gt_names"], sampled_dict["gt_names"]], axis=0
                    )
                    gt_dict["gt_boxes"] = np.concatenate(
                        [gt_dict["gt_boxes"], sampled_dict["gt_boxes"]]
                    )
                    gt_boxes_mask = np.concatenate(
                        [gt_boxes_mask, sampled_dict["gt_masks"]], axis=0
                    )
                    # remove raw points inside sampled boxes, then paste
                    sampled_point_indices = box_np_ops.points_in_rbbox(
                        points,
                        sampled_dict["gt_boxes"][sampled_dict["gt_masks"]],
                    )
                    points = points[
                        np.logical_not(sampled_point_indices.any(-1))
                    ]
                    points = np.concatenate(
                        [sampled_dict["points"], points], axis=0
                    )

            _dict_select(gt_dict, gt_boxes_mask)

            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                dtype=np.int32,
            )
            gt_dict["gt_classes"] = gt_classes

            gt_dict["gt_boxes"], points = prep.random_flip_both(
                gt_dict["gt_boxes"], points
            )
            gt_dict["gt_boxes"], points = prep.global_rotation(
                gt_dict["gt_boxes"], points, rotation=self.global_rotation_noise
            )
            gt_dict["gt_boxes"], points = prep.global_scaling_v2(
                gt_dict["gt_boxes"], points, *self.global_scaling_noise
            )
            gt_dict["gt_boxes"], points = prep.global_translate_(
                gt_dict["gt_boxes"], points,
                noise_translate_std=self.global_translate_std,
            )
        elif self.no_augmentation and self.mode == "train":
            gt_boxes_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]],
                dtype=np.bool_,
            )
            _dict_select(gt_dict, gt_boxes_mask)
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                dtype=np.int32,
            )
            gt_dict["gt_classes"] = gt_classes

        if self.shuffle_points:
            np.random.shuffle(points)

        res["lidar"]["points"] = points
        if self.mode == "train":
            res["lidar"]["annotations"] = gt_dict
        return res, info


def flatten(box):
    return np.concatenate(box, axis=0)


def merge_multi_group_label(gt_classes, num_classes_by_task):
    flag = 0
    for i in range(len(gt_classes)):
        gt_classes[i] = gt_classes[i] + flag
        flag += num_classes_by_task[i]
    return flatten(gt_classes)


@PIPELINES.register_module
class AssignLabel:
    """CenterNet target encoding (`pipelines/preprocess.py:178-350`)."""

    def __init__(self, **kwargs):
        assigner_cfg = kwargs["cfg"]
        self.tasks = assigner_cfg["target_assigner"]["tasks"]
        self.gaussian_overlap = assigner_cfg["gaussian_overlap"]
        self._max_objs = assigner_cfg["max_objs"]
        self._min_radius = assigner_cfg["min_radius"]
        self._cfg = assigner_cfg

    def __call__(self, res, info):
        max_objs = self._max_objs
        class_names_by_task = [t["class_names"] for t in self.tasks]
        num_classes_by_task = [len(t["class_names"]) for t in self.tasks]

        example = {}

        pc_range = np.array(self._cfg["pc_range"], dtype=np.float32)
        pillar_size = np.array(self._cfg["pillar_size"], dtype=np.float32)
        grid_size = (pc_range[3:5] - pc_range[:2]) / pillar_size
        grid_size = np.round(grid_size).astype(np.int64)

        if res["mode"] == "train":
            gt_dict = res["lidar"]["annotations"]

            # reorganize annotations by task
            task_masks = []
            flag = 0
            for class_name in class_names_by_task:
                task_masks.append(
                    [
                        np.where(
                            gt_dict["gt_classes"] == class_name.index(i) + 1 + flag
                        )
                        for i in class_name
                    ]
                )
                flag += len(class_name)

            task_boxes, task_classes, task_names = [], [], []
            flag2 = 0
            for idx, mask in enumerate(task_masks):
                task_box, task_class, task_name = [], [], []
                for m in mask:
                    task_box.append(gt_dict["gt_boxes"][m])
                    task_class.append(gt_dict["gt_classes"][m] - flag2)
                    task_name.append(gt_dict["gt_names"][m])
                task_boxes.append(np.concatenate(task_box, axis=0))
                task_classes.append(np.concatenate(task_class))
                task_names.append(np.concatenate(task_name))
                flag2 += len(mask)

            for task_box in task_boxes:
                task_box[:, -1] = box_np_ops.limit_period(
                    task_box[:, -1], offset=0.5, period=np.pi * 2
                )

            gt_dict["gt_classes"] = task_classes
            gt_dict["gt_names"] = task_names
            gt_dict["gt_boxes"] = task_boxes
            res["lidar"]["annotations"] = gt_dict

            hms, anno_boxs, inds, masks, cats, gt_boxs = [], [], [], [], [], []

            for idx, task in enumerate(self.tasks):
                task_stride = int(task["stride"])
                task_grid_size = grid_size // task_stride
                hm = np.zeros(
                    (
                        len(class_names_by_task[idx]),
                        task_grid_size[1],
                        task_grid_size[0],
                    ),
                    dtype=np.float32,
                )
                anno_box = np.zeros((max_objs, 10), dtype=np.float32)
                gt_box = np.zeros((max_objs, 7), dtype=np.float32)
                ind = np.zeros((max_objs), dtype=np.int64)
                mask = np.zeros((max_objs), dtype=np.uint8)
                cat = np.zeros((max_objs), dtype=np.int64)

                num_objs = min(gt_dict["gt_boxes"][idx].shape[0], max_objs)

                for k in range(num_objs):
                    box = gt_dict["gt_boxes"][idx][k]
                    cls_id = gt_dict["gt_classes"][idx][k] - 1
                    w, l = (
                        box[3] / (pillar_size * task_stride),
                        box[4] / (pillar_size * task_stride),
                    )
                    if w <= 0 or l <= 0:
                        continue
                    radius = gaussian_radius(
                        (l, w), min_overlap=self.gaussian_overlap
                    )
                    if isinstance(self._min_radius, list):
                        radius = max(self._min_radius[cls_id], int(radius))
                    else:
                        radius = max(self._min_radius, int(radius))

                    x, y, z = box[0], box[1], box[2]
                    coor_x = (x - pc_range[0]) / (pillar_size * task_stride)
                    coor_y = (y - pc_range[1]) / (pillar_size * task_stride)
                    ct = np.array([coor_x, coor_y], dtype=np.float32)
                    ct_int = ct.astype(np.int32)
                    if not (
                        0 <= ct_int[0] < task_grid_size[0]
                        and 0 <= ct_int[1] < task_grid_size[1]
                    ):
                        continue

                    draw_gaussian(hm[cls_id], ct, radius)

                    xi, yi = ct_int[0], ct_int[1]
                    cat[k] = cls_id
                    ind[k] = yi * task_grid_size[0] + xi
                    mask[k] = 1
                    gt_box[k] = box[[0, 1, 2, 3, 4, 5, 8]] if box.shape[0] > 7 \
                        else box[[0, 1, 2, 3, 4, 5, 6]]

                    if box.shape[0] > 7:
                        vx, vy = box[6:8]
                        rot = box[8] if res["type"] == "NuScenesDataset" or \
                            res["type"] == "DemoDataset" else box[-1]
                    else:
                        vx, vy = 0.0, 0.0
                        rot = box[-1]
                    anno_box[k] = np.concatenate(
                        (
                            ct - (xi, yi),
                            z,
                            np.log(box[3:6]),
                            np.array(vx),
                            np.array(vy),
                            np.sin(rot),
                            np.cos(rot),
                        ),
                        axis=None,
                    )

                hms.append(hm.transpose((1, 2, 0)))
                anno_boxs.append(anno_box)
                gt_boxs.append(gt_box)
                masks.append(mask)
                inds.append(ind)
                cats.append(cat)

            # flattened gt list for the two-stage head (`preprocess.py:325-343`)
            boxes = flatten(gt_dict["gt_boxes"])
            classes = merge_multi_group_label(
                gt_dict["gt_classes"], num_classes_by_task
            )
            gt_boxes_and_cls = np.zeros((max_objs, 10), dtype=np.float32)
            if boxes.shape[0] > 0:
                boxes_and_cls = np.concatenate(
                    (boxes, classes.reshape(-1, 1).astype(np.float32)), axis=1
                )
                num_obj = min(len(boxes_and_cls), max_objs)
                if boxes.shape[1] == 9:
                    boxes_and_cls = boxes_and_cls[
                        :, [0, 1, 2, 3, 4, 5, 8, 6, 7, 9]
                    ]
                gt_boxes_and_cls[:num_obj] = boxes_and_cls[:num_obj]
            example.update({"gt_boxes_and_cls": gt_boxes_and_cls})
            example.update(
                {
                    "hm": hms,
                    "anno_box": anno_boxs,
                    "ind": inds,
                    "mask": masks,
                    "cat": cats,
                    "gt_box": gt_boxs,
                }
            )
        res["lidar"]["targets"] = example
        return res, info

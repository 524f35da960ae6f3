"""GT-database sampling augmentation ("GT-AUG").

Port of the reference sampler (`det3d/core/sampler/sample_ops.py:11-294` +
`core/sampler/preprocess.py:14-91`): per-class quotas minus existing GT,
shuffled-epoch batch sampling from the offline database, BEV corner
collision filtering against scene + already-placed samples, cropped object
points translated to the sampled box location.

Live configs never enable group sampling or per-object global rotation
(`global_random_rotation_range_per_object=[0, 0]` in every zoo config), so
those paths raise NotImplementedError rather than silently diverging.
"""

import copy
import logging
import pathlib
import pickle

import numpy as np

from ..bbox import box_np_ops


class BatchSampler:
    """Shuffled epoch sampler over one class's database
    (`core/sampler/preprocess.py:14-50`)."""

    def __init__(self, sampled_list, name=None, shuffle=True):
        self._sampled_list = sampled_list
        self._indices = np.arange(len(sampled_list))
        if shuffle:
            np.random.shuffle(self._indices)
        self._idx = 0
        self._example_num = len(sampled_list)
        self._name = name
        self._shuffle = shuffle

    def _sample(self, num):
        if self._idx + num >= self._example_num:
            ret = self._indices[self._idx:].copy()
            self._reset()
        else:
            ret = self._indices[self._idx : self._idx + num]
            self._idx += num
        return ret

    def _reset(self):
        if self._shuffle:
            np.random.shuffle(self._indices)
        self._idx = 0

    def sample(self, num):
        indices = self._sample(num)
        return [self._sampled_list[i] for i in indices]


def filter_by_difficulty(db_infos, removed_difficulties):
    """`DBFilterByDifficulty` (`preprocess.py:61-73`)."""
    return {
        key: [
            info for info in dinfos
            if info["difficulty"] not in removed_difficulties
        ]
        for key, dinfos in db_infos.items()
    }


def filter_by_min_num_points(db_infos, min_gt_point_dict):
    """`DBFilterByMinNumPoint` (`preprocess.py:76-91`)."""
    for name, min_num in min_gt_point_dict.items():
        if min_num > 0 and name in db_infos:
            db_infos[name] = [
                info for info in db_infos[name]
                if info["num_points_in_gt"] >= min_num
            ]
    return db_infos


class DataBaseSampler:
    """`DataBaseSamplerV2` without the unused group-sampling path."""

    def __init__(self, db_infos, groups, rate=1.0, global_rot_range=None,
                 logger=None):
        self.logger = logger or logging.getLogger("db_sampler")
        for k, v in db_infos.items():
            self.logger.info("load %d %s database infos", len(v), k)

        self.db_infos = db_infos
        self._rate = rate
        self._sample_classes = []
        self._sample_max_nums = []
        if any(len(g) > 1 for g in groups):
            raise NotImplementedError(
                "group sampling is unused by all live configs"
            )
        for group_info in groups:
            self._sample_classes += list(group_info.keys())
            self._sample_max_nums += list(group_info.values())

        self._sampler_dict = {
            k: BatchSampler(v, k) for k, v in db_infos.items()
        }

        if global_rot_range is not None:
            if not isinstance(global_rot_range, (list, tuple, np.ndarray)):
                global_rot_range = [-global_rot_range, global_rot_range]
            if np.abs(global_rot_range[0] - global_rot_range[1]) >= 1e-3:
                raise NotImplementedError(
                    "per-object global rotation is disabled ([0, 0]) in all "
                    "live configs"
                )

    def sample_all(self, root_path, gt_boxes, gt_names, num_point_features,
                   random_crop=False, **kwargs):
        sampled_num_dict = {}
        for class_name, max_sample_num in zip(
            self._sample_classes, self._sample_max_nums
        ):
            sampled_num = int(
                max_sample_num - np.sum([n == class_name for n in gt_names])
            )
            sampled_num_dict[class_name] = np.round(
                self._rate * sampled_num
            ).astype(np.int64)

        sampled = []
        sampled_gt_boxes = []
        avoid_coll_boxes = gt_boxes

        for class_name in self._sample_classes:
            sampled_num = sampled_num_dict[class_name]
            if sampled_num <= 0:
                continue
            sampled_cls = self.sample_class_v2(
                class_name, sampled_num, avoid_coll_boxes
            )
            sampled += sampled_cls
            if len(sampled_cls) > 0:
                sampled_gt_box = np.stack(
                    [s["box3d_lidar"] for s in sampled_cls], axis=0
                )
                sampled_gt_boxes.append(sampled_gt_box)
                avoid_coll_boxes = np.concatenate(
                    [avoid_coll_boxes, sampled_gt_box], axis=0
                )

        if not sampled:
            return None

        sampled_gt_boxes = np.concatenate(sampled_gt_boxes, axis=0)
        s_points_list = []
        for info in sampled:
            try:
                s_points = np.fromfile(
                    str(pathlib.Path(root_path) / info["path"]),
                    dtype=np.float32,
                ).reshape(-1, num_point_features)
                s_points[:, :3] += info["box3d_lidar"][:3]
                s_points_list.append(s_points)
            except Exception:
                self.logger.warning(
                    "failed reading %s", pathlib.Path(root_path) / info["path"]
                )
                continue

        return {
            "gt_names": np.array([s["name"] for s in sampled]),
            "difficulty": np.array([s.get("difficulty", 0) for s in sampled]),
            "gt_boxes": sampled_gt_boxes,
            "points": np.concatenate(s_points_list, axis=0)
            if s_points_list
            else np.zeros((0, num_point_features), np.float32),
            "gt_masks": np.ones((len(sampled),), dtype=np.bool_),
        }

    def sample_class_v2(self, name, num, gt_boxes):
        """Collision-filtered placement (`sample_ops.py:248-294`)."""
        if name not in self._sampler_dict:
            return []
        sampled = copy.deepcopy(self._sampler_dict[name].sample(num))
        if len(sampled) == 0:
            return []
        num_gt = gt_boxes.shape[0]
        num_sampled = len(sampled)
        gt_boxes_bv = box_np_ops.center_to_corner_box2d(
            gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, -1]
        )
        sp_boxes = np.stack([i["box3d_lidar"] for i in sampled], axis=0)
        sp_boxes_bv = box_np_ops.center_to_corner_box2d(
            sp_boxes[:, 0:2], sp_boxes[:, 3:5], sp_boxes[:, -1]
        )
        total_bv = np.concatenate([gt_boxes_bv, sp_boxes_bv], axis=0)
        coll_mat = box_np_ops.box_collision_test(total_bv, total_bv)
        diag = np.arange(total_bv.shape[0])
        coll_mat[diag, diag] = False

        valid_samples = []
        for i in range(num_gt, num_gt + num_sampled):
            if coll_mat[i].any():
                coll_mat[i] = False
                coll_mat[:, i] = False
            else:
                valid_samples.append(sampled[i - num_gt])
        return valid_samples


def build_db_sampler(cfg, logger=None):
    """Build from a reference-style GT-AUG config dict
    (`det3d/builder.py:190-210` equivalent)."""
    logger = logger or logging.getLogger("db_sampler")
    cfg = dict(cfg)
    info_path = cfg["db_info_path"]
    with open(info_path, "rb") as f:
        db_infos = pickle.load(f)

    for prep_cfg in cfg.get("db_prep_steps", []):
        prep_cfg = dict(prep_cfg)
        if "filter_by_difficulty" in prep_cfg:
            db_infos = filter_by_difficulty(
                db_infos, prep_cfg["filter_by_difficulty"]
            )
        if "filter_by_min_num_points" in prep_cfg:
            db_infos = filter_by_min_num_points(
                db_infos, prep_cfg["filter_by_min_num_points"]
            )

    return DataBaseSampler(
        db_infos,
        cfg["sample_groups"],
        rate=cfg.get("rate", 1.0),
        global_rot_range=cfg.get("global_random_rotation_range_per_object"),
        logger=logger,
    )

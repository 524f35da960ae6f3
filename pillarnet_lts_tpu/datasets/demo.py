"""Synthetic dataset for tests and benchmarks (no reference analog).

Generates deterministic random scenes — ground boxes with dense interior
points plus background clutter — shaped like nuScenes 10-sweep frames
(5 point features: x, y, z, intensity + appended time channel making the
'combined' array). Runs through the exact production pipeline
(Preprocess -> AssignLabel -> Reformat), so it exercises every CPU-side code
path without the real datasets, which are not shipped in this environment.
"""

import numpy as np

from .custom import PointCloudDataset
from .registry import DATASETS


@DATASETS.register_module
class DemoDataset(PointCloudDataset):
    NumPointFeatures = 5

    def __init__(
        self,
        root_path="",
        info_path="",
        num_frames=16,
        num_points=20000,
        pc_range=(-54, -54, -5, 54, 54, 3),
        class_names=None,
        pipeline=None,
        test_mode=False,
        seed=0,
        **kwargs,
    ):
        super().__init__(
            root_path, info_path, pipeline=pipeline, test_mode=test_mode,
            class_names=class_names,
        )
        self.num_frames = num_frames
        self.num_points = num_points
        self.pc_range = pc_range
        self.seed = seed
        self.class_names = class_names or ["car", "pedestrian"]
        self._metadata = [
            {"image_prefix": "", "num_point_features": 5, "token": f"demo_{i}"}
            for i in range(num_frames)
        ]

    def __len__(self):
        return self.num_frames

    def _synth_frame(self, idx):
        rng = np.random.RandomState(self.seed + idx)
        lo = np.array(self.pc_range[:3])
        hi = np.array(self.pc_range[3:])

        n_boxes = rng.randint(3, 9)
        centers = rng.uniform(lo[:2] * 0.7, hi[:2] * 0.7, (n_boxes, 2))
        zs = rng.uniform(-1.5, 0.5, (n_boxes, 1))
        dims = rng.uniform([1.5, 3.0, 1.4], [2.2, 5.0, 2.0], (n_boxes, 3))
        yaw = rng.uniform(-np.pi, np.pi, (n_boxes, 1))
        vel = rng.uniform(-5, 5, (n_boxes, 2))
        boxes = np.concatenate(
            [centers, zs, dims[:, [0, 1, 2]], vel, yaw], axis=1
        ).astype(np.float32)  # (x, y, z, w, l, h, vx, vy, rot)
        names = np.array(
            [self.class_names[i % len(self.class_names)] for i in range(n_boxes)]
        )

        # background points
        n_bg = self.num_points * 3 // 4
        bg = np.empty((n_bg, 5), np.float32)
        bg[:, 0:2] = rng.uniform(lo[:2], hi[:2], (n_bg, 2))
        bg[:, 2] = rng.uniform(-2.0, 1.0, n_bg)
        bg[:, 3] = rng.uniform(0, 255, n_bg)
        bg[:, 4] = 0.0

        # object points (inside boxes)
        per_box = (self.num_points - n_bg) // n_boxes
        obj_points = []
        for b in range(n_boxes):
            local = rng.uniform(-0.5, 0.5, (per_box, 3)) * dims[b]
            c, s = np.cos(-yaw[b, 0]), np.sin(-yaw[b, 0])
            world = np.empty((per_box, 5), np.float32)
            world[:, 0] = local[:, 0] * c - local[:, 1] * s + centers[b, 0]
            world[:, 1] = local[:, 0] * s + local[:, 1] * c + centers[b, 1]
            world[:, 2] = local[:, 2] + zs[b, 0]
            world[:, 3] = rng.uniform(0, 255, per_box)
            world[:, 4] = 0.0
            obj_points.append(world)

        points = np.concatenate([bg] + obj_points, axis=0)
        return points, boxes, names

    def evaluation(self, detections, output_dir=None, testset=False):
        """Data-free accuracy signal: center-distance mAP against the
        synthetic ground truth (nuScenes-style matching thresholds)."""
        from .eval_metric import center_distance_map

        gts = {}
        for i in range(self.num_frames):
            _, boxes, names = self._synth_frame(i)
            labels = np.array(
                [self.class_names.index(n) for n in names], np.int64
            )
            gts[self._metadata[i]["token"]] = {
                "box3d_lidar": boxes,
                "label_preds": labels,
            }
        result = center_distance_map(detections, gts, self.class_names)
        summary = ", ".join(
            f"{k}: {v:.3f}" for k, v in result["per_class"].items()
        )
        text = f"demo mAP {result['mAP']:.3f} ({summary})"
        return {"results": {"demo": text}, "detail": {"demo": result}}, None

    def get_sensor_data(self, idx):
        points, boxes, names = self._synth_frame(idx)
        res = {
            "type": "DemoDataset",
            "lidar": {
                "type": "lidar",
                "points": points,  # full 5-feature rows (x, y, z, i, t)
                "combined": points,
                "nsweeps": 1,
                "annotations": {"boxes": boxes, "names": names},
            },
            "metadata": self._metadata[idx],
            "mode": "val" if self.test_mode else "train",
            "virtual": False,
        }
        info = {
            "gt_boxes": boxes,
            "gt_names": names,
            "token": self._metadata[idx]["token"],
        }
        if self.pipeline is None:
            return res, info
        data, _ = self.pipeline(res, info)
        return data

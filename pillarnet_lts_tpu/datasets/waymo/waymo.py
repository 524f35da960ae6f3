"""Waymo Open dataset.

Port of `det3d/datasets/waymo/waymo.py:9-115`: per-frame info pkls, optional
class-balanced resampling, pipeline-driven `get_sensor_data`, and evaluation
via exporting `detection_pred.bin` for the official Waymo devkit
(`waymo_common.py:53-117`). The devkit (waymo-open-dataset protos) is
imported lazily — export degrades to a pickle dump when absent.
"""

import os
import pickle

import numpy as np

from ..custom import PointCloudDataset
from ..registry import DATASETS


@DATASETS.register_module
class WaymoDataset(PointCloudDataset):
    NumPointFeatures = 5  # x, y, z, intensity, elongation

    def __init__(
        self,
        info_path,
        root_path,
        cfg=None,
        pipeline=None,
        class_names=None,
        test_mode=False,
        sample=False,
        nsweeps=1,
        load_interval=1,
        **kwargs,
    ):
        self.load_interval = load_interval
        self.sample = sample
        self.nsweeps = nsweeps
        print("Using {} sweeps".format(nsweeps))
        super().__init__(
            root_path, info_path, pipeline, test_mode=test_mode,
            class_names=class_names,
        )
        self._info_path = info_path
        self._class_names = class_names
        self._num_point_features = WaymoDataset.NumPointFeatures if nsweeps == 1 \
            else WaymoDataset.NumPointFeatures + 1
        self.load_infos(self._info_path)

    def load_infos(self, info_path):
        with open(self._info_path, "rb") as f:
            _waymo_infos_all = pickle.load(f)
        self._waymo_infos = _waymo_infos_all[:: self.load_interval]

        if not self.test_mode and self.sample:
            # optional CBGS resampling (`waymo.py:45-63`)
            _cls_infos = {name: [] for name in self._class_names}
            for info in self._waymo_infos:
                for name in set(info["gt_names"]):
                    if name in self._class_names:
                        _cls_infos[name].append(info)
            duplicated_samples = sum(len(v) for v in _cls_infos.values())
            _cls_dist = {
                k: len(v) / max(duplicated_samples, 1)
                for k, v in _cls_infos.items()
            }
            frac = 1.0 / len(self._class_names)
            ratios = [frac / v if v > 0 else 0.0 for v in _cls_dist.values()]
            resampled = []
            for cls_infos, ratio in zip(list(_cls_infos.values()), ratios):
                resampled += np.random.choice(
                    cls_infos, int(len(cls_infos) * ratio)
                ).tolist()
            self._waymo_infos = resampled
        print("Using {} frames".format(len(self._waymo_infos)))

    def __len__(self):
        if not hasattr(self, "_waymo_infos"):
            self.load_infos(self._info_path)
        return len(self._waymo_infos)

    def get_sensor_data(self, idx):
        info = self._waymo_infos[idx]
        res = {
            "lidar": {
                "type": "lidar",
                "points": None,
                "annotations": None,
                "nsweeps": self.nsweeps,
            },
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self._num_point_features,
                "token": info["token"],
            },
            "calib": None,
            "cam": {},
            "mode": "val" if self.test_mode else "train",
        }
        data, _ = self.pipeline(res, info)
        return data

    def evaluation(self, detections, output_dir=None, testset=False):
        """Export `detection_pred.bin` for the official Waymo metrics tool
        (`waymo.py:104-114` + `waymo_common.py:53-117`)."""
        infos = self._waymo_infos
        infos = {info["token"]: info for info in infos}
        try:
            from .waymo_common import _create_pd_detection

            _create_pd_detection(detections, infos, output_dir)
            print(f"Wrote detection_pred.bin to {output_dir}; use the Waymo "
                  "devkit compute_detection_metrics_main against gt.bin")
        except ImportError:
            out = os.path.join(output_dir, "detections.pkl")
            with open(out, "wb") as f:
                pickle.dump(detections, f)
            print(
                "waymo-open-dataset not installed; raw detections saved to "
                f"{out}; computing native AP/APH instead"
            )
            return self.evaluation_native(detections, output_dir, testset)
        return None, None

    def evaluation_native(self, detections, output_dir=None, testset=False):
        """Devkit-free Waymo AP/APH (L1/L2) via `waymo_eval.py` — no
        waymo-open-dataset / TF needed. bin export stays the path for
        official leaderboard numbers."""
        import json

        from .waymo_eval import (
            evaluate_waymo, gt_from_infos, preds_from_detections)

        if testset:
            return None, None
        gt = gt_from_infos(self._waymo_infos)
        pred = preds_from_detections(detections, self._class_names)
        metrics = evaluate_waymo(gt, pred, class_names=self._class_names)

        result = "Waymo (native eval)\n"
        detail = {}
        for level in ("LEVEL_1", "LEVEL_2"):
            for cls, v in metrics[level].items():
                result += (f"{level} {cls}: AP {v['AP']:.4f} "
                           f"APH {v['APH']:.4f}\n")
                detail[f"{level}/{cls}"] = dict(v)
        result += (f"mAP L1 {metrics['mAP_L1']:.4f} "
                   f"mAPH L1 {metrics['mAPH_L1']:.4f} "
                   f"mAP L2 {metrics['mAP_L2']:.4f} "
                   f"mAPH L2 {metrics['mAPH_L2']:.4f}\n")
        if output_dir:
            with open(os.path.join(output_dir,
                                   "waymo_metrics.json"), "w") as f:
                json.dump(metrics, f, default=float)
        return {"results": {"waymo": result},
                "detail": {"waymo": detail}}, None

"""nuScenes dataset.

Port of `det3d/datasets/nuscenes/nuscenes.py:25-327`: info-pkl loading with
train-time CBGS class-balanced resampling (`:79-109`), pipeline-driven
`get_sensor_data` (`:158-183`), and official-devkit evaluation with
global-frame box conversion and attribute assignment (`:188-327`). The
devkit import is lazy: detection export to json works without it; the final
metric computation requires `nuscenes-devkit` at runtime.
"""

import json
import operator
import pickle
from pathlib import Path

import numpy as np

from ..custom import PointCloudDataset
from ..registry import DATASETS
from .nusc_common import (
    cls_attr_dist,
    general_to_detection,
    lidar_nusc_box_to_global,
    second_det_to_nusc_box,
)


@DATASETS.register_module
class NuScenesDataset(PointCloudDataset):
    NumPointFeatures = 5  # x, y, z, intensity, ring index

    def __init__(
        self,
        info_path,
        root_path,
        nsweeps=0,
        cfg=None,
        pipeline=None,
        class_names=None,
        test_mode=False,
        version="v1.0-trainval",
        load_interval=1,
        **kwargs,
    ):
        self.load_interval = load_interval
        super().__init__(
            root_path, info_path, pipeline, test_mode=test_mode,
            class_names=class_names,
        )
        self.nsweeps = nsweeps
        assert self.nsweeps > 0, "At least input one sweep please!"

        self._class_names = class_names
        self.load_infos(self._info_path)
        self._num_point_features = NuScenesDataset.NumPointFeatures
        self._name_mapping = general_to_detection
        self.virtual = kwargs.get("virtual", False)
        if self.virtual:
            self._num_point_features = 16
        self.version = version
        self.eval_version = "detection_cvpr_2019"

    def load_infos(self, info_path):
        with open(info_path, "rb") as f:
            _nusc_infos_all = pickle.load(f)
        _nusc_infos_all = _nusc_infos_all[:: self.load_interval]

        if not self.test_mode:
            # CBGS class-balanced resampling (`nuscenes.py:79-109`)
            self.frac = int(len(_nusc_infos_all) * 0.25)
            _cls_infos = {name: [] for name in self._class_names}
            for info in _nusc_infos_all:
                for name in set(info["gt_names"]):
                    if name in self._class_names:
                        _cls_infos[name].append(info)
            duplicated_samples = sum(len(v) for v in _cls_infos.values())
            _cls_dist = {
                k: len(v) / max(duplicated_samples, 1)
                for k, v in _cls_infos.items()
            }
            self._nusc_infos = []
            frac = 1.0 / len(self._class_names)
            ratios = [frac / v if v > 0 else 0.0 for v in _cls_dist.values()]
            for cls_infos, ratio in zip(list(_cls_infos.values()), ratios):
                self._nusc_infos += np.random.choice(
                    cls_infos, int(len(cls_infos) * ratio)
                ).tolist()
        else:
            if isinstance(_nusc_infos_all, dict):
                self._nusc_infos = []
                for v in _nusc_infos_all.values():
                    self._nusc_infos.extend(v)
            else:
                self._nusc_infos = _nusc_infos_all

    def __len__(self):
        return len(self._nusc_infos)

    def get_sensor_data(self, idx):
        info = self._nusc_infos[idx]
        res = {
            "lidar": {
                "type": "lidar",
                "points": None,
                "nsweeps": self.nsweeps,
                "annotations": None,
            },
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self._num_point_features,
                "token": info["token"],
            },
            "calib": None,
            "cam": {},
            "mode": "val" if self.test_mode else "train",
            "virtual": self.virtual,
        }
        data, _ = self.pipeline(res, info)
        return data

    def evaluation_native(self, detections, output_dir=None, testset=False):
        """Devkit-free mAP/NDS via the native detection_cvpr_2019
        implementation (`datasets/nuscenes/nusc_eval.py`): evaluates in the
        lidar frame straight from the info pkls — no raw nuScenes tables or
        nuscenes-devkit needed."""
        from .nusc_eval import (
            evaluate_nusc, gt_from_infos, preds_from_detections)

        if testset:
            return None, None
        mapped_class_names = [
            self._name_mapping.get(n, n) for n in self._class_names
        ]
        gt = gt_from_infos(self._nusc_infos)
        pred = preds_from_detections(detections, mapped_class_names)
        metrics = evaluate_nusc(gt, pred, verbose=False)

        detail = {}
        result = "Nusc (native eval) Evaluation\n"
        for cname in mapped_class_names:
            aps = metrics["label_aps"].get(cname)
            if aps is None:
                continue
            detail[cname] = {f"dist@{k}": v for k, v in aps.items()}
            result += f"{cname}: mean AP {np.mean(list(aps.values())):.4f}\n"
        result += (f"mAP: {metrics['mean_ap']:.4f}  "
                   f"NDS: {metrics['nd_score']:.4f}\n")
        if output_dir:
            with open(Path(output_dir) / "metrics_summary.json", "w") as f:
                json.dump(
                    {k: metrics[k] for k in
                     ("mean_ap", "nd_score", "label_aps", "tp_errors")},
                    f, default=float)
        return {"results": {"nusc": result}, "detail": {"nusc": detail}}, None

    def evaluation(self, detections, output_dir=None, testset=False):
        """Export detections to nuScenes json and run the official eval
        (`nuscenes.py:188-327`). `detections` maps sample token -> dict with
        box3d_lidar / scores / label_preds (+metadata). Falls back to the
        native evaluator when the nuscenes-devkit is not installed."""
        try:
            from nuscenes import NuScenes  # noqa: F811
        except ImportError:
            print("nuscenes-devkit not installed: using the native "
                  "detection_cvpr_2019 evaluator")
            return self.evaluation_native(detections, output_dir, testset)
        from nuscenes import NuScenes
        from nuscenes.eval.detection.config import config_factory  # noqa: F401

        version = self.version
        eval_set_map = {
            "v1.0-mini": "mini_val",
            "v1.0-trainval": "val",
            "v1.0-test": "test",
        }
        dets = [v for _, v in detections.items()]

        nusc = NuScenes(
            version=version, dataroot=str(self._root_path), verbose=True
        )
        mapped_class_names = [
            self._name_mapping.get(n, n) for n in self._class_names
        ]

        nusc_annos = {"results": {}, "meta": None}
        for det in dets:
            annos = []
            boxes = second_det_to_nusc_box(det)
            boxes = lidar_nusc_box_to_global(
                nusc, boxes, det["metadata"]["token"]
            )
            for box in boxes:
                name = mapped_class_names[box.label]
                if np.sqrt(box.velocity[0] ** 2 + box.velocity[1] ** 2) > 0.2:
                    if name in (
                        "car", "construction_vehicle", "bus", "truck",
                        "trailer",
                    ):
                        attr = "vehicle.moving"
                    elif name in ("bicycle", "motorcycle"):
                        attr = "cycle.with_rider"
                    else:
                        attr = None
                else:
                    if name == "pedestrian":
                        attr = "pedestrian.standing"
                    elif name == "bus":
                        attr = "vehicle.stopped"
                    else:
                        attr = None
                annos.append(
                    {
                        "sample_token": det["metadata"]["token"],
                        "translation": box.center.tolist(),
                        "size": box.wlh.tolist(),
                        "rotation": box.orientation.elements.tolist(),
                        "velocity": box.velocity[:2].tolist(),
                        "detection_name": name,
                        "detection_score": box.score,
                        "attribute_name": attr
                        if attr is not None
                        else max(
                            cls_attr_dist[name].items(),
                            key=operator.itemgetter(1),
                        )[0],
                    }
                )
            nusc_annos["results"][det["metadata"]["token"]] = annos

        nusc_annos["meta"] = {
            "use_camera": False,
            "use_lidar": True,
            "use_radar": False,
            "use_map": False,
            "use_external": False,
        }

        name = self._info_path.split("/")[-1].split(".")[0]
        res_path = str(Path(output_dir) / Path(name + ".json"))
        with open(res_path, "w") as f:
            json.dump(nusc_annos, f)
        print(f"Saved predictions to {res_path}")

        if testset:
            return None, None

        from nuscenes.eval.detection.evaluate import NuScenesEval

        cfg = config_factory(self.eval_version)
        nusc_eval = NuScenesEval(
            nusc,
            config=cfg,
            result_path=res_path,
            eval_set=eval_set_map[self.version],
            output_dir=output_dir,
            verbose=True,
        )
        nusc_eval.main(plot_examples=0)

        with open(Path(output_dir) / "metrics_summary.json") as f:
            metrics = json.load(f)

        detail = {}
        result = f"Nusc {version} Evaluation\n"
        for cname in mapped_class_names:
            detail[cname] = {}
            for k, v in metrics["label_aps"][cname].items():
                detail[cname][f"dist@{k}"] = v
            scores = list(metrics["label_aps"][cname].values())
            mean = sum(scores) / len(scores)
            result += f"{cname}: mean AP {mean:.4f}\n"
        result += f"mAP: {metrics['mean_ap']:.4f}  NDS: {metrics['nd_score']:.4f}\n"
        return {"results": {"nusc": result}, "detail": {"nusc": detail}}, None

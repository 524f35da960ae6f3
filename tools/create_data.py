"""Offline dataset preparation CLI (reference `tools/create_data.py`).

Subcommands:
  nuscenes_data_prep --root_path ... --version v1.0-trainval --nsweeps 10
  waymo_data_prep --root_path ... --split train --nsweeps 1

Info creation requires the dataset devkits (nuscenes-devkit /
waymo-open-dataset); GT-database creation only needs the info pkls.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def nuscenes_data_prep(root_path, version="v1.0-trainval", nsweeps=10,
                       filter_zero=True):
    from pillarnet_lts_tpu.datasets.utils.create_gt_database import (
        create_groundtruth_database,
    )

    # the converter writes infos_test_* for v1.0-test, infos_train_*/val_*
    # otherwise — key the first-run check on the split actually requested
    if version == "v1.0-test":
        info_path = os.path.join(
            root_path, f"infos_test_{nsweeps:02d}sweeps_withvelo.pkl"
        )
    else:
        info_path = os.path.join(
            root_path,
            f"infos_train_{nsweeps:02d}sweeps_withvelo_filter_{filter_zero}.pkl",
        )
    if not os.path.exists(info_path):
        # first run: build the info pkls (needs nuscenes-devkit)
        from pillarnet_lts_tpu.datasets.nuscenes.nusc_common import (
            create_nuscenes_infos,
        )

        create_nuscenes_infos(root_path, version=version, nsweeps=nsweeps,
                              filter_zero=filter_zero)
    if version == "v1.0-test":
        return  # no GT database for the test split
    create_groundtruth_database(
        "NuScenesDataset", root_path, info_path, nsweeps=nsweeps
    )


def waymo_data_prep(root_path, split="train", nsweeps=1):
    from pillarnet_lts_tpu.datasets.utils.create_gt_database import (
        create_groundtruth_database,
    )

    info_path = os.path.join(
        root_path, f"infos_{split}_{nsweeps:02d}sweeps_filter_zero_gt.pkl"
    )
    if not os.path.exists(info_path):
        # first run: build the info pkls from the extracted frames (run the
        # tfrecord extractor `datasets/waymo/waymo_converter.py` before this
        # — it needs the waymo-open-dataset devkit)
        from pillarnet_lts_tpu.datasets.waymo.waymo_infos import (
            create_waymo_infos,
        )

        create_waymo_infos(root_path, split=split, nsweeps=nsweeps)
    if split != "train":
        return  # GT-AUG database only augments training
    create_groundtruth_database(
        "WaymoDataset", root_path, info_path, nsweeps=nsweeps,
        used_classes=["VEHICLE", "PEDESTRIAN", "CYCLIST"],
    )


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("nuscenes_data_prep")
    p1.add_argument("--root_path", required=True)
    p1.add_argument("--version", default="v1.0-trainval")
    p1.add_argument("--nsweeps", type=int, default=10)

    p2 = sub.add_parser("waymo_data_prep")
    p2.add_argument("--root_path", required=True)
    p2.add_argument("--split", default="train")
    p2.add_argument("--nsweeps", type=int, default=1)

    args = parser.parse_args()
    if args.cmd == "nuscenes_data_prep":
        nuscenes_data_prep(args.root_path, args.version, args.nsweeps)
    else:
        waymo_data_prep(args.root_path, args.split, args.nsweeps)


if __name__ == "__main__":
    main()

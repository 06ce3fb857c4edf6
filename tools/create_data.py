"""Data preparation CLI: infos building + GT database creation (+ optional tfrecord
conversion).

Capability parity with reference ``tools/create_data.py:10-22`` (waymo_data_prep: infos
+ gt database) plus the converter entry of ``det3d/datasets/waymo/waymo_converter.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse


def waymo_data_prep(root_path, split: str = "train", nsweeps: int = 1, gt_database: bool = True):
    from tdal.data.gt_augment import create_groundtruth_database
    from tdal.data.waymo_converter import create_waymo_infos

    infos = create_waymo_infos(root_path, split=split, nsweeps=nsweeps)
    if gt_database and split == "train":
        create_groundtruth_database(infos, root_path, nsweeps=nsweeps)
    return infos


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("waymo_data_prep", help="build infos (+ gt database)")
    p.add_argument("--root_path", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--nsweeps", type=int, default=1)
    p.add_argument("--no_gt_database", action="store_true")

    c = sub.add_parser("waymo_convert", help="tfrecords -> per-frame pickles (needs devkit)")
    c.add_argument("--records", nargs="+", required=True)
    c.add_argument("--out_root", required=True)
    c.add_argument("--split", default="train")

    fc = sub.add_parser("frame_cache", help="build the columnar .tdc point cache")
    fc.add_argument("--info_path", required=True)
    fc.add_argument("--no_sweeps", action="store_true")

    n = sub.add_parser("nuscenes_data_prep", help="build nuScenes infos (needs nuscenes-devkit)")
    n.add_argument("--root_path", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--nsweeps", type=int, default=10)
    n.add_argument("--no_filter_zero", action="store_true")

    args = parser.parse_args()
    if args.cmd == "waymo_data_prep":
        waymo_data_prep(
            args.root_path, args.split, args.nsweeps, gt_database=not args.no_gt_database
        )
    elif args.cmd == "waymo_convert":
        from tdal.data.waymo_converter import convert_tfrecords

        convert_tfrecords(args.records, args.out_root, args.split)
    elif args.cmd == "frame_cache":
        import pickle

        from tdal.data.frame_cache import build_cache

        with open(args.info_path, "rb") as f:
            infos = pickle.load(f)
        n = build_cache(infos, with_sweeps=not args.no_sweeps)
        print(f"wrote {n} .tdc files")
    elif args.cmd == "nuscenes_data_prep":
        from tdal.data.nuscenes import create_nuscenes_infos

        create_nuscenes_infos(
            args.root_path, version=args.version, nsweeps=args.nsweeps,
            filter_zero=not args.no_filter_zero,
        )


if __name__ == "__main__":
    main()

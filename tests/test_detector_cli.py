"""Detector CLI smoke: tools/train.py + tools/dist_test.py on synthetic scenes."""

import importlib.util
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from tdal.data.synthetic import make_synthetic_dataset

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _run_tool(name, argv):
    spec = importlib.util.spec_from_file_location(f"tool_{name}", TOOLS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [name] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_detector_train_and_test_cli(tmp_path):
    infos, scenes = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=4, seed=5,
        n_static=2, n_dynamic=1, points_per_object=64, n_background=512,
    )
    cfg = Path(__file__).resolve().parent.parent / "configs" / "synthetic" / "pp_tiny.py"
    work = tmp_path / "work"
    _run_tool(
        "train",
        [
            str(cfg),
            "--work_dir", str(work),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--val_info_path", str(tmp_path / "infos.pkl"),
            "--val_max_frames", "2",
            "--batch_size", "2",
            "--total_epochs", "1",
            "--no_data_parallel",
        ],
    )
    assert (work / "checkpoints" / "latest.json").exists()
    # in-training validation wrote AP/APH metrics (trainer.py:424-480 parity)
    import json as _json

    rows = [
        _json.loads(line)
        for line in open(work / "logs" / "metrics.jsonl")
    ]
    val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
    assert val_rows and "val/mAP_l2approx" in val_rows[-1]

    _run_tool(
        "dist_test",
        [
            str(cfg),
            "--work_dir", str(work / "eval"),
            "--checkpoint", str(work / "checkpoints"),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--batch_size", "2",
            "--speed_test",
            "--evaluate",
        ],
    )
    with open(work / "eval" / "prediction.pkl", "rb") as f:
        preds = pickle.load(f)
    assert len(preds) == 4
    one = next(iter(preds.values()))
    assert set(one) == {"box3d_lidar", "scores", "label_preds"}
    assert one["box3d_lidar"].ndim == 2 and one["box3d_lidar"].shape[1] == 7
    # evaluation artifacts (det_annos + proto fallback) were written
    assert (work / "eval" / "det_annos.pkl").exists()

    # --spatial_shards: the BEV canvas is split over 4 devices (XLA SPMD halo
    # exchange); predictions must match the unsharded run
    _run_tool(
        "dist_test",
        [
            str(cfg),
            "--work_dir", str(work / "eval_sp"),
            "--checkpoint", str(work / "checkpoints"),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--batch_size", "2",
            "--spatial_shards", "4",
        ],
    )
    with open(work / "eval_sp" / "prediction.pkl", "rb") as f:
        sp_preds = pickle.load(f)
    for tok, d in preds.items():
        np.testing.assert_allclose(
            d["box3d_lidar"], sp_preds[tok]["box3d_lidar"], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            d["scores"], sp_preds[tok]["scores"], rtol=1e-4, atol=1e-4
        )


def test_two_stage_train_and_test_cli(tmp_path):
    infos, scenes = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=4, seed=9,
        n_static=2, n_dynamic=1, points_per_object=64, n_background=512,
    )
    cfg = Path(__file__).resolve().parent.parent / "configs" / "synthetic" / "pp_two_stage_tiny.py"
    work = tmp_path / "work2s"
    _run_tool(
        "train",
        [
            str(cfg),
            "--work_dir", str(work),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--batch_size", "2",
            "--total_epochs", "1",
            "--no_data_parallel",
        ],
    )
    assert (work / "checkpoints" / "latest.json").exists()
    _run_tool(
        "dist_test",
        [
            str(cfg),
            "--work_dir", str(work / "eval"),
            "--checkpoint", str(work / "checkpoints"),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--batch_size", "2",
        ],
    )
    with open(work / "eval" / "prediction.pkl", "rb") as f:
        preds = pickle.load(f)
    assert len(preds) == 4
    one = next(iter(preds.values()))
    assert one["box3d_lidar"].shape[1] == 7


def test_train_cli_with_gt_aug(tmp_path):
    """Train CLI with an enabled GT-aug database built from the synthetic infos."""
    import pickle as pkl

    from tdal.data.gt_augment import create_groundtruth_database

    infos, scenes = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=4, seed=13,
        n_static=2, n_dynamic=1, points_per_object=64, n_background=256,
    )
    create_groundtruth_database(infos, tmp_path, nsweeps=1, waymo_subsample=False)
    assert (tmp_path / "dbinfos_train_1sweeps_withvelo.pkl").exists()

    # config variant pointing its db_sampler at the built database
    base = (Path(__file__).resolve().parent.parent / "configs" / "synthetic" / "pp_tiny.py").read_text()
    base += f"""
db_sampler = dict(
    enable=True,
    db_info_path=r"{tmp_path / 'dbinfos_train_1sweeps_withvelo.pkl'}",
    sample_groups=[dict(VEHICLE=8)],
    db_prep_steps=[dict(filter_by_min_num_points=dict(VEHICLE=1))],
    rate=1.0,
)
train_preprocessor = dict(train_preprocessor, db_sampler=db_sampler)
"""
    cfg_path = tmp_path / "pp_tiny_gtaug.py"
    cfg_path.write_text(base)
    work = tmp_path / "work_aug"
    _run_tool(
        "train",
        [
            str(cfg_path),
            "--work_dir", str(work),
            "--info_path", str(tmp_path / "infos.pkl"),
            "--batch_size", "2",
            "--total_epochs", "1",
            "--no_data_parallel",
        ],
    )
    assert (work / "checkpoints" / "latest.json").exists()
    log = (work / "train.log").read_text()
    assert "GT-aug database sampler enabled" in log

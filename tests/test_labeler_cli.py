"""End-to-end labeler CLI tests on fabricated data: train -> eval -> baselines.

The smoke path of SURVEY.md §4: fabricate sequences, write trackStatic/trackDynamic +
infos pickles, run the real CLI mains in-process (CPU platform via conftest), assert
checkpoints and metric outputs.
"""

import importlib.util
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from tdal.data.synthetic import make_synthetic_dataset
from tdal.data.waymo_schema import dump_pickle

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


@pytest.fixture(scope="module")
def pipeline_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    infos, scenes = make_synthetic_dataset(
        root, n_scenes=1, n_frames=8, seed=3, n_static=3, n_dynamic=2,
        points_per_object=128, n_background=256,
    )
    static_track, dynamic_track = {}, {}
    for s in scenes:
        static_track.update(s.make_track_data(box_noise=0.05, only="static"))
        dynamic_track.update(s.make_track_data(box_noise=0.05, only="dynamic"))
    dump_pickle(static_track, root / "trackStatic.pkl")
    dump_pickle(dynamic_track, root / "trackDynamic.pkl")
    return root


def test_static_train_eval_cli(pipeline_data):
    root = pipeline_data
    _run_tool(
        "static_train",
        [
            "--track", str(root / "trackStatic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--model_type", "one_box_est",
            "--n_epoch", "2", "--batch_size", "2",
            "--npoints", "256", "--n_object_points", "64",
            "--work_dir", str(root / "static_work"),
        ],
    )
    ckpt_dir = root / "static_work" / "model" / "one_box_est"
    assert (ckpt_dir / "best.json").exists()

    _run_tool(
        "static_eval",
        [
            "--track", str(root / "trackStatic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--model_path", str(ckpt_dir),
            "--model_type", "one_box_est",
            "--batch_size", "2",
            "--npoints", "256", "--n_object_points", "64",
            "--work_dir", str(root / "static_work"),
        ],
    )
    log = (root / "static_work" / "log" / "eval" / "one_box_est.txt").read_text()
    assert "Box IoU (2D/3D)" in log


def test_static_init_cli(pipeline_data):
    root = pipeline_data
    _run_tool(
        "static_init",
        [
            "--track", str(root / "trackStatic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--work_dir", str(root / "init_work"),
        ],
    )
    log = (root / "init_work" / "log" / "init.txt").read_text()
    assert "[Init] Box IoU" in log
    assert "[Static] Box IoU" in log


def test_dynamic_init_cli(pipeline_data):
    """Parity: reference tools/dynamic_init.py:37-139 — the dynamic labeler's
    no-learning lower bound (init-box IoU over dynamic tracks)."""
    root = pipeline_data
    _run_tool(
        "dynamic_init",
        [
            "--track", str(root / "trackDynamic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--work_dir", str(root / "dyn_init_work"),
        ],
    )
    log = (root / "dyn_init_work" / "log" / "init.txt").read_text()
    assert "[Init] Box IoU" in log
    assert "Box estimation accuracy" in log


def test_dynamic_train_eval_cli(pipeline_data):
    root = pipeline_data
    _run_tool(
        "dynamic_train",
        [
            "--track", str(root / "trackDynamic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--n_epoch", "1", "--batch_size", "2",
            "--npoints", "64", "--n_object_points", "64",
            "--work_dir", str(root / "dyn_work"),
        ],
    )
    ckpt_dir = root / "dyn_work" / "model"
    assert (ckpt_dir / "best.json").exists()
    _run_tool(
        "dynamic_eval",
        [
            "--track", str(root / "trackDynamic.pkl"),
            "--infos", str(root / "infos.pkl"),
            "--model_path", str(ckpt_dir),
            "--batch_size", "2",
            "--npoints", "64", "--n_object_points", "64",
            "--work_dir", str(root / "dyn_work"),
        ],
    )
    log = (root / "dyn_work" / "log" / "eval.txt").read_text()
    assert "Box IoU (2D/3D)" in log


def test_static_labeler_beats_init_baseline(pipeline_data):
    """Learning sanity: with near-GT points the broadcast of the best noisy box should
    give decent IoU, and the init (raw noisy box) baseline must be <= 1."""
    import logging

    from tdal.data.track_datasets import preprocess_tracks
    from tdal.data.waymo_schema import AnnoStore, load_pickle, reorganize_info
    from tdal.pipeline.labeler_run import calculate_init_iou, calculate_static_iou

    root = pipeline_data
    infos = reorganize_info(load_pickle(root / "infos.pkl"))
    annos = AnnoStore(infos)
    track = load_pickle(root / "trackStatic.pkl")
    track, _ = preprocess_tracks(track, annos, ratio=0.0, seed=0)
    logger = logging.getLogger("test")
    i2, i3, ia = calculate_init_iou(track, annos, logger)
    s2, s3, sa = calculate_static_iou(track, annos, logger)
    assert 0.3 < i3 <= 1.0  # noisy GT boxes still overlap well
    assert 0.3 < s3 <= 1.0

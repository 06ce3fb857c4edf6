"""Full 6-stage offboard pipeline chained end-to-end on one fabricated segment:
detections -> tracking -> reorg -> trackGT -> motionState -> static + dynamic
label training/eval, with every stage consuming the previous stage's files.

BASELINE.json config 5 ("full 3DAL pipeline ... one Waymo segment") at CI scale.
"""

import importlib.util
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from tdal.data.synthetic import make_synthetic_dataset
from tdal.data.waymo_schema import dump_pickle, load_pickle, reorganize_info, AnnoStore

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _run_tool(relpath, argv):
    path = TOOLS / relpath
    spec = importlib.util.spec_from_file_location(
        f"tool_{relpath.replace('/', '_')[:-3]}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [relpath] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_full_pipeline_chain(tmp_path):
    # ---- stage 0: one fabricated segment ----
    infos, scenes = make_synthetic_dataset(
        tmp_path, n_scenes=1, n_frames=10, seed=21,
        n_static=2, n_dynamic=2, points_per_object=128, n_background=512,
    )
    info_path = tmp_path / "infos.pkl"
    val = tmp_path / "val"
    val.mkdir()

    # ---- stage 1 (detection surrogate): GT-as-detections with noise ----
    from tests.test_pipeline_stages import _fabricate_detections

    annos = AnnoStore(reorganize_info(infos))
    detections = _fabricate_detections(scenes, annos, noise=0.03)
    dump_pickle(detections, val / "prediction.pkl")

    # ---- stage 2: tracking + trackData ----
    _run_tool(
        "waymo_tracking/test.py",
        ["--work_dir", str(val), "--checkpoint", str(val / "prediction.pkl"),
         "--info_path", str(info_path), "--score_thresh", "0.5"],
    )
    # ---- stage 3: reorganization ----
    _run_tool("trackData.py", ["--work_dir", str(val)])
    # ---- stage 4: trackGT + motionState (train side = reused val tracks) ----
    _run_tool("trackGT.py", ["--infos", str(info_path), "--result", str(val / "trackGT.pkl")])
    train = tmp_path / "train"
    train.mkdir()
    track = load_pickle(val / "track.pkl")
    items = list(track.items())
    for i in range(16):
        dump_pickle(
            dict(items[len(items) * i // 16 : len(items) * (i + 1) // 16]),
            train / f"track_{i}.pkl",
        )
    dump_pickle(load_pickle(val / "trackGT.pkl"), train / "trackGT.pkl")
    _run_tool("motionState.py", ["--track_train", str(train), "--track_val", str(val)])

    static_track = load_pickle(val / "trackStatic.pkl")
    dynamic_track = load_pickle(val / "trackDynamic.pkl")
    assert static_track and dynamic_track

    # ---- stage 5: static labeler train + eval, patching det_annos ----
    _run_tool(
        "static_train.py",
        ["--track", str(val / "trackStatic.pkl"), "--infos", str(info_path),
         "--model_type", "one_box_est", "--n_epoch", "2", "--batch_size", "2",
         "--npoints", "256", "--n_object_points", "64",
         "--work_dir", str(tmp_path / "static_work")],
    )
    _run_tool(
        "static_eval.py",
        ["--track", str(val / "trackStatic.pkl"), "--infos", str(info_path),
         "--model_path", str(tmp_path / "static_work" / "model" / "one_box_est"),
         "--model_type", "one_box_est", "--batch_size", "2",
         "--npoints", "256", "--n_object_points", "64",
         "--det_annos", str(val / "det_annos.pkl"),
         "--work_dir", str(tmp_path / "static_work")],
    )
    patched = load_pickle(tmp_path / "static_work" / "box" / "one_box_est.pkl")
    assert len(patched) == 10  # one per frame

    # ---- stage 6: dynamic labeler train + eval ----
    _run_tool(
        "dynamic_train.py",
        ["--track", str(val / "trackDynamic.pkl"), "--infos", str(info_path),
         "--n_epoch", "1", "--batch_size", "2", "--npoints", "64",
         "--n_object_points", "64", "--work_dir", str(tmp_path / "dyn_work")],
    )
    _run_tool(
        "dynamic_eval.py",
        ["--track", str(val / "trackDynamic.pkl"), "--infos", str(info_path),
         "--model_path", str(tmp_path / "dyn_work" / "model"),
         "--batch_size", "2", "--npoints", "64", "--n_object_points", "64",
         "--det_annos", str(tmp_path / "static_work" / "box" / "one_box_est.pkl"),
         "--work_dir", str(tmp_path / "dyn_work")],
    )
    final = load_pickle(tmp_path / "dyn_work" / "box" / "box.pkl")
    assert len(final) == 10
    # the final det_annos rows keep the detector schema
    assert {"name", "score", "boxes_lidar", "frame_id", "metadata"} <= set(final[0])

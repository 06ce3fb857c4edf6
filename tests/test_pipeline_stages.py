"""End-to-end pipeline-stage tests on fabricated scenes:
detections -> tracking -> trackData -> track reorg -> trackGT -> motionState.
"""

import importlib.util
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from tdal.data.synthetic import make_synthetic_dataset
from tdal.data.waymo_schema import AnnoStore, dump_pickle, load_pickle, reorganize_info

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


def _fabricate_detections(scenes, annos, noise=0.05, seed=0):
    """GT-as-detections in detector (KITTI) convention, per token."""
    rng = np.random.default_rng(seed)
    detections = {}
    for scene in scenes:
        for f in range(scene.n_frames):
            token = scene.frame_token(f)
            inv = annos.inv_pose(token)
            rows = []
            for obj in scene.objects:
                box9 = scene.gt_box_global(obj, f)
                # global -> vehicle
                from tdal.data.waymo_schema import transform_box_np

                b7 = transform_box_np(box9[None, [0, 1, 2, 3, 4, 5, 8]], inv)[0]
                vel_v = box9[6:8] @ annos.pose(token)[:2, :2]
                # waymo -> detector convention (inverse of waymo_common.py:106-111)
                heading = -np.pi / 2 - b7[6]
                rows.append(
                    np.concatenate([b7[:3], [b7[4], b7[3], b7[5]], vel_v, [heading]])
                    + rng.normal(0, noise, 9) * np.array([1, 1, 0.2, 0.2, 0.2, 0.2, 0.1, 0.1, 0.05])
                )
            boxes = np.stack(rows)
            detections[token] = {
                "box3d_lidar": boxes.astype(np.float32),
                "scores": rng.uniform(0.8, 1.0, len(rows)).astype(np.float32),
                "label_preds": np.zeros(len(rows), np.int64),
            }
    return detections


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stages")
    val = root / "val"
    val.mkdir()
    infos, scenes = make_synthetic_dataset(
        root, n_scenes=2, n_frames=8, seed=7, n_static=2, n_dynamic=2,
        points_per_object=128, n_background=512,
    )
    info_map = reorganize_info(infos)
    annos = AnnoStore(info_map)
    detections = _fabricate_detections(scenes, annos)
    dump_pickle(detections, val / "prediction.pkl")
    return root, val, infos, scenes


def test_tracking_stage(pipeline_root):
    root, val, infos, scenes = pipeline_root
    _run_tool(
        "waymo_tracking/test.py",
        [
            "--work_dir", str(val),
            "--checkpoint", str(val / "prediction.pkl"),
            "--info_path", str(root / "infos.pkl"),
            "--score_thresh", "0.5",
        ],
    )
    td = load_pickle(val / "trackData.pkl")
    assert len(td) == 16  # 2 scenes x 8 frames
    frame = next(iter(td.values()))
    assert set(frame) == {"id", "type", "bbox", "score", "point", "match"}
    # tracker should assign consistent ids and match most boxes to GT names
    matches = [m for f in td.values() for m in f["match"]]
    assert sum(m is not None for m in matches) / len(matches) > 0.8
    assert (val / "det_annos.pkl").exists()


def test_track_reorg_and_gt_and_motion(pipeline_root):
    root, val, infos, scenes = pipeline_root
    _run_tool("trackData.py", ["--work_dir", str(val)])
    track = load_pickle(val / "track.pkl")
    # every track spans several frames of one object
    assert all(len(v["token"]) >= 4 for v in track.values())
    n_objects = sum(len(s.objects) for s in scenes)
    assert len(track) >= n_objects * 0.8

    _run_tool(
        "trackGT.py",
        ["--infos", str(root / "infos.pkl"), "--result", str(val / "trackGT.pkl")],
    )
    gt = load_pickle(val / "trackGT.pkl")
    for s in scenes:
        for obj in s.objects:
            assert gt[obj["name"]]["static"] == (1 if obj["static"] else 0)

    # motionState needs a train side: reuse the val data as train shards
    train = root / "train"
    train.mkdir(exist_ok=True)
    items = list(track.items())
    for i in range(16):
        shard = dict(items[len(items) * i // 16 : len(items) * (i + 1) // 16])
        dump_pickle(shard, train / f"track_{i}.pkl")
    dump_pickle(gt, train / "trackGT.pkl")

    _run_tool(
        "motionState.py",
        ["--track_train", str(train), "--track_val", str(val)],
    )
    static = load_pickle(val / "trackStatic.pkl")
    dynamic = load_pickle(val / "trackDynamic.pkl")
    # GT-as-detections separate cleanly: static objects in static, dynamic in dynamic
    static_names = {v["match"][-1] for v in static.values()}
    dynamic_names = {v["match"][-1] for v in dynamic.values()}
    assert all(n.startswith("st") for n in static_names), static_names
    assert all(n.startswith("dy") for n in dynamic_names), dynamic_names

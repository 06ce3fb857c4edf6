"""Tests: infos builder, GT database creation, DB sampler, collision test."""

import numpy as np
import pytest

from tdal.data.gt_augment import DBSampler, box_collision_test, create_groundtruth_database
from tdal.data.synthetic import SyntheticScene
from tdal.data.waymo_converter import create_waymo_infos, sort_frame


def test_box_collision_test():
    a = np.array([[0, 0, 0, 2, 4, 1, 0, 0, 0.0]])  # detector conv: dims at 3:5, rot last
    b = np.array(
        [
            [0.5, 0.5, 0, 2, 4, 1, 0, 0, 0.0],  # overlapping
            [10, 10, 0, 2, 4, 1, 0, 0, 0.3],  # far away
            [2.5, 0, 0, 2, 4, 1, 0, 0, np.pi / 2],  # rotated: x extent [0.5, 4.5] - overlaps
            [3.5, 0, 0, 2, 4, 1, 0, 0, np.pi / 2],  # rotated: x extent [1.5, 5.5] - clear
        ]
    )
    hit = box_collision_test(a, b)
    assert hit.shape == (1, 4)
    assert bool(hit[0, 0]) is True
    assert bool(hit[0, 1]) is False
    assert bool(hit[0, 2]) is True
    assert bool(hit[0, 3]) is False


def test_sort_frame():
    frames = ["seq_1_frame_2.pkl", "seq_0_frame_10.pkl", "seq_0_frame_2.pkl"]
    assert sort_frame(frames) == [
        "seq_0_frame_2.pkl", "seq_0_frame_10.pkl", "seq_1_frame_2.pkl",
    ]


@pytest.fixture(scope="module")
def prep_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    scenes = [
        SyntheticScene(i, n_frames=6, seed=11, n_static=2, n_dynamic=1,
                       points_per_object=64, n_background=256)
        for i in range(2)
    ]
    for s in scenes:
        s.write(root, split="train")
    return root, scenes


def test_create_infos_with_sweeps(prep_root):
    root, scenes = prep_root
    infos = create_waymo_infos(root, split="train", nsweeps=2)
    assert len(infos) == 12
    assert (root / "infos_train_02sweeps_filter_zero_gt.pkl").exists()
    # frame 0 has the self-sweep with no transform; later frames a real transform
    first = infos[0]
    assert first["sweeps"][0]["transform_matrix"] is None
    later = infos[3]
    tm = later["sweeps"][0]["transform_matrix"]
    assert tm.shape == (4, 4)
    # ego moves 0.5m per frame along +x: prev frame's points map back by -0.5 in x
    np.testing.assert_allclose(tm[0, 3], -0.5, atol=1e-6)
    # gt boxes are KITTI convention (w, l swapped vs anno box9)
    gt = first["gt_boxes"]
    assert gt.shape[1] == 9


def test_gt_database_and_sampler(prep_root):
    root, scenes = prep_root
    infos = create_waymo_infos(root, split="train", nsweeps=1)
    dbinfos = create_groundtruth_database(
        infos, root, nsweeps=1, waymo_subsample=False
    )
    assert "VEHICLE" in dbinfos
    assert all(i["num_points_in_gt"] > 0 for i in dbinfos["VEHICLE"])

    sampler = DBSampler(
        dbinfos, root, sample_groups={"VEHICLE": 10},
        min_points={"VEHICLE": 5}, point_features=5, seed=0,
    )
    rng = np.random.default_rng(0)
    gt_boxes = np.zeros((0, 9), np.float32)
    out = sampler.sample_all(gt_boxes, np.array([], dtype=str), rng)
    assert out is not None
    assert len(out["gt_boxes"]) > 0
    assert out["points"].shape[1] == 5
    # sampled boxes must not collide with each other
    hits = box_collision_test(out["gt_boxes"], out["gt_boxes"])
    np.testing.assert_array_equal(hits, np.eye(len(out["gt_boxes"]), dtype=bool))
    # sampled points sit inside their boxes (center-relative storage roundtrip)
    from tdal.data.waymo_schema import points_in_rbbox_np

    box7 = out["gt_boxes"][:, [0, 1, 2, 3, 4, 5, 8]]
    # detector convention has (w, l) swapped vs geometric (l, w): swap back
    box7_geo = box7.copy()
    box7_geo[:, [3, 4]] = box7_geo[:, [4, 3]]
    box7_geo[:, 6] = -np.pi / 2 - box7_geo[:, 6]
    inside = points_in_rbbox_np(out["points"], box7_geo)
    assert inside.any(axis=1).mean() > 0.9


def test_combined_difficulty_rule():
    """Pin the Waymo combined-difficulty mapping (waymo_decoder.py:175-185).

    Reference quirk: the 999-for-empty-boxes assignment is always overwritten
    (no elif), so empty unlabeled boxes land in LEVEL_2."""
    from tdal.data.waymo_decoder_tf import combined_difficulty

    assert combined_difficulty(0, 5) == 1
    assert combined_difficulty(0, 100) == 1
    assert combined_difficulty(0, 4) == 2
    assert combined_difficulty(0, 1) == 2
    assert combined_difficulty(0, 0) == 2  # NOT 999 (reference dead branch)
    assert combined_difficulty(2, 0) == 2
    assert combined_difficulty(2, 100) == 2
    assert combined_difficulty(1, 0) == 1


def test_dataset_wrappers():
    """ConcatDataset / RepeatDataset (reference dataset_wrappers.py:7-55)."""
    from tdal.data.dataset_wrappers import ConcatDataset, RepeatDataset
    from tdal.runtime.registry import DATASETS

    class Toy:
        class_names = ["VEHICLE"]

        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    a, b = Toy([1, 2, 3]), Toy([10, 20])
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert [cat[i] for i in range(5)] == [1, 2, 3, 10, 20]
    assert cat[-1] == 20
    assert cat.class_names == ["VEHICLE"]
    with pytest.raises(IndexError):
        cat[5]

    rep = RepeatDataset(a, times=3)
    assert len(rep) == 9
    assert [rep[i] for i in range(9)] == [1, 2, 3] * 3
    assert rep.class_names == ["VEHICLE"]

    assert DATASETS.get("ConcatDataset") is ConcatDataset
    assert DATASETS.get("RepeatDataset") is RepeatDataset

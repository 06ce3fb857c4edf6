import numpy as np

from tdal.core import nms as N

import oracles


def _boxes_with_clusters(rng, n_clusters=6, per_cluster=5):
    boxes = []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(-40, 40, 2)
        for _ in range(per_cluster):
            boxes.append(
                [
                    cx + rng.uniform(-0.3, 0.3),
                    cy + rng.uniform(-0.3, 0.3),
                    rng.uniform(-1, 1),
                    rng.uniform(3.5, 4.5),
                    rng.uniform(1.6, 2.0),
                    rng.uniform(1.4, 1.8),
                    rng.uniform(-0.2, 0.2),
                ]
            )
    return np.array(boxes, dtype=np.float32)


def test_rotated_nms_matches_oracle():
    rng = np.random.RandomState(0)
    boxes = _boxes_with_clusters(rng)
    scores = rng.uniform(0.1, 1.0, len(boxes)).astype(np.float32)
    idx, valid = N.rotated_nms(
        boxes, scores, iou_threshold=0.5, pre_max_size=64, post_max_size=16
    )
    got = list(np.asarray(idx)[np.asarray(valid)])
    expect = oracles.greedy_nms_bev(boxes, scores, 0.5)[:16]
    assert got == expect


def test_rotated_nms_keeps_all_disjoint():
    boxes = np.array(
        [[i * 100.0, 0, 0, 4, 2, 1.5, 0.3] for i in range(5)], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], dtype=np.float32)
    idx, valid = N.rotated_nms(boxes, scores, 0.1, 8, 8)
    assert np.asarray(valid).sum() == 5
    assert list(np.asarray(idx)[:5]) == [0, 1, 2, 3, 4]


def test_rotated_nms_masked_scores_ignored():
    boxes = np.tile(
        np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], dtype=np.float32), (6, 1)
    )
    scores = np.array([0.9, 0.8, -np.inf, -np.inf, 0.7, 0.6], dtype=np.float32)
    idx, valid = N.rotated_nms(boxes, scores, 0.5, 6, 6)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == [0]  # all identical boxes -> only top survives; -inf never kept


def test_rotated_nms_post_max_truncates():
    boxes = np.array(
        [[i * 100.0, 0, 0, 4, 2, 1.5, 0.0] for i in range(10)], dtype=np.float32
    )
    scores = np.linspace(1.0, 0.1, 10).astype(np.float32)
    idx, valid = N.rotated_nms(boxes, scores, 0.5, 16, 4)
    assert np.asarray(valid).sum() == 4
    assert list(np.asarray(idx)[:4]) == [0, 1, 2, 3]


def test_circle_nms_matches_oracle():
    rng = np.random.RandomState(1)
    centers = rng.uniform(-20, 20, size=(40, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    idx, valid = N.circle_nms(centers, scores, dist_threshold=4.0, post_max_size=40)
    got = list(np.asarray(idx)[np.asarray(valid)])
    expect = oracles.greedy_circle_nms(centers, scores, 4.0)
    assert got == expect

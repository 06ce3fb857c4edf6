"""Parity tests: JAX rotated IoU/NMS vs the independent native C++ oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tdal.ops import native


def _random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(1, 5, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_native_iou_bev_matches_jax():
    from tdal.core.iou import boxes_iou_bev

    a = _random_boxes(24, 0)
    b = _random_boxes(16, 1)
    native_iou = native.boxes_iou_bev(a, b)
    jax_iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(jax_iou, native_iou, atol=2e-3)


def test_native_iou_3d_matches_jax():
    from tdal.core.iou import boxes_iou_3d

    a = _random_boxes(16, 2)
    b = _random_boxes(16, 3)
    native_iou = native.boxes_iou_3d(a, b)
    jax_iou = np.asarray(boxes_iou_3d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(jax_iou, native_iou, atol=2e-3)


def test_native_nms_matches_jax():
    from tdal.core.nms import rotated_nms

    boxes = _random_boxes(64, 4)
    rng = np.random.default_rng(5)
    scores = rng.uniform(0.1, 1.0, 64).astype(np.float32)
    native_keep = native.nms_rotated(boxes, scores, 0.5)
    idx, valid = rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, pre_max_size=64, post_max_size=64
    )
    jax_keep = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(native_keep), np.sort(jax_keep))


def test_native_nms_suppression_basic():
    boxes = np.array(
        [
            [0, 0, 0, 4, 2, 1.5, 0.0],
            [0.2, 0.0, 0, 4, 2, 1.5, 0.0],  # near duplicate
            [10, 10, 0, 4, 2, 1.5, 0.7],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = native.nms_rotated(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep), [0, 2])

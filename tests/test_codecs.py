import numpy as np

from tdal.core import codecs as C

from oracles import (
    ref_angle2class,
    ref_class2angle,
    ref_size2class,
    MEAN_SIZE_ARR,
)


def test_angle2class_matches_reference_scalar():
    angles = np.concatenate(
        [
            np.linspace(-4 * np.pi, 4 * np.pi, 101),
            np.array([0.0, np.pi, -np.pi, 2 * np.pi - 1e-7]),
        ]
    )
    cls_j, res_j = C.angle2class(angles)
    cls_j, res_j = np.asarray(cls_j), np.asarray(res_j)
    for i, a in enumerate(angles):
        c, r = ref_angle2class(a)
        assert cls_j[i] == c, f"angle {a}"
        np.testing.assert_allclose(res_j[i], r, atol=1e-6)


def test_class2angle_matches_reference_scalar():
    rng = np.random.RandomState(0)
    cls = rng.randint(0, 12, size=50)
    res = rng.uniform(-np.pi / 12, np.pi / 12, size=50)
    out = np.asarray(C.class2angle(cls, res))
    for i in range(50):
        np.testing.assert_allclose(
            out[i], ref_class2angle(cls[i], res[i]), atol=1e-6
        )


def test_angle_codec_roundtrip():
    angles = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 97)
    cls, res = C.angle2class(angles)
    back = np.asarray(C.class2angle(cls, res))
    # roundtrip is exact modulo 2*pi
    diff = np.abs(np.mod(back - angles + np.pi, 2 * np.pi) - np.pi)
    assert diff.max() < 1e-5


def test_size_codec_matches_reference():
    rng = np.random.RandomState(1)
    sizes = rng.uniform(0.5, 12.0, size=(64, 3))
    cls_j, res_j = C.size2class(sizes)
    cls_j, res_j = np.asarray(cls_j), np.asarray(res_j)
    for i in range(64):
        c, r = ref_size2class(sizes[i])
        assert cls_j[i] == c
        np.testing.assert_allclose(res_j[i], r, atol=1e-6)
    back = np.asarray(C.class2size(cls_j, res_j))
    np.testing.assert_allclose(back, sizes, atol=1e-6)


def test_mean_size_arr_parity():
    np.testing.assert_allclose(C.MEAN_SIZE_ARR, MEAN_SIZE_ARR)
    assert C.NUM_HEADING_BIN == 12
    assert C.NUM_SIZE_CLUSTER == 3

"""Tests for auxiliary components: DCN, double-flip TTA, circle NMS path, FLOPs,
visualization, line search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_deform_sample_zero_offsets_is_conv_patch():
    from tdal.models.dcn import deform_sample

    x = jnp.arange(2 * 5 * 5 * 1, dtype=jnp.float32).reshape(2, 5, 5, 1)
    offsets = jnp.zeros((2, 5, 5, 18))
    taps = deform_sample(x, offsets)
    assert taps.shape == (2, 5, 5, 9, 1)
    # at interior position (2,2) the center tap equals x itself
    np.testing.assert_allclose(np.asarray(taps)[0, 2, 2, 4, 0], np.asarray(x)[0, 2, 2, 0])
    # top-left corner: out-of-bounds taps are zero
    np.testing.assert_allclose(np.asarray(taps)[0, 0, 0, 0, 0], 0.0)


def test_deform_sample_half_offset_interpolates():
    from tdal.models.dcn import deform_sample

    x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    offsets = jnp.zeros((1, 5, 5, 18)).at[..., 8].set(0.5)  # tap 4 (center) dy=+0.5
    taps = deform_sample(x, offsets)
    # center tap at (2,2) becomes midpoint of rows 2 and 3
    expect = (12 + 17) / 2
    np.testing.assert_allclose(np.asarray(taps)[0, 2, 2, 4, 0], expect)


def test_dcn_sep_head_shapes():
    from tdal.models.dcn import DCNSepHead

    head = DCNSepHead(heads={"reg": (2, 2), "height": (1, 2)}, num_cls=3)
    x = jnp.ones((2, 8, 8, 64))
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out["hm"].shape == (2, 8, 8, 3)
    assert out["reg"].shape == (2, 8, 8, 2)


def test_double_flip_average_identity():
    """If all 4 variants carry the correctly-flipped same map, averaging must
    reproduce the original maps exactly."""
    from tdal.models.tta import average_double_flip_preds

    rng = np.random.default_rng(0)
    H = W = 6
    base = {
        "hm": rng.random((1, H, W, 3)).astype(np.float32),
        "height": rng.random((1, H, W, 1)).astype(np.float32),
        "dim": rng.random((1, H, W, 3)).astype(np.float32),
        "reg": rng.random((1, H, W, 2)).astype(np.float32),
        "rot": rng.random((1, H, W, 2)).astype(np.float32),
        "vel": rng.random((1, H, W, 2)).astype(np.float32),
    }
    variants = {}
    for k, v in base.items():
        v0 = v[0]
        v1, v2, v3 = v0.copy(), v0.copy(), v0.copy()
        # construct what a flipped input would produce: spatial flip of the map
        v1 = v1[::-1]  # yflip -> H axis flip
        v2 = v2[:, ::-1]
        v3 = v3[::-1, ::-1]
        if k == "reg":
            v1 = v1.copy(); v1[..., 1] = 1 - v1[..., 1]
            v2 = v2.copy(); v2[..., 0] = 1 - v2[..., 0]
            v3 = v3.copy(); v3[..., 0] = 1 - v3[..., 0]; v3[..., 1] = 1 - v3[..., 1]
        if k == "rot":
            v1 = v1.copy(); v1[..., 1] *= -1
            v2 = v2.copy(); v2[..., 0] *= -1
            v3 = v3.copy(); v3[..., 0] *= -1; v3[..., 1] *= -1
        if k == "vel":
            v1 = v1.copy(); v1[..., 1] *= -1
            v2 = v2.copy(); v2[..., 0] *= -1
            v3 = -v3
        variants[k] = jnp.asarray(np.stack([v0, v1, v2, v3]))
    out = average_double_flip_preds(variants)
    for k in base:
        # hm/dim are averaged AFTER activation (reference center_head.py:342-356)
        if k == "hm":
            want = 1.0 / (1.0 + np.exp(-base[k]))
        elif k == "dim":
            want = np.exp(base[k])
        else:
            want = base[k]
        np.testing.assert_allclose(np.asarray(out[k]), want, atol=1e-6, err_msg=k)


def test_double_flip_points():
    from tdal.models.tta import double_flip_points

    pts = np.array([[1.0, 2.0, 3.0, 0.5]])
    o, yf, xf, both = double_flip_points(pts)
    np.testing.assert_allclose(yf[0], [1, -2, 3, 0.5])
    np.testing.assert_allclose(xf[0], [-1, 2, 3, 0.5])
    np.testing.assert_allclose(both[0], [-1, -2, 3, 0.5])


def test_circle_nms_predict_path():
    from tdal.models.center_head import post_process_task

    boxes = jnp.zeros((1, 16, 7)).at[0, :, 3:6].set(1.0)
    boxes = boxes.at[0, 1, 0].set(0.1)  # near-duplicate of box 0
    boxes = boxes.at[0, 2, 0].set(10.0)  # far box
    hm = jnp.full((1, 16, 2), 0.01).at[0, 0, 0].set(0.9).at[0, 1, 0].set(0.8).at[0, 2, 1].set(0.7)
    cfg = dict(
        post_center_limit_range=[-20, -20, -5, 20, 20, 5],
        nms=dict(nms_pre_max_size=16, nms_post_max_size=8, nms_iou_threshold=0.7),
        score_threshold=0.1,
        circular_nms=True,
        min_radius=[1.0],
    )
    r = post_process_task(boxes, hm, cfg, task_id=0)
    valid = np.asarray(r["valid"][0])
    kept_x = np.asarray(r["box3d_lidar"][0])[valid][:, 0]
    assert valid.sum() == 2  # near-duplicate suppressed (dist^2 0.01 <= 1.0)
    assert set(np.round(kept_x, 2)) == {0.0, 10.0}


def test_flops_counter():
    from tdal.utils.flops import cost_analysis, flops

    def f(a, b):
        return a @ b

    a = jnp.ones((128, 256))
    b = jnp.ones((256, 64))
    fl = flops(f, a, b)
    assert fl >= 2 * 128 * 256 * 64 * 0.9  # ~2MNK


def test_plot_bev(tmp_path):
    from tdal.utils.visualize import plot_bev

    pts = np.random.default_rng(0).uniform(-10, 10, (100, 3))
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]])
    out = plot_bev(points=pts, boxes=boxes, gt_boxes=boxes, out_path=tmp_path / "f.png")
    assert (tmp_path / "f.png").exists()

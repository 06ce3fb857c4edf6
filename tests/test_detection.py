"""Detection stack tests: targets, losses, decode roundtrip, detector training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdal.core.targets import AssignerConfig, assign_centernet_targets, gaussian_radius
from tdal.core.voxel import VoxelConfig, pad_points
from tdal.data.detection import collate_detection
from tdal.models.center_head import decode_preds, post_process_task
from tdal.models.detectors import PointPillars, VoxelNet
from tdal.pipeline.detector_engine import make_detector_steps, predictions_to_host
from tdal.runtime.train_state import TrainState, init_model

TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
VOX = VoxelConfig(
    point_cloud_range=(-8, -8, -2, 8, 8, 2),
    voxel_size=(0.5, 0.5, 4.0),
    max_points_per_voxel=8,
    max_voxels=1024,
)
ASG = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=50)
TEST_CFG = dict(
    post_center_limit_range=[-10, -10, -5, 10, 10, 5],
    nms=dict(nms_pre_max_size=512, nms_post_max_size=64, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-8, -8],
    out_size_factor=1,
    voxel_size=[0.5, 0.5],
)

BOX = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0.5, -0.25, 0.3]], np.float32)


def test_gaussian_radius_reference_values():
    # quadratic-roots formula from center_utils.py:17-37
    assert gaussian_radius((10, 5), 0.1) == pytest.approx(3.0, abs=1e-6)
    assert gaussian_radius((4, 4), 0.5) == pytest.approx(1.6568542, abs=1e-5)


def test_assign_targets_peak_at_center():
    t = assign_centernet_targets(
        BOX, np.array([1], np.int32), ASG, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size
    )
    hm = t["hm"][0]  # (H, W, 3)
    assert hm.shape == (32, 32, 3)
    # center cell: x=(1+8)/0.5=18, y=(2+8)/0.5=20
    assert hm[20, 18, 0] == 1.0
    assert hm[..., 1:].max() == 0.0  # only class 0 drawn
    assert t["mask"][0][0] == 1 and t["ind"][0][0] == 20 * 32 + 18
    # anno_box: [dx, dy, z, log dims, vx, vy, sin, cos]
    np.testing.assert_allclose(t["anno_box"][0][0, 2], 0.2, atol=1e-6)
    np.testing.assert_allclose(t["anno_box"][0][0, 3:6], np.log(BOX[0, 3:6]), atol=1e-6)
    np.testing.assert_allclose(t["anno_box"][0][0, 8], np.sin(0.3), atol=1e-6)
    # gt_boxes_and_cls reorder: [x,y,z,w,l,h,rot,vx,vy,cls]
    np.testing.assert_allclose(
        t["gt_boxes_and_cls"][0],
        [1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0.3, 0.5, -0.25, 1.0],
        atol=1e-5,
    )


def test_decode_roundtrip_recovers_gt():
    """Fabricate ideal head outputs from the targets and check predict recovers the
    GT box — validates decode_preds + post_process against assign_centernet_targets."""
    t = assign_centernet_targets(
        BOX, np.array([1], np.int32), ASG, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size
    )
    H, W = 32, 32
    hm_logit = jnp.asarray(np.where(t["hm"][0] > 0.99, 10.0, -10.0))[None]
    anno = t["anno_box"][0][0]
    reg = np.zeros((H, W, 2), np.float32)
    hei = np.zeros((H, W, 1), np.float32)
    dim = np.zeros((H, W, 3), np.float32)
    rot = np.zeros((H, W, 2), np.float32)
    vel = np.zeros((H, W, 2), np.float32)
    y, x = 20, 18
    reg[y, x] = anno[:2]
    hei[y, x] = anno[2]
    dim[y, x] = anno[3:6]
    vel[y, x] = anno[6:8]
    rot[y, x] = anno[8:10][::-1]  # preds['rot'] = (sin, cos)? decode: atan2(rot0, rot1)
    preds = {
        "hm": hm_logit,
        "reg": jnp.asarray(reg)[None],
        "height": jnp.asarray(hei)[None],
        "dim": jnp.asarray(dim)[None],
        "rot": jnp.asarray(np.stack([np.full((H, W), 0.0), np.full((H, W), 1.0)], -1), jnp.float32)[None]
        .at[0, y, x, 0].set(anno[8])
        .at[0, y, x, 1].set(anno[9]),
        "vel": jnp.asarray(vel)[None],
    }
    boxes, hm = decode_preds(preds, TEST_CFG)
    r = post_process_task(boxes, hm, TEST_CFG)
    valid = np.asarray(r["valid"][0])
    assert valid.sum() == 1
    box = np.asarray(r["box3d_lidar"][0][valid])[0]
    np.testing.assert_allclose(box[:3], BOX[0, :3], atol=1e-3)
    np.testing.assert_allclose(box[3:6], BOX[0, 3:6], rtol=1e-3)
    np.testing.assert_allclose(box[6:8], BOX[0, 6:8], atol=1e-3)  # velocity
    np.testing.assert_allclose(box[8], BOX[0, 8], atol=1e-3)
    assert int(r["label_preds"][0][valid][0]) == 0


def _make_batch(B=2, n_pts=512, seed=0, out_size_factor=1):
    rng = np.random.default_rng(seed)
    # points inside the GT box plus clutter
    local = (rng.random((300, 3)) - 0.5) * BOX[0, 3:6][[1, 0, 2]]
    c, s = np.cos(0.3), np.sin(0.3)
    obj = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]) + BOX[0, :3]
    bg = rng.uniform(-8, 8, (200, 3))
    pts = np.concatenate([obj, bg], 0).astype(np.float32)
    pts = np.concatenate([pts, np.ones((len(pts), 2), np.float32)], 1)
    padded = pad_points(pts, n_pts)
    import dataclasses
    asg = dataclasses.replace(ASG, out_size_factor=out_size_factor)
    t = assign_centernet_targets(
        BOX, np.array([1], np.int32), asg, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size
    )
    items = [dict(t, points=padded, token=f"tok{i}") for i in range(B)]
    batch = collate_detection(items)
    tokens = batch.pop("token")
    batch = {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in batch.items()
    }
    return batch, tokens


@pytest.mark.parametrize("cls", [PointPillars, VoxelNet])
def test_detector_trains_and_predicts(cls):
    det = cls(voxel_cfg=VOX, tasks=tuple(TASKS), rpn_layer_nums=(1, 1, 1) if cls is PointPillars else (1, 1),
              **({} if cls is PointPillars else dict(rpn_ds_strides=(1, 2), rpn_ds_filters=(64, 128),
                                                     rpn_us_strides=(1, 2), rpn_us_filters=(64, 64))))
    batch, tokens = _make_batch(out_size_factor=det.out_size_factor)
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(1e-3), bs)
    tcfg = dict(TEST_CFG, out_size_factor=det.out_size_factor)
    train_step, predict_step = make_detector_steps(
        det, tcfg, code_weights=[1.0] * 8, donate=False
    )
    l0 = None
    for _ in range(8):
        state, logs = train_step(state, batch)
        if l0 is None:
            l0 = float(logs["loss"])
    assert float(logs["loss"]) < l0
    preds = predict_step(state, batch["points"])
    host = predictions_to_host(preds, tokens)
    assert set(host) == set(tokens)
    assert host[tokens[0]]["box3d_lidar"].shape[1] == 7


def test_pointpillars_overfits_single_frame():
    """Stronger sanity: 60 steps on one frame must localize the object heatmap."""
    det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), rpn_layer_nums=(1, 1, 1))
    batch, tokens = _make_batch()
    key = jax.random.PRNGKey(1)
    params, bs = init_model(det, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(2e-3), bs)
    train_step, predict_step = make_detector_steps(
        det, TEST_CFG, code_weights=[1.0] * 8, donate=False
    )
    for _ in range(60):
        state, logs = train_step(state, batch)
    preds = predict_step(state, batch["points"])
    valid = np.asarray(preds["valid"][0])
    assert valid.any(), "no detections after overfitting"
    boxes = np.asarray(preds["box3d_lidar"][0])[valid]
    scores = np.asarray(preds["scores"][0])[valid]
    best = boxes[np.argmax(scores)]
    # the top detection lands near the GT center
    assert np.linalg.norm(best[:2] - BOX[0, :2]) < 1.5, best


def test_tta_predict_step():
    from tdal.models.tta import double_flip_points
    from tdal.pipeline.detector_engine import make_tta_predict_step

    det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), rpn_layer_nums=(1, 1, 1))
    batch, tokens = _make_batch()
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(1e-3), bs)
    variants = [double_flip_points(np.asarray(p)) for p in np.asarray(batch["points"])]
    pts4 = jnp.asarray(np.stack([v for vs in variants for v in vs]))  # (B*4, N, D)
    tta_step = make_tta_predict_step(det, TEST_CFG)
    preds = tta_step(state, pts4)
    # output batch is B (averaged over the 4 variants)
    assert preds["box3d_lidar"].shape[0] == 2
    assert preds["scores"].shape == (2, TEST_CFG["nms"]["nms_post_max_size"])


def test_sep_head_matches_reference_composition():
    """SepHead's fused/chained layout == the reference's independent per-branch
    [Conv3x3+bias -> BN -> ReLU -> Conv3x3+bias] stacks (center_head.py:65-110)
    with grafted params, in BOTH modes. Guards the emit_raw chaining: the
    branch conv's BN normalize+ReLU rides the final masked conv's input side
    and must be mathematically identical to materializing it."""
    from tdal.models.center_head import SepHead

    heads = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "hm": (3, 2)}
    outs = [heads[n][0] for n in heads]
    mod = SepHead(heads, head_conv=8, final_kernel=3, init_bias=-2.19)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 12, 13, 16))
    vs = mod.init({"params": key}, x, train=True)
    params, stats = vs["params"], vs["batch_stats"]
    # perturb so batch stats differ from init zeros/ones
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jnp.sign(jnp.sin(jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape)),
        params,
    )

    def ref(x, train):
        b = params["branch_convbn0"]
        h = jax.lax.conv_general_dilated(
            x, b["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b["conv_bias"]
        bs = stats["branch_convbn0"]
        if train:
            mean = h.mean(axis=(0, 1, 2))
            var = h.var(axis=(0, 1, 2))
        else:
            mean, var = bs["mean"], bs["var"]
        # head BNs carry the reference's nn.BatchNorm2d DEFAULT eps 1e-5
        # (center_head.py:88), pinned by tests/test_torch_parity_detector.py
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * b["scale"] + b["bias"]
        h = jax.nn.relu(h)
        ys, ci, co = [], 0, 0
        for c in outs:
            blk = params["final_conv_kernel"][:, :, ci : ci + 8, co : co + c]
            y = jax.lax.conv_general_dilated(
                h[..., ci : ci + 8], blk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + params["final_conv_bias"][co : co + c]
            ys.append(y)
            ci += 8
            co += c
        return jnp.concatenate(ys, -1)

    for train in (True, False):
        got = mod.apply(
            {"params": params, "batch_stats": stats}, x, train=train,
            mutable=["batch_stats"] if train else False,
        )
        got = got[0] if train else got
        want = ref(x, train)
        gcat = jnp.concatenate([got[n] for n in heads], -1)
        np.testing.assert_allclose(
            np.asarray(gcat), np.asarray(want), rtol=2e-4, atol=2e-4
        )

"""Spatial partitioning (SP) of the dense BEV stack over the mesh.

The detectors accept a ``bev_sharding`` NamedSharding (parallel.mesh
.spatial_sharding) that splits the BEV canvas H dim across devices; XLA's SPMD
partitioner then spatially partitions every RPN/head conv and inserts the halo
exchanges itself. This is the latency-scaling story for serving a SINGLE frame
across chips — inexpressible in the reference's DP-only design (SURVEY.md §2.8,
tools/train.py:84-88). These tests pin numerical equality with the unsharded
program on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdal.core.targets import AssignerConfig, assign_centernet_targets
from tdal.core.voxel import VoxelConfig, pad_points
from tdal.data.detection import collate_detection
from tdal.models.detectors import PointPillars
from tdal.parallel.mesh import make_mesh, shard_batch, spatial_sharding
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.runtime.train_state import TrainState, init_model

VOX = VoxelConfig((-8, -8, -2, 8, 8, 4.0), (0.5, 0.5, 6.0), 5, 128)
TASKS = [dict(num_class=1, class_names=["VEHICLE"])]
TEST_CFG = dict(
    post_center_limit_range=[-10, -10, -10, 10, 10, 10],
    nms=dict(nms_pre_max_size=64, nms_post_max_size=16, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-8, -8],
    out_size_factor=1,
    voxel_size=[0.5, 0.5],
)


def _detector(bev_sharding=None):
    return PointPillars(
        voxel_cfg=VOX, tasks=tuple(TASKS), num_filters=(8,),
        rpn_layer_nums=(1,), rpn_ds_strides=(1,), rpn_ds_filters=(8,),
        rpn_us_strides=(1,), rpn_us_filters=(8,),
        bev_sharding=bev_sharding,
    )


def _batch(batch_size):
    rng = np.random.default_rng(0)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=10)
    items = []
    for i in range(batch_size):
        p = rng.uniform(-8, 8, (200, 5)).astype(np.float32)
        boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
        t = assign_centernet_targets(
            boxes, np.array([1], np.int32), asg, VOX.grid_size,
            VOX.point_cloud_range, VOX.voxel_size,
        )
        items.append(dict(t, points=pad_points(p, 256), token=f"t{i}"))
    b = collate_detection(items)
    b.pop("token")
    b.pop("gt_boxes_and_cls")
    return {
        k: ([jnp.asarray(x) for x in v] if isinstance(v, list) else jnp.asarray(v))
        for k, v in b.items()
    }


def _predict(det, batch):
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(1e-3), bs)
    _, predict_step = make_detector_steps(det, TEST_CFG, [1.0] * 8, donate=False)
    return state, predict_step(state, batch["points"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_predict_matches_unsharded():
    batch = _batch(2)
    _, ref = _predict(_detector(), batch)

    mesh = make_mesh(axis_names=("spatial",), axis_sizes=(8,),
                     devices=jax.devices()[:8])
    sharded_pts = jax.device_put(batch["points"])
    _, sp = _predict(_detector(spatial_sharding(mesh)), dict(batch, points=sharded_pts))

    for k in ("box3d_lidar", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sp[k]), rtol=1e-5, atol=1e-5,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sp_mixed_mesh_predict():
    """2-way data parallel x 4-way spatial on one mesh: batch sharded over dp,
    canvas H over sp — the production serving layout."""
    batch = _batch(2)
    _, ref = _predict(_detector(), batch)

    mesh = make_mesh(axis_names=("data", "spatial"), axis_sizes=(2, 4),
                     devices=jax.devices()[:8])
    sharded = shard_batch(batch, mesh)
    det = _detector(spatial_sharding(mesh, batch_axis="data"))
    _, sp = _predict(det, sharded)

    for k in ("box3d_lidar", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sp[k]), rtol=1e-5, atol=1e-5,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_train_step_matches_unsharded():
    """One SP train step == one unsharded train step (loss, grads-through-
    update, BN stats): the conv stack runs in XLA ops under SP (the xla_only
    route — a pallas_call cannot be SPMD-partitioned), and XLA inserts the BN
    stat reductions over the sharded canvas itself."""
    batch = _batch(2)
    key = jax.random.PRNGKey(0)

    def one_step(det, b):
        params, bs = init_model(det, {"params": key}, b["points"])
        # SGD(1.0): the param delta IS the gradient, so grads compare with a
        # plain atol. (Adam's first-step sign normalization amplifies the
        # +-eps reduction-order noise of theoretically-zero grads to +-lr.)
        state = TrainState.create(params, optax.sgd(1.0), bs)
        train_step, _ = make_detector_steps(det, TEST_CFG, [1.0] * 8, donate=False)
        new_state, logs = train_step(state, b)
        return new_state, logs

    ref_state, ref_logs = one_step(_detector(), batch)

    mesh = make_mesh(axis_names=("spatial",), axis_sizes=(8,),
                     devices=jax.devices()[:8])
    sp_state, sp_logs = one_step(_detector(spatial_sharding(mesh)), batch)

    np.testing.assert_allclose(
        float(ref_logs["loss"]), float(sp_logs["loss"]), rtol=1e-5
    )
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_sp = jax.tree_util.tree_leaves(sp_state.params)
    # atol 5e-5 = 50 ulps of reduction-order noise on theoretically-zero
    # grads (fp32 sums over a canvas split 8 ways sum in a different order)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(sp_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_xla_only_pins_the_backward_route(monkeypatch):
    """A custom_vjp backward is traced during grad transposition — AFTER the
    ``with xla_only()`` block has exited — so the Pallas/XLA route must be
    captured statically at call time. If it is read from the global at
    backward-trace time instead, the SP train step's backward re-emits
    pallas_calls, which the SPMD partitioner cannot split (it would all-gather
    the sharded canvas). Invisible on CPU, where _use_pallas is always False:
    simulate the TPU predicate with a monkeypatch and inspect the jaxpr."""
    from tdal.ops import pallas_conv as pc

    monkeypatch.setattr(pc, "_use_pallas", lambda x, co: not pc._FORCE_XLA)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    s = jnp.ones((8,), jnp.float32)
    t = jnp.zeros((8,), jnp.float32)

    def loss_sharded(x, w):
        with pc.xla_only():
            y, st = pc.conv3x3_act_stats(x, w, b, s, t, True)
            z = pc.conv3x3_bias(y, w, b)
        return (z.astype(jnp.float32) ** 2).sum() + st.sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss_sharded, argnums=(0, 1)))(x, w)
    assert "pallas" not in str(jaxpr), "Pallas op traced under xla_only()"

    def loss_plain(x, w):
        y, st = pc.conv3x3_act_stats(x, w, b, s, t, True)
        z = pc.conv3x3_bias(y, w, b)
        return (z.astype(jnp.float32) ** 2).sum() + st.sum()

    # sanity: the patched predicate does route to Pallas outside the block
    jaxpr2 = jax.make_jaxpr(jax.grad(loss_plain, argnums=(0, 1)))(x, w)
    assert "pallas" in str(jaxpr2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_program_is_actually_partitioned():
    """The compiled SP program must hold the canvas SHARDED (per-device conv
    input is a 1/8 H-slice), not silently all-gather everything."""
    mesh = make_mesh(axis_names=("spatial",), axis_sizes=(8,),
                     devices=jax.devices()[:8])
    det = _detector(spatial_sharding(mesh))
    batch = _batch(2)
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    variables = {"params": params, "batch_stats": bs}

    canvas_fn = jax.jit(
        lambda pts: det.apply(variables, pts, train=False, return_feature=True)[1]
    )
    feat = canvas_fn(batch["points"])
    # RPN output inherits the spatial sharding from the constrained canvas
    spec = feat.sharding.spec
    assert "spatial" in str(spec), f"RPN output not spatially sharded: {spec}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_sparse_voxelnet_predict_matches_unsharded():
    """SP predict equivalence at REFERENCE DEPTH (VERDICT r4 item 8b): the
    production gather-based sparse middle backbone (2 SparseBasicBlocks per
    stage, scn_sparse.py) feeding a spatially-sharded RPN/head stack must
    produce the unsharded predictions. Eval mode — running BN stats, no
    reassociation-amplifying BN backward — so tight tolerances hold."""
    from tdal.models.detectors import VoxelNet

    vox3d = VoxelConfig((-8, -8, -2, 8, 8, 4.0), (0.5, 0.5, 0.75), 5, 256)

    def _vdet(bev_sharding=None):
        return VoxelNet(
            voxel_cfg=vox3d, tasks=tuple(TASKS), sparse_middle=True,
            rpn_layer_nums=(1,), rpn_ds_strides=(1,), rpn_ds_filters=(8,),
            rpn_us_strides=(1,), rpn_us_filters=(8,),
            bev_sharding=bev_sharding,
        )

    rng = np.random.default_rng(0)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=8, max_objs=10)
    items = []
    for i in range(2):
        p = rng.uniform(-8, 8, (200, 5)).astype(np.float32)
        boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
        t = assign_centernet_targets(
            boxes, np.array([1], np.int32), asg, vox3d.grid_size,
            vox3d.point_cloud_range, vox3d.voxel_size,
        )
        items.append(dict(t, points=pad_points(p, 256), token=f"t{i}"))
    b = collate_detection(items)
    b.pop("token")
    b.pop("gt_boxes_and_cls")
    batch = {
        k: ([jnp.asarray(x) for x in v] if isinstance(v, list) else jnp.asarray(v))
        for k, v in b.items()
    }
    cfg = dict(TEST_CFG, out_size_factor=8, voxel_size=[0.5, 0.5])

    key = jax.random.PRNGKey(0)
    det_ref = _vdet()
    params, bs = init_model(det_ref, {"params": key}, batch["points"])
    state = TrainState.create(params, optax.adam(1e-3), bs)
    _, predict_ref = make_detector_steps(det_ref, cfg, [1.0] * 8, donate=False)
    ref = predict_ref(state, batch["points"])

    mesh = make_mesh(axis_names=("data", "spatial"), axis_sizes=(2, 4),
                     devices=jax.devices()[:8])
    det_sp = _vdet(spatial_sharding(mesh, batch_axis="data"))
    _, predict_sp = make_detector_steps(det_sp, cfg, [1.0] * 8, donate=False)
    sp = predict_sp(state, shard_batch({"points": batch["points"]}, mesh)["points"])

    for k in ("box3d_lidar", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sp[k]), rtol=1e-5, atol=1e-5,
        )

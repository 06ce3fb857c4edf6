"""Multi-host readiness: shard_map gradient-psum equivalence + 2-process smoke.

The real-pod path (jax.distributed.initialize + Mesh over all processes'
devices) must not be first-exercised on hardware; these tests pin down
(a) that a data-parallel sharded train step computes EXACTLY the single-device
gradients (XLA's implicit psum == full-batch grad), on the 8-device CPU mesh,
and (b) that two separate processes can jax.distributed.initialize over
localhost and run a global collective (the launcher path of
tdal.parallel.mesh.init_distributed; reference torchie/apis/env.py:13-48).
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.parallel.mesh import DATA_AXIS, make_mesh


def _toy_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (12, 32)) * 0.1,
        "w2": jax.random.normal(k2, (32, 3)) * 0.1,
    }


def _loss(params, x, y):
    h = jnp.tanh(x @ params["w1"])
    pred = h @ params["w2"]
    return jnp.mean((pred - y) ** 2)


def test_shard_map_grads_match_single_device():
    """Per-device grads reduced over the mesh == full-batch single-device grads.

    jax>=0.9 shard_map semantics (pinned here so a version bump can't silently
    change training): an out_spec that drops a mesh axis inserts an implicit
    PSUM over that axis — an explicit psum inside would double-count, and an
    inner pmean gets psummed again (both verified on this version). The correct
    mean-of-grads idiom is therefore local-grad / axis_size + implicit psum."""
    from jax.sharding import PartitionSpec as P

    key = jax.random.PRNGKey(0)
    params = _toy_params(key)
    x = jax.random.normal(key, (16, 12))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 3))

    ref = jax.grad(_loss)(params, x, y)

    mesh = make_mesh()
    assert mesh.devices.size == 8

    def sharded_grad(params, x, y):
        g = jax.grad(_loss)(params, x, y)
        # mean-of-means is exact here because shards are equal-sized
        n = jax.lax.axis_size(DATA_AXIS)
        return jax.tree_util.tree_map(lambda v: v / n, g)

    f = jax.shard_map(
        sharded_grad, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)), out_specs=P(),
    )
    out = jax.jit(f)(params, x, y)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_jit_sharded_batch_grads_match_single_device():
    """The production path (jit + NamedSharding batch, implicit psum) is exact too."""
    from tdal.parallel.mesh import shard_batch

    key = jax.random.PRNGKey(0)
    params = _toy_params(key)
    x = np.asarray(jax.random.normal(key, (16, 12)))
    y = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (16, 3)))

    ref = jax.grad(_loss)(params, jnp.asarray(x), jnp.asarray(y))
    mesh = make_mesh()
    batch = shard_batch({"x": x, "y": y}, mesh)
    out = jax.jit(jax.grad(_loss))(params, batch["x"], batch["y"])
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_detector_train_step_sharded_equivalence():
    """One PointPillars train step: sharded-batch grads == single-device grads."""
    import optax

    from tdal.core.targets import AssignerConfig, assign_centernet_targets
    from tdal.core.voxel import VoxelConfig, pad_points
    from tdal.data.detection import collate_detection
    from tdal.models.detectors import PointPillars
    from tdal.parallel.mesh import shard_batch
    from tdal.pipeline.detector_engine import make_detector_steps
    from tdal.runtime.train_state import TrainState, init_model

    VOX = VoxelConfig((-8, -8, -2, 8, 8, 4.0), (1.0, 1.0, 6.0), 5, 64)
    TASKS = [dict(num_class=1, class_names=["VEHICLE"])]
    det = PointPillars(
        voxel_cfg=VOX, tasks=tuple(TASKS), num_filters=(8,),
        rpn_layer_nums=(1,), rpn_ds_strides=(1,), rpn_ds_filters=(8,),
        rpn_us_strides=(1,), rpn_us_filters=(8,),
    )
    rng = np.random.default_rng(0)
    asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=10)
    items = []
    for i in range(8):
        pts = rng.uniform(-8, 8, (256, 5)).astype(np.float32)
        boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
        t = assign_centernet_targets(
            boxes, np.array([1], np.int32), asg, VOX.grid_size,
            VOX.point_cloud_range, VOX.voxel_size,
        )
        items.append(dict(t, points=pad_points(pts, 512), token=f"t{i}"))
    batch = collate_detection(items)
    batch.pop("token"); batch.pop("gt_boxes_and_cls")
    batch = {
        k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
        for k, vv in batch.items()
    }
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, batch["points"])
    cfg = dict(
        post_center_limit_range=[-10, -10, -10, 10, 10, 10],
        nms=dict(nms_pre_max_size=64, nms_post_max_size=16, nms_iou_threshold=0.7),
        score_threshold=0.1, pc_range=[-8, -8], out_size_factor=1,
        voxel_size=[1.0, 1.0],
    )
    train_step, _ = make_detector_steps(det, cfg, [1.0] * 8, donate=False)

    state = TrainState.create(params, optax.sgd(0.1), bs)
    single, logs_single = train_step(state, batch)

    mesh = make_mesh()
    state2 = TrainState.create(params, optax.sgd(0.1), bs)
    sbatch = shard_batch(batch, mesh)
    sharded, logs_sharded = train_step(state2, sbatch)

    assert float(logs_single["loss"]) == pytest.approx(
        float(logs_sharded["loss"]), rel=1e-4
    )
    ref_leaves = jax.tree_util.tree_leaves(single.params)
    out_leaves = jax.tree_util.tree_leaves(sharded.params)
    # sharded reductions change fp32 accumulation order: tiny per-leaf deltas
    for a, b in zip(ref_leaves, out_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)


_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    coord, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from tdal.parallel.mesh import init_distributed

    init_distributed(coord, n, pid)
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == n * 4, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdal.parallel.mesh import make_mesh

    mesh = make_mesh()  # all 8 global devices
    x = jnp.arange(4.0) + 4.0 * pid  # this process's local shard values

    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(x))
    total = float(np.sum(g))
    assert total == sum(range(8)), total
    print(f"proc {pid}: OK total={total}", flush=True)
    """
)


@pytest.mark.skipif(os.environ.get("TDAL_SKIP_MULTIPROC") == "1",
                    reason="multiprocess smoke disabled")
def test_two_process_distributed_initialize(tmp_path):
    """jax.distributed.initialize over localhost with 2 CPU processes."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK total=28.0" in out

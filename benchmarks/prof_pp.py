"""Component-level profile of the PointPillars train step on the current device.

Usage: python benchmarks/prof_pp.py [fp32|bf16]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tdal.core.targets import AssignerConfig, assign_centernet_targets
from tdal.core.voxel import VoxelConfig, pad_points, voxelize_batch
from tdal.data.detection import collate_detection
from tdal.models.detectors import PointPillars
from tdal.models.readers import scatter_to_bev
from tdal.models.rpn import RPN
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.runtime.train_state import TrainState, init_model
from tdal.utils.flops import cost_analysis
from tdal.utils.timing import chain, timeit_chained

DTYPE = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32
print(f"dtype={DTYPE.__name__} device={jax.devices()[0]}")

VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), dtype=DTYPE)
rng = np.random.default_rng(0)
pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
padded = pad_points(pts, 180000)
boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=500)
t = assign_centernet_targets(
    boxes, np.array([1], np.int32), asg, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size
)
items = [dict(t, points=padded, token=f"t{i}") for i in range(2)]
batch = collate_detection(items)
batch.pop("token"); batch.pop("gt_boxes_and_cls")
batch = {
    k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv))
    for k, vv in batch.items()
}
key = jax.random.PRNGKey(0)
params, bs = init_model(det, {"params": key}, batch["points"])
state = TrainState.create(params, optax.adam(1e-3), bs)
cfg = dict(
    post_center_limit_range=[-80, -80, -10, 80, 80, 10],
    nms=dict(nms_pre_max_size=4096, nms_post_max_size=500, nms_iou_threshold=0.7),
    score_threshold=0.1, pc_range=[-74.88, -74.88], out_size_factor=1,
    voxel_size=[0.32, 0.32],
)
train_step, predict_step = make_detector_steps(det, cfg, [1.0] * 8, donate=False)
variables = {"params": state.params, "batch_stats": state.batch_stats}


def bench(name, fn, carry, *rest, iters=10):
    dt = timeit_chained(fn, carry, *rest, iters=iters, warmup=2)
    print(f"{name:42s} {dt * 1e3:8.2f} ms")
    return dt


# 1. full train step
def tstep(s):
    s2, _ = train_step(s, batch)
    return s2
t0 = time.perf_counter()
s = tstep(state)
from tdal.utils.timing import force_completion
force_completion(s.params)
print(f"train compile+1st: {time.perf_counter() - t0:.1f}s")
def tchain(c):
    s2, _ = train_step(state, batch)
    return chain(c, s2.params["PillarFeatureNet_0"])
bench("train_step (b2)", tchain, jnp.zeros(()))

# 2. forward only (train mode, with BN mutation)
fwd = jax.jit(lambda p: det.apply(variables, p, train=True, mutable=["batch_stats"])[0][0]["hm"])
def fchain(c):
    return chain(c, fwd(batch["points"]))
bench("forward train=True", fchain, jnp.zeros(()))

fwd_eval = jax.jit(lambda p: det.apply(variables, p, train=False)[0]["hm"])
def fechain(c):
    return chain(c, fwd_eval(batch["points"]))
bench("forward train=False", fechain, jnp.zeros(()))

# 3. voxelize alone
vj = jax.jit(lambda p: voxelize_batch(p, VOX))
def vchain(c):
    return chain(c, vj(batch["points"])[3])
bench("voxelize_batch", vchain, jnp.zeros(()))

# 4. scatter alone
voxels, coords, num_points, n_vox = vj(batch["points"])
feats = jax.random.normal(key, (2, 32000, 64), DTYPE)
valid = jnp.arange(32000)[None, :] < n_vox[:, None]
sj = jax.jit(lambda f: scatter_to_bev(f, coords, valid, 468, 468))
def schain(c):
    return chain(c, sj(feats))
bench("scatter_to_bev", schain, jnp.zeros(()))

# 5. RPN alone fwd (random canvas)
canvas = jax.random.normal(key, (2, 468, 468, 64), DTYPE)
rpn = RPN(dtype=DTYPE)
rvars = jax.jit(rpn.init, static_argnums=2)({"params": key}, canvas, False)
rj = jax.jit(lambda cv: rpn.apply(rvars, cv, False))
def rchain(c):
    return chain(c, rj(canvas))
bench("rpn fwd eval", rchain, jnp.zeros(()))

# 6. RPN fwd+bwd with BN train
def rpn_loss(p, cv):
    out, _ = rpn.apply({"params": p, **{k: v for k, v in rvars.items() if k != "params"}},
                       cv, True, mutable=["batch_stats"])
    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
rgj = jax.jit(jax.grad(rpn_loss))
def rgchain(c):
    g = rgj(rvars["params"], canvas)
    return chain(c, g)
bench("rpn grad train", rgchain, jnp.zeros(()))

# 7. cost analysis
costs = cost_analysis(lambda st, b: train_step(st, b)[0].params, state, batch)
f = costs.get("flops", 0.0)
b_ = costs.get("bytes accessed", costs.get("bytes_accessed", 0.0))
print(f"train step: {f/1e12:.3f} TFLOP, {b_/1e9:.2f} GB accessed")
print(f"  -> compute-bound floor @197T bf16: {f/197e12*1e3:.1f} ms")
print(f"  -> bw-bound floor @819GB/s: {b_/819e9*1e3:.1f} ms")
rcosts = cost_analysis(lambda p, cv: rgj(p, cv), rvars["params"], canvas)
print(f"rpn grad: {rcosts.get('flops',0)/1e12:.3f} TFLOP, "
      f"{rcosts.get('bytes accessed', rcosts.get('bytes_accessed',0))/1e9:.2f} GB")

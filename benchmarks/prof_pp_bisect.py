"""Bisect the PointPillars train step cost by truncating the grad program.

Each variant is ONE compiled program (so the ~3.5ms axon dispatch overhead is
constant across rows); differences between rows isolate segment fwd+bwd cost.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tdal.core.targets import AssignerConfig, assign_centernet_targets
from tdal.core.voxel import VoxelConfig, pad_points, voxelize_batch
from tdal.data.detection import collate_detection
from tdal.models.center_head import CenterHead
from tdal.models.detectors import PointPillars
from tdal.models.readers import PillarFeatureNet, scatter_to_bev
from tdal.models.rpn import RPN
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.runtime.train_state import TrainState, init_model
from tdal.utils.timing import chain, timeit_chained

DT = jnp.bfloat16
VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
key = jax.random.PRNGKey(0)


class Truncated(nn.Module):
    depth: str = "canvas"  # canvas | rpn | head

    @nn.compact
    def __call__(self, points, train: bool = True):
        voxels, coords, num_points, n_vox = voxelize_batch(points, VOX)
        feats = PillarFeatureNet(
            num_filters=(64, 64), voxel_size=tuple(VOX.voxel_size),
            pc_range=tuple(VOX.point_cloud_range), dtype=DT,
        )(voxels, num_points, coords, train)
        v = feats.shape[1]
        valid = jnp.arange(v)[None, :] < n_vox[:, None]
        nx, ny, _ = (int(g) for g in VOX.grid_size)
        canvas = scatter_to_bev(feats * valid[..., None], coords, valid, ny, nx)
        if self.depth == "canvas":
            return canvas
        x = RPN(dtype=DT)(canvas, train)
        if self.depth == "rpn":
            return x
        common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)}
        preds = CenterHead(tasks=tuple(TASKS), common_heads=common, dtype=DT)(x, train)
        return preds[0]["hm"]


rng = np.random.default_rng(0)
pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
padded = pad_points(pts, 180000)
points = jnp.stack([jnp.asarray(padded)] * 2)

for depth in ("canvas", "rpn", "head"):
    mod = Truncated(depth)
    vars_ = jax.jit(mod.init, static_argnums=2)({"params": key}, points, False)

    def loss(p, pt):
        out, _ = mod.apply(
            {"params": p, **{k: v for k, v in vars_.items() if k != "params"}},
            pt, True, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9

    gj = jax.jit(jax.grad(loss))
    dt = timeit_chained(lambda z, pp: chain(z, gj(vars_["params"], pp)), jnp.zeros(()), points, iters=10, warmup=2)
    print(f"grad through {depth:7s}: {dt*1e3:8.2f} ms")

    fj = jax.jit(lambda pt: mod.apply(
        {"params": vars_["params"], **{k: v for k, v in vars_.items() if k != "params"}},
        pt, True, mutable=["batch_stats"])[0])
    dt = timeit_chained(lambda z, pp: chain(z, fj(pp)), jnp.zeros(()), points, iters=10, warmup=2)
    print(f"fwd  through {depth:7s}: {dt*1e3:8.2f} ms")

# real train step for reference (loss + optimizer included)
det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), dtype=DT)
boxes = np.array([[1.0, 2.0, 0.2, 1.8, 4.8, 1.5, 0, 0, 0.3]], np.float32)
asg = AssignerConfig(tasks=TASKS, out_size_factor=1, max_objs=500)
t = assign_centernet_targets(boxes, np.array([1], np.int32), asg, VOX.grid_size, VOX.point_cloud_range, VOX.voxel_size)
items = [dict(t, points=padded, token=f"t{i}") for i in range(2)]
batch = collate_detection(items)
batch.pop("token"); batch.pop("gt_boxes_and_cls")
batch = {k: ([jnp.asarray(v) for v in vv] if isinstance(vv, list) else jnp.asarray(vv)) for k, vv in batch.items()}
params, bs = init_model(det, {"params": key}, batch["points"])
state = TrainState.create(params, optax.adam(1e-3), bs)
cfg = dict(post_center_limit_range=[-80, -80, -10, 80, 80, 10],
           nms=dict(nms_pre_max_size=4096, nms_post_max_size=500, nms_iou_threshold=0.7),
           score_threshold=0.1, pc_range=[-74.88, -74.88], out_size_factor=1, voxel_size=[0.32, 0.32])
train_step, _ = make_detector_steps(det, cfg, [1.0] * 8, donate=False)
def tchain(c):
    s2, _ = train_step(state, batch)
    return chain(c, s2.params["PillarFeatureNet_0"])
dt = timeit_chained(tchain, jnp.zeros(()), iters=10, warmup=2)
print(f"full train_step   : {dt*1e3:8.2f} ms")

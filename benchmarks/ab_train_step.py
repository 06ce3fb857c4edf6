"""Minimal PP train-step timer for same-session A/B of code variants.

Times ONLY the jitted train step (median over repeats of 10-step chained
blocks, honest final host fetch), so each variant run costs one compile +
~10 s of steps. Usage: python benchmarks/ab_train_step.py [tag]
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
from tdal.core.voxel import VoxelConfig, pad_points
from tdal.data.detection import collate_detection
from tdal.models.detectors import PointPillars
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.runtime.train_state import TrainState, init_model
from tdal.utils.timing import force_completion, stats_timer

TAG = sys.argv[1] if len(sys.argv) > 1 else "current"

VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
TASKS = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
det = PointPillars(voxel_cfg=VOX, tasks=tuple(TASKS), dtype=jnp.bfloat16)
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
batch.pop("token")
batch.pop("gt_boxes_and_cls")
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
train_step, _ = make_detector_steps(det, cfg, [1.0] * 8, donate=False)

t0 = time.perf_counter()
s = state
for _ in range(2):
    s, _logs = train_step(s, batch)
force_completion(s.params)
print(f"[{TAG}] compile+2: {time.perf_counter() - t0:.1f}s", flush=True)


def block():
    t0 = time.perf_counter()
    s = state
    for _ in range(10):
        s, _l = train_step(s, batch)
    force_completion(s.params)
    return (time.perf_counter() - t0) / 10


st = stats_timer(block, repeats=5)
print(
    f"[{TAG}] train_step b2: median {st['median']*1e3:.2f} ms "
    f"(min {st['min']*1e3:.2f}, max {st['max']*1e3:.2f})",
    flush=True,
)

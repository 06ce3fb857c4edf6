"""Trace the PointPillars train step and print a per-op device-time table.

Captures a jax.profiler trace (perfetto json) of a few train steps and
aggregates device-track slice durations by op name, so the opaque "XLA
fusions" bucket can be attacked op by op.

Usage: python benchmarks/prof_trace.py [n_top]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict
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
from tdal.utils.timing import force_completion

N_TOP = int(sys.argv[1]) if len(sys.argv) > 1 else 40
STEPS = 5

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
train_step, _ = make_detector_steps(det, cfg, [1.0] * 8, donate=False)

s = state
for _ in range(2):
    s, _logs = train_step(s, batch)
force_completion(s.params)

tdir = "/tmp/tdal_trace"
with jax.profiler.trace(tdir):
    s2 = state
    for _ in range(STEPS):
        s2, _logs = train_step(s2, batch)
    force_completion(s2.params)

# newest perfetto trace
paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
assert paths, f"no perfetto trace under {tdir}"
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)

events = tr["traceEvents"]
# device tracks: pid/tid whose thread_name mentions TPU/device XLA Ops
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
        names[(e.get("pid"), e.get("tid"))] = (
            names.get((e.get("pid"), e.get("tid")), "")
            + "/" + str(e.get("args", {}).get("name", ""))
        )

dur = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    label = names.get((e.get("pid"), e.get("tid")), "")
    pidlabel = names.get((e.get("pid"), None), "")
    full = label + pidlabel
    if "TensorFlow Name Scope" in full or "Steps" in full:
        continue
    if not any(k in full for k in ("XLA Ops", "TPU", "Device")):
        continue
    d = float(e.get("dur", 0.0))
    n = e["name"]
    dur[n] += d
    cnt[n] += 1
    total += d

rows = sorted(dur.items(), key=lambda kv: -kv[1])
print(f"device total: {total/1e3/STEPS:.2f} ms/step over {STEPS} steps  (trace {paths[-1]})")
print(f"{'op':70s} {'ms/step':>9s} {'calls':>6s} {'%':>6s}")
for n, d in rows[:N_TOP]:
    print(f"{n[:70]:70s} {d/1e3/STEPS:9.3f} {cnt[n]//STEPS:6d} {100*d/total:6.2f}")

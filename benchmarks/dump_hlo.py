"""Dump the optimized HLO of the PointPillars train step and summarize the
named fusions from prof_trace.py (what ops each hot fusion contains).

Usage: python benchmarks/dump_hlo.py fusion.39 copy_add_fusion.3 ...
"""
import re
import sys
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

txt = train_step.lower(state, batch).compile().as_text()
out = Path("/tmp/train_step_hlo.txt")
out.write_text(txt)
print(f"wrote {out} ({len(txt)/1e6:.1f} MB)")

for name in sys.argv[1:]:
    # computation a fusion calls: find "<name> = ... fusion(...), calls=%fused_x"
    m = re.search(rf"%?{re.escape(name)} = (.*)", txt)
    if not m:
        print(f"\n=== {name}: NOT FOUND")
        continue
    line = m.group(1)
    print(f"\n=== {name}: {line[:400]}")
    cm = re.search(r"calls=%?([\w.\-]+)", line)
    if cm:
        comp = cm.group(1)
        # print the called computation body (op kinds + shapes, compressed)
        block = re.search(
            rf"%?{re.escape(comp)} \([^)]*\) -> .*?\{{(.*?)\n\}}", txt, re.S
        )
        if block:
            kinds = {}
            for ln in block.group(1).splitlines():
                om = re.match(r"\s*%?[\w.\-]+ = (\S+?)\[?.*?\]? (\w+)\(", ln)
                if om:
                    kinds[om.group(2)] = kinds.get(om.group(2), 0) + 1
            print("   ops:", dict(sorted(kinds.items(), key=lambda kv: -kv[1])))
            big = [
                ln.strip()[:220] for ln in block.group(1).splitlines()
                if re.search(r"(dot|conv|scatter|gather|sort|reduce-window)\(", ln)
            ]
            for b in big[:12]:
                print("   |", b)

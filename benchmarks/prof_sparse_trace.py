"""Trace the sparse VoxelNet backbone forward (RUNTIME coords) and attribute
per-op device time to source components via optimized-HLO op_name metadata.

This is the data the down2-dedup / index-build levers need (VERDICT r4 item 7):
the isolated sparse_bisect timings are dispatch-floored (~7-12 ms each over the
axon tunnel), so only an in-graph trace can say how much of the 356 ms forward
is sort, scatter, table build, or conv gathers.

Usage: python benchmarks/prof_sparse_trace.py [n_top]
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_full import GRID, fabricate_voxels

from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.utils.timing import force_completion

N_TOP = int(sys.argv[1]) if len(sys.argv) > 1 else 45
STEPS = 4
DT = jnp.bfloat16

coords, feats, valid, v = fabricate_voxels(180000)
print(f"{v} voxels, grid {GRID}", flush=True)
c = jnp.asarray(coords)[None]
f = jnp.asarray(feats)[None].astype(jnp.float32)
m = jnp.asarray(valid)[None]

model = SparseMiddleBackbone(grid_size=GRID, dtype=DT)
variables = jax.jit(model.init, static_argnums=4)(
    {"params": jax.random.PRNGKey(0)}, f, c, m, False
)
force_completion(variables["params"]["w_in"])

fwd = jax.jit(lambda ff, cc, mm: model.apply(variables, ff, cc, mm, train=False))

# optimized HLO with op_name metadata for attribution
hlo = fwd.lower(f, c, m).compile().as_text()
meta = {}
pat = re.compile(r"%?([\w.\-]+) = .*?metadata={op_name=\"([^\"]+)\"")
for line in hlo.splitlines():
    mm_ = pat.search(line)
    if mm_:
        meta[mm_.group(1)] = mm_.group(2)

out = fwd(f, c, m)
force_completion(out)

tdir = "/tmp/tdal_sparse_trace"
with jax.profiler.trace(tdir):
    o = None
    for _ in range(STEPS):
        o = fwd(f, c, m)
    force_completion(o)

paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
assert paths, f"no perfetto trace under {tdir}"
with gzip.open(paths[-1], "rt") as fh:
    tr = json.load(fh)

events = tr["traceEvents"]
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
        names[(e.get("pid"), e.get("tid"))] = (
            names.get((e.get("pid"), e.get("tid")), "")
            + "/" + str(e.get("args", {}).get("name", ""))
        )

dur = defaultdict(float)
cnt = defaultdict(int)
opdur = defaultdict(float)
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
    n = e["name"]
    if n.startswith("jit_"):
        continue
    d = float(e.get("dur", 0.0))
    total += d
    opdur[n] += d
    cnt[n] += 1
    src = meta.get(n, meta.get(n.split(".")[0], ""))
    if src:
        # bucket by the tail of the op_name path (the jax primitive +
        # enclosing named scope), e.g. ".../sort_voxels/sort"
        parts = [p for p in src.split("/") if not p.startswith("jit(")]
        key = "/".join(parts[-3:])
    else:
        key = f"<{n.split('.')[0]}>"
    dur[key] += d

print(f"device total: {total/1e3/STEPS:.2f} ms/iter over {STEPS} iters (trace {paths[-1]})")
print("---- by source bucket ----")
for k, d in sorted(dur.items(), key=lambda kv: -kv[1])[:N_TOP]:
    print(f"{d/1e3/STEPS:9.3f} ms {100*d/total:6.2f}%  {k[:100]}")
print("---- by raw op ----")
for n, d in sorted(opdur.items(), key=lambda kv: -kv[1])[:N_TOP]:
    src = meta.get(n, meta.get(n.split(".")[0], ""))
    print(f"{d/1e3/STEPS:9.3f} ms {cnt[n]//STEPS:5d}x  {n[:40]:40s} {str(src)[-75:]}")

"""Attribute device-op durations from a saved perfetto trace to model source
using the op_name metadata in a saved optimized-HLO dump.

Usage: python benchmarks/trace_attr.py <trace.json.gz> <hlo.txt> [n_top]
(pure host-side parsing; no TPU needed)
"""
import gzip
import json
import re
import sys
from collections import defaultdict

trace_path, hlo_path = sys.argv[1], sys.argv[2]
N = int(sys.argv[3]) if len(sys.argv) > 3 else 30

# op name -> op_name metadata from the HLO
meta = {}
pat = re.compile(r"%([\w.\-]+) = .*?metadata={op_name=\"([^\"]+)\"")
for line in open(hlo_path):
    m = pat.search(line)
    if m:
        meta[m.group(1)] = m.group(2)

with gzip.open(trace_path, "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
        names[(e.get("pid"), e.get("tid"))] = str(e.get("args", {}).get("name", ""))

STEPS = 5
dur = defaultdict(float)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    lbl = names.get((e.get("pid"), e.get("tid")), "")
    if "XLA Ops" not in lbl:
        continue
    n = e["name"]
    if n.startswith("jit_"):
        continue  # outer program slice double-counts
    d = float(e.get("dur", 0.0))
    total += d
    op = meta.get(n, meta.get(n.split(".")[0], ""))
    # bucket by the model-component segment of the op_name
    if op:
        parts = op.split("/")
        keep = [p for p in parts if p not in ("jit(train_step)",)]
        key = "/".join(keep[:3])
    else:
        key = f"<{n.split('.')[0]}>"
    dur[key] += d

rows = sorted(dur.items(), key=lambda kv: -kv[1])
print(f"device total {total/1e3/STEPS:.2f} ms/step")
for k, d in rows[:N]:
    print(f"{d/1e3/STEPS:8.3f} ms  {100*d/total:5.2f}%  {k}")

"""Debug: localize single-vs-sharded divergence in the sparse VoxelNet step.

Compares (a) forward intermediates via capture_intermediates, (b) per-param
gradients, printing worst relative error per site so the first point of
divergence is visible. CPU 8-device mesh (same as tests/conftest.py).
"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_mesh_production import _batch, _make_voxelnet
from tdal.models.center_head import center_head_loss
from tdal.parallel.mesh import make_mesh, shard_batch
from tdal.runtime.train_state import init_model


def main():
    det = _make_voxelnet()
    batch = _batch(8)
    dbatch = dict(batch)
    dbatch.pop("gt_boxes_and_cls")
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, dbatch["points"])

    def fwd(p, pts):
        preds, st = det.apply(
            {"params": p, "batch_stats": bs}, pts, train=True,
            mutable=["batch_stats", "intermediates"],
            capture_intermediates=True,
        )
        return preds, st

    ffn = jax.jit(fwd)
    preds_s, st_s = ffn(params, dbatch["points"])
    mesh = make_mesh()
    pts_m = shard_batch({"points": dbatch["points"]}, mesh)["points"]
    preds_m, st_m = ffn(params, pts_m)

    flat_s = jax.tree_util.tree_flatten_with_path(st_s["intermediates"])[0]
    flat_m = jax.tree_util.tree_flatten_with_path(st_m["intermediates"])[0]
    print(f"{len(flat_s)} intermediate sites")
    for (pa, a), (pb, b) in zip(flat_s, flat_m):
        assert pa == pb
        a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
        d = np.abs(a - b)
        scale = np.abs(a).max() + 1e-30
        rel = d.max() / scale
        n_bad = int((d > 1e-4 * scale + 1e-7).sum())
        flag = " <-- DIVERGES" if rel > 1e-5 else ""
        print(f"{rel:9.2e} rel  {n_bad:6d} bad/{a.size:8d}  {jax.tree_util.keystr(pa)}{flag}")

    # also batch_stats drift
    print("\n-- batch_stats --")
    fs = jax.tree_util.tree_flatten_with_path(st_s["batch_stats"])[0]
    fm = jax.tree_util.tree_flatten_with_path(st_m["batch_stats"])[0]
    for (pa, a), (pb, b) in zip(fs, fm):
        a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
        print(f"{rel:9.2e}  {jax.tree_util.keystr(pa)}")


if __name__ == "__main__":
    main()

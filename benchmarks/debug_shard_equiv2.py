"""Debug step 2: forward is bit-identical single-vs-sharded, so the divergence
is in the BACKWARD pass. Compare (a) every param gradient, (b) the gradient
arriving at the backbone/head boundary (d loss / d bev_feature)."""
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


def cmp(tag, a, b):
    a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
    d = np.abs(a - b)
    scale = np.abs(a).max() + 1e-30
    rel = d.max() / scale
    n_bad = int((d > 1e-4 * scale + 1e-6).sum())
    flag = " <-- DIVERGES" if n_bad else ""
    print(f"{rel:9.2e} rel  {n_bad:6d} bad/{a.size:9d}  {tag}{flag}")


def main():
    det = _make_voxelnet()
    batch = _batch(8)
    dbatch = dict(batch)
    dbatch.pop("gt_boxes_and_cls")
    key = jax.random.PRNGKey(0)
    params, bs = init_model(det, {"params": key}, dbatch["points"])

    def loss_fn(p, b):
        preds, _ = det.apply(
            {"params": p, "batch_stats": bs}, b["points"], train=True,
            mutable=["batch_stats"],
        )
        total, logs = center_head_loss(preds, b, [1.0] * 8)
        return total, logs

    gfn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l_s, _), g_s = gfn(params, dbatch)
    mesh = make_mesh()
    (l_m, _), g_m = gfn(params, shard_batch(dbatch, mesh))
    print(f"loss single={float(l_s):.9f} mesh={float(l_m):.9f}")
    print("-- param grads --")
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_s)[0],
        jax.tree_util.tree_flatten_with_path(g_m)[0],
    ):
        cmp(jax.tree_util.keystr(pa), a, b)


if __name__ == "__main__":
    main()

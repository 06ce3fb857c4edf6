"""Debug step 4 — the control experiment: single-device grads with a PERMUTED
batch vs the original order. Mathematically identical gradients (loss is a
mean over examples; BN stats are permutation-invariant); any difference is
pure reduction-reassociation noise. If its magnitude matches the sharded-vs-
single divergence, the red test is measuring amplified float noise, not a
sharding bug."""
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


def maxrel(a, b):
    a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-30)


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
    (l0, _), g0 = gfn(params, dbatch)

    perm = np.array([3, 1, 4, 0, 7, 5, 2, 6])
    pbatch = {
        k: ([v[perm] for v in vv] if isinstance(vv, list) else vv[perm])
        for k, vv in dbatch.items()
    }
    (lp, _), gp = gfn(params, pbatch)

    mesh = make_mesh()
    (lm, _), gm = gfn(params, shard_batch(dbatch, mesh))

    print(f"loss orig={float(l0):.9f} perm={float(lp):.9f} mesh={float(lm):.9f}")
    print(f"{'param':55s} {'perm-vs-orig':>12s} {'mesh-vs-orig':>12s}")
    rows = []
    for (pa, a), (_, b), (_, c) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
        jax.tree_util.tree_flatten_with_path(gm)[0],
    ):
        rp, rm = maxrel(a, b), maxrel(a, c)
        rows.append((max(rp, rm), jax.tree_util.keystr(pa), rp, rm))
    for _, name, rp, rm in sorted(rows, reverse=True)[:25]:
        print(f"{name:55s} {rp:12.2e} {rm:12.2e}")
    rps = np.array([r[2] for r in rows]); rms = np.array([r[3] for r in rows])
    print(f"\nmedian perm-noise {np.median(rps):.2e}   median mesh-diff {np.median(rms):.2e}")
    print(f"max    perm-noise {rps.max():.2e}   max    mesh-diff {rms.max():.2e}")


if __name__ == "__main__":
    main()

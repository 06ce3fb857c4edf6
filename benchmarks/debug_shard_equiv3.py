"""Debug step 3: cut the graph. Compare single-vs-sharded gradients of
(a) d loss / d bev (backbone output), holding the backbone fixed;
(b) backbone param grads given a FIXED upstream cotangent on bev.
Also repeat with blocks_per_stage=1 to see whether ca14d4c introduced the
mechanism or amplified it."""
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

from test_mesh_production import _batch, VOX
from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.core.voxel import voxelize_batch
from tdal.models.readers import VoxelMeanEncoder
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


def run(bps):
    print(f"===== blocks_per_stage={bps} =====")
    batch = _batch(8)
    pts = batch["points"]
    nx, ny, nz = (int(g) for g in VOX.grid_size)

    mod = SparseMiddleBackbone(grid_size=(nz, ny, nx), blocks_per_stage=bps)

    enc = VoxelMeanEncoder()

    def prep(points):
        voxels, coords, num_points, n_vox = voxelize_batch(points, VOX)
        feats = enc.apply({}, voxels, num_points)
        v = feats.shape[1]
        valid = jnp.arange(v)[None, :] < n_vox[:, None]
        return feats * valid[..., None], coords, valid

    feats, coords, valid = jax.jit(prep)(pts)
    key = jax.random.PRNGKey(0)
    vs = jax.jit(mod.init, static_argnames="train")(
        {"params": key}, feats, coords, valid, train=True
    )
    params, bs = vs["params"], vs.get("batch_stats", {})

    # fixed synthetic cotangent on the BEV output
    def fwd(p, f, c, m):
        bev, _ = mod.apply(
            {"params": p, "batch_stats": bs}, f, c, m, True,
            mutable=["batch_stats"],
        )
        return bev

    bev0 = jax.jit(fwd)(params, feats, coords, valid)
    ct = jax.random.normal(jax.random.PRNGKey(1), bev0.shape, bev0.dtype)

    def scalar(p, f, c, m):
        return jnp.vdot(fwd(p, f, c, m), ct)

    gfn = jax.jit(jax.grad(scalar))
    g_s = gfn(params, feats, coords, valid)
    mesh = make_mesh()
    sb = shard_batch({"f": feats, "c": coords, "m": valid}, mesh)
    g_m = gfn(params, sb["f"], sb["c"], sb["m"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_s)[0],
        jax.tree_util.tree_flatten_with_path(g_m)[0],
    ):
        cmp(jax.tree_util.keystr(pa), a, b)

    # also: check bev forward equality
    bev_m = jax.jit(fwd)(params, sb["f"], sb["c"], sb["m"])
    cmp("bev forward", bev0, bev_m)


if __name__ == "__main__":
    run(2)
    run(1)

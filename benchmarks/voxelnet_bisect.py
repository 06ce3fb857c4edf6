"""Bisect the production VoxelNet first stage at b2: voxelize / backbone / RPN+head.

Times each phase of the detector forward separately (runtime inputs, b2) to
localize the two-stage predict frame time. Usage:
    python benchmarks/voxelnet_bisect.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.voxel import pad_points, voxelize_batch
from tdal.models.builder import build_detector, build_voxel_config

from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.runtime.config import Config
from tdal.utils.timing import chain, force_completion, timeit_chained

CFG = "configs/waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_sweep_two_stage_bev_5point_ft_6epoch_freeze_with_vel.py"


def bench(name, fn, *args, iters=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    force_completion(out)

    def body(c, *a):
        return chain(c, jfn(*a))

    dt = timeit_chained(body, jnp.zeros(()), *args, iters=iters, warmup=1)
    print(f"{name}: {dt*1e3:.1f} ms (b2)", flush=True)
    return out


def main():
    cfg = Config.fromfile(CFG)
    voxel_cfg = build_voxel_config(cfg.voxel_generator, train=False)
    print("voxel cfg:", voxel_cfg.grid_size, "max_voxels", voxel_cfg.max_voxels, flush=True)
    first_cfg = cfg.model["first_stage_cfg"]
    detector = build_detector(first_cfg, voxel_cfg)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-74, 74, (160000, 5)).astype(np.float32)
    padded = pad_points(pts, 180000)
    batch_points = jnp.asarray(np.stack([padded, padded]))
    key = jax.random.PRNGKey(0)
    from tdal.runtime.train_state import init_model

    params, bs = init_model(detector, {"params": key}, batch_points)
    force_completion(jax.tree_util.tree_leaves(params)[0])
    variables = {"params": params, "batch_stats": bs}

    # phase A: voxelize + mean encode
    def vox(points):
        voxels, coords, num_points, n_vox = voxelize_batch(points, detector.voxel_cfg)
        p = voxels.shape[-2]
        pm = (jnp.arange(p)[None, None, :] < num_points[..., None]).astype(voxels.dtype)
        feats = (voxels * pm[..., None]).sum(axis=-2) / jnp.maximum(
            num_points, 1
        ).astype(voxels.dtype)[..., None]
        v = feats.shape[1]
        valid = jnp.arange(v)[None, :] < n_vox[:, None]
        return feats * valid[..., None], coords, valid

    feats, coords, valid = bench("voxelize+encode", vox, batch_points)
    print("voxel buffer:", feats.shape, flush=True)

    # phase B: backbone at b2 (runtime inputs, same dtype as detector).
    # VoxelConfig.grid_size is (nx, ny, nz); backbone wants (nz, ny, nx).
    nx, ny, nz = (int(g) for g in detector.voxel_cfg.grid_size)
    gs = (nz, ny, nx)
    backbone = SparseMiddleBackbone(grid_size=gs, dtype=detector.dtype)
    bparams = jax.jit(backbone.init, static_argnums=4)(
        {"params": key}, feats, coords, valid, False
    )
    force_completion(bparams["params"]["w_in"])
    bev = bench(
        "backbone b2 (runtime coords)",
        lambda f, c, m: backbone.apply(bparams, f, c, m, train=False),
        feats, coords, valid,
    )
    print("bev:", bev.shape, flush=True)

    # phase C: full detector forward for reference
    bench(
        "detector.apply b2",
        lambda p: detector.apply(variables, p, train=False),
        batch_points,
    )


if __name__ == "__main__":
    main()

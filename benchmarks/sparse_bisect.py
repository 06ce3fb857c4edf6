"""Bisect the sparse VoxelNet backbone at the full Waymo grid with RUNTIME coords.

The isolated backbone bench (voxelnet_full.py / bench.measure_voxelnet_full_grid)
closes coords/valid over the jit as CONSTANTS, which lets XLA constant-fold the
bitmap-table builds and neighbor lookups out of the timed graph. Inside the real
detector those run per frame. This script times every piece with coords passed as
runtime arguments, to localize the in-graph cost.

Usage: python benchmarks/sparse_bisect.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_full import GRID, fabricate_voxels

from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.ops.sparse_conv import (
    build_bitmap_table,
    down2_grid,
    sort_voxels,
    sparse_conv3d_down2,
    subm_conv3d,
    subm_neighbors,
)
from tdal.utils.timing import chain, force_completion, timeit_chained

DT = jnp.bfloat16


def bench(name, fn, *args, iters=4):
    jfn = jax.jit(fn)
    out = jfn(*args)
    force_completion(out)

    def body(c, *a):
        return chain(c, jfn(*a))

    dt = timeit_chained(body, jnp.zeros(()), *args, iters=iters, warmup=1)
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    coords, feats, valid, v = fabricate_voxels(180000)
    print(f"{v} voxels, grid {GRID}", flush=True)
    c = jnp.asarray(coords)
    f = jnp.asarray(feats).astype(DT)
    m = jnp.asarray(valid)

    # 1. sort
    cs, fs, ms, ks = bench("sort_voxels", lambda a, b, d: sort_voxels(a, b, d, GRID), c, f, m)

    # 2. bitmap table build at full grid (the per-level scatter+cumsum)
    table = bench("build_bitmap_table L0", lambda k, mm: build_bitmap_table(k, mm, GRID), ks, ms)

    # 3. neighbor lookup with the table as runtime arg
    nbrs = bench(
        "subm_neighbors L0", lambda a, mm, k, t: subm_neighbors(a, mm, k, GRID, table=t),
        cs, ms, ks, table,
    )

    # 4. one submanifold conv C=16 with precomputed runtime neighbors
    w = jnp.asarray(np.random.default_rng(0).normal(size=(27, 5, 16)) * 0.1, DT)
    bench(
        "subm_conv3d C5->16 (nbrs given)",
        lambda a, ff, mm, k, nb: subm_conv3d(a, ff, mm, k, GRID, w, neighbors=nb),
        cs, fs, ms, ks, nbrs,
    )

    # 5. strided downsample conv (includes downsample_sites)
    w2 = jnp.asarray(np.random.default_rng(1).normal(size=(27, 16, 32)) * 0.1, DT)
    f16 = jnp.concatenate([fs] * 4, axis=-1)[:, :16].astype(DT) * ms[:, None]
    bench(
        "sparse_conv3d_down2 16->32",
        lambda a, ff, mm, k, t: sparse_conv3d_down2(a, ff, mm, k, GRID, w2, 90000, table=t),
        cs, f16, ms, ks, table,
    )

    # level-1 table (smaller grid)
    g1 = down2_grid(GRID)
    cs1, f1, m1, k1 = jax.jit(
        lambda a, ff, mm, k, t: sparse_conv3d_down2(a, ff, mm, k, GRID, w2, 90000, table=t)
    )(cs, f16, ms, ks, table)
    bench("build_bitmap_table L1", lambda k, mm: build_bitmap_table(k, mm, g1), k1, m1)

    # 5b. elementwise passes (the round-3 "BN/residual" bucket): masked BN
    # affine + relu and a residual add at the L0 shape
    sc = jnp.ones((16,), jnp.float32)
    bi = jnp.zeros((16,), jnp.float32)
    bench(
        "bn_relu_mask L0 (178k x 16)",
        lambda ff, mm: jax.nn.relu(ff * sc.astype(DT) + bi.astype(DT)) * mm[:, None],
        f16, ms,
    )
    bench("residual_add L0", lambda a, b2_: a + b2_, f16, f16)

    # 5c. final-level ops at their real shapes: (3,188,188) grid, 128ch
    from tdal.ops.sparse_conv import scatter_dense_bev

    gf = (3, 188, 188)
    vf = 24000
    rngf = np.random.default_rng(2)
    linf = np.sort(rngf.choice(gf[0] * gf[1] * gf[2], vf, replace=False))
    cf = np.stack(
        [linf // (gf[1] * gf[2]), (linf // gf[2]) % gf[1], linf % gf[2]], 1
    ).astype(np.int32)
    ff128 = jnp.asarray(rngf.normal(size=(vf, 128)), DT)
    cf = jnp.asarray(cf)
    mf = jnp.ones((vf,), bool)
    bench(
        "scatter_dense_bev final (24k x 128 -> 188^2 x 384)",
        lambda a, ff, mm: scatter_dense_bev(a, ff, mm, gf),
        cf, ff128, mf,
    )

    # 5d. subm conv cost at each level's (V, C) with precomputed neighbors
    for lvl, (vv, cc_, gg) in enumerate(
        [(90000, 32, down2_grid(GRID)),
         (45000, 64, down2_grid(down2_grid(GRID))),
         (24000, 128, down2_grid(down2_grid(down2_grid(GRID))))], start=1
    ):
        rngl = np.random.default_rng(10 + lvl)
        linl = np.sort(rngl.choice(gg[0] * gg[1] * gg[2], vv, replace=False))
        cl = np.stack(
            [linl // (gg[1] * gg[2]), (linl // gg[2]) % gg[1], linl % gg[2]], 1
        ).astype(np.int32)
        cl = jnp.asarray(cl)
        ml = jnp.ones((vv,), bool)
        kl = jnp.asarray(linl.astype(np.int32))
        tl = jax.jit(lambda k, mm: build_bitmap_table(k, mm, gg))(kl, ml)
        nl = jax.jit(lambda a, mm, k, t: subm_neighbors(a, mm, k, gg, table=t))(
            cl, ml, kl, tl
        )
        fl = jnp.asarray(rngl.normal(size=(vv, cc_)), DT)
        wl = jnp.asarray(rngl.normal(size=(27, cc_, cc_)) * 0.1, DT)
        bench(
            f"subm_conv3d L{lvl} ({vv} x {cc_})",
            lambda a, ff, mm, k, nb, _w=wl, _g=gg: subm_conv3d(
                a, ff, mm, k, _g, _w, neighbors=nb
            ),
            cl, fl, ml, kl, nl,
        )

    # 6. whole backbone, coords as RUNTIME args (matches detector) vs constants
    model = SparseMiddleBackbone(grid_size=GRID, dtype=DT)
    fb, cb, vb = f[None].astype(jnp.float32), c[None], m[None]
    variables = jax.jit(model.init, static_argnums=4)(
        {"params": jax.random.PRNGKey(0)}, fb, cb, vb, False
    )
    force_completion(variables["params"]["w_in"])
    bench(
        "backbone fwd (runtime coords)",
        lambda ff, aa, mm: model.apply(variables, ff, aa, mm, train=False),
        fb, cb, vb, iters=3,
    )
    bench(
        "backbone fwd (const coords)",
        lambda ff: model.apply(variables, ff, cb, vb, train=False),
        fb, iters=3,
    )


if __name__ == "__main__":
    main()

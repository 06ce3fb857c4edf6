"""A/B the fused single-gather contraction vs per-tap gathers, per level.

Hypothesis (VERDICT r4 item 7): L2/L3 subm convs run at 37%/24% of the
512B-tile wall because at 24-45k voxels the 27 per-tap gathers are
DISPATCH-bound (fixed per-kernel cost), not bandwidth-bound — so one
interleaved (V*27) gather + one (V, 27C) x (27C, Cout) MXU matmul should win
there while losing at L0's 178k rows (where the interleaved gather measured
1.5x slower in round 3).

Times fwd and fwd+bwd per level with both modes in one process (toggling
sparse_conv._FUSED_MAX_V between fresh jits), checks numerical parity, then
times the whole backbone at candidate thresholds.

Usage: python benchmarks/fused_gather_ab.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_full import GRID, fabricate_voxels

import tdal.ops.sparse_conv as sc
from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.utils.timing import chain, force_completion, timeit_chained

DT = jnp.bfloat16


def bench(name, fn, *args, iters=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    force_completion(out)

    def body(c, *a):
        return chain(c, jfn(*a))

    dt = timeit_chained(body, jnp.zeros(()), *args, iters=iters, warmup=1)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return out


def level_data(vv, cc, gg, seed):
    rng = np.random.default_rng(seed)
    lin = np.sort(rng.choice(gg[0] * gg[1] * gg[2], vv, replace=False))
    cl = jnp.asarray(
        np.stack([lin // (gg[1] * gg[2]), (lin // gg[2]) % gg[1], lin % gg[2]], 1
                 ).astype(np.int32))
    ml = jnp.ones((vv,), bool)
    kl = jnp.asarray(lin.astype(np.int32))
    tl = jax.jit(lambda k, m: sc.build_bitmap_table(k, m, gg))(kl, ml)
    nb = jax.jit(lambda a, m, k, t: sc.subm_neighbors(a, m, k, gg, table=t))(
        cl, ml, kl, tl)
    fl = jnp.asarray(rng.normal(size=(vv, cc)), DT)
    wl = jnp.asarray(rng.normal(size=(27, cc, cc)) * 0.1, DT)
    return cl, fl, ml, kl, nb, wl, gg


def main():
    g1 = sc.down2_grid(GRID)
    g2 = sc.down2_grid(g1)
    g3 = sc.down2_grid(g2)
    levels = [
        ("L0", 178000, 16, GRID, 7),
        ("L1", 90000, 32, g1, 11),
        ("L2", 45000, 64, g2, 12),
        ("L3", 24000, 128, g3, 13),
    ]
    for name, vv, cc, gg, seed in levels:
        cl, fl, ml, kl, nb, wl, gg = level_data(vv, cc, gg, seed)

        def fwd(a, ff, mm, k, n, _w=wl, _g=gg):
            return sc.subm_conv3d(a, ff, mm, k, _g, _w, neighbors=n)

        def train(a, ff, mm, k, n, _w=wl, _g=gg):
            def loss(w_, f_):
                o = sc.subm_conv3d(a, f_, mm, k, _g, w_, neighbors=n)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            gw, gf = jax.grad(loss, argnums=(0, 1))(_w, ff)
            return jnp.sum(gw.astype(jnp.float32)) + jnp.sum(gf.astype(jnp.float32))

        outs = {}
        for mode, maxv in (("pertap", 0), ("fused", 10**9)):
            sc._FUSED_MAX_V = maxv
            outs[mode] = bench(f"{name} {vv}x{cc} fwd  [{mode}]", fwd, cl, fl, ml, kl, nb)
            bench(f"{name} {vv}x{cc} train[{mode}]", train, cl, fl, ml, kl, nb)
        d = float(jnp.max(jnp.abs(outs["pertap"].astype(jnp.float32)
                                  - outs["fused"].astype(jnp.float32))))
        print(f"{name} parity max|diff| = {d:.3e}", flush=True)

    # whole backbone at candidate thresholds
    coords, feats, valid, v = fabricate_voxels(180000)
    fb = jnp.asarray(feats)[None].astype(jnp.float32)
    cb = jnp.asarray(coords)[None]
    vb = jnp.asarray(valid)[None]
    model = SparseMiddleBackbone(grid_size=GRID, dtype=DT)
    variables = jax.jit(model.init, static_argnums=4)(
        {"params": jax.random.PRNGKey(0)}, fb, cb, vb, False)
    force_completion(variables["params"]["w_in"])
    for maxv in (0, 50000, 100000):
        sc._FUSED_MAX_V = maxv
        bench(
            f"backbone fwd runtime-coords [max_v={maxv}]",
            lambda ff, aa, mm: model.apply(variables, ff, aa, mm, train=False),
            fb, cb, vb, iters=3,
        )


if __name__ == "__main__":
    main()

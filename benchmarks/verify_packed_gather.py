"""Hardware verify of the packed consecutive-slot row gather (round 5).

Asserts on the REAL device (CLAUDE.md rule: parity-test kernel-path changes on
hardware, not just their CPU fallbacks) that the sparse VoxelNet backbone
produces the same forward activations and the same train-step gradients with
TDAL_PACKED_GATHER on vs off, then prints the timing delta.

The decisive gradient check runs the backbone in FLOAT32: a wrong packed-row
fetch would produce O(1) errors in any dtype, while fusion-layout rounding
noise collapses to ~1e-6 in f32 (C=128 f32 rows exceed the 512B gate, so the
f32 run exercises the packed path on L0-L2 and the fallback on L3 — both
routes in one program). The bf16 production config is checked too, against a
loose bound: packed-vs-unpacked compile to different fusion layouts, so
intermediate f32->bf16 rounding points differ and deep-chain grads wobble at
the ~1e-2 level (measured 1.3e-2 worst-leaf on hardware; same mechanism as
the r4 sharded-equivalence noise, benchmarks/RESULTS.md round-5 note).

Usage: python benchmarks/verify_packed_gather.py  [--small]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SMALL = "--small" in sys.argv
if SMALL:
    sys.argv.remove("--small")  # voxelnet_full parses sys.argv at import time

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_full import GRID, fabricate_voxels

import tdal.ops.sparse_conv as sc
from tdal.models.scn_sparse import SparseMiddleBackbone
from tdal.utils.timing import chain, force_completion, timeit_chained

N_VOX = 20000 if SMALL else 180000
GRID_ = (11, 376, 376) if SMALL else GRID


def run_pair(dtype, fb, cb, vb, time_it=False):
    """Forward outputs + grads with packed on/off for one dtype."""
    model = SparseMiddleBackbone(grid_size=GRID_, dtype=dtype)
    variables = jax.jit(model.init, static_argnums=4)(
        {"params": jax.random.PRNGKey(0)}, fb, cb, vb, False
    )
    force_completion(variables["params"]["w_in"])

    def loss_fn(params, f, c, m):
        out = model.apply({**variables, "params": params}, f, c, m, train=False)
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    outs, grads, times = {}, {}, {}
    for flag in (True, False):
        sc._PACKED_GATHER = flag  # trace-time switch; fresh jits below re-trace
        fwd = jax.jit(lambda f, c, m: model.apply(variables, f, c, m, train=False))
        gfn = jax.jit(jax.grad(loss_fn))
        outs[flag] = np.asarray(fwd(fb, cb, vb), np.float32)
        grads[flag] = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), gfn(variables["params"], fb, cb, vb)
        )
        if time_it:
            times[flag] = timeit_chained(
                lambda c_, f, co, m: chain(c_, fwd(f, co, m)),
                jnp.zeros(()), fb, cb, vb, iters=3, warmup=1,
            )
    sc._PACKED_GATHER = True
    return outs, grads, times


def compare(outs, grads, tag):
    d = np.abs(outs[True] - outs[False]).max()
    scale = np.abs(outs[False]).max()
    print(f"[{tag}] fwd max|packed-unpacked| = {d:.3e}  (scale {scale:.3e})", flush=True)
    leaves_t = jax.tree_util.tree_leaves_with_path(grads[True])
    leaves_f = dict(jax.tree_util.tree_leaves_with_path(grads[False]))
    worst = 0.0
    for path, gt in leaves_t:
        gf = leaves_f[path]
        rel = np.abs(gt - gf).max() / (np.abs(gf).max() + 1e-12)
        worst = max(worst, rel)
    print(f"[{tag}] grad worst per-leaf rel diff = {worst:.3e}", flush=True)
    return d, scale, worst


def main():
    coords, feats, valid, v = fabricate_voxels(N_VOX) if not SMALL else _small()
    print(f"{v} voxels, grid {GRID_}, device {jax.devices()[0]}", flush=True)
    fb = jnp.asarray(feats)[None].astype(jnp.float32)
    cb = jnp.asarray(coords)[None]
    vb = jnp.asarray(valid)[None]

    # f32: the correctness gate. Wrong fetches would be O(1); tolerances tight.
    outs, grads, _ = run_pair(jnp.float32, fb, cb, vb)
    d, scale, worst = compare(outs, grads, "f32")
    assert d <= 1e-5 * max(scale, 1.0) + 1e-6, "packed fwd diverges on hardware (f32)"
    assert worst < 1e-4, "packed grads diverge on hardware (f32) — real fetch bug"

    # bf16: the production dtype. Different fusion layouts move the f32->bf16
    # rounding points, so deep-chain grads wobble ~1e-2 (noise, bounded loosely).
    outs, grads, times = run_pair(jnp.bfloat16, fb, cb, vb, time_it=True)
    d, scale, worst = compare(outs, grads, "bf16")
    assert d <= 1e-2 * max(scale, 1.0), "packed bf16 fwd diverges beyond rounding"
    assert worst < 5e-2, "packed bf16 grads diverge beyond the measured noise band"
    print(
        f"fwd bf16 packed {times[True]*1e3:.1f} ms vs unpacked {times[False]*1e3:.1f} ms",
        flush=True,
    )
    print("PACKED GATHER HARDWARE VERIFY: PASS", flush=True)


def _small():
    rng = np.random.default_rng(0)
    g = GRID_
    lin = np.sort(rng.choice(g[0] * g[1] * g[2], N_VOX, replace=False))
    c = np.stack([lin // (g[1] * g[2]), (lin // g[2]) % g[1], lin % g[2]], 1)
    f = rng.normal(size=(N_VOX, 5)).astype(np.float32)
    m = np.ones((N_VOX,), bool)
    return c.astype(np.int32), f, m, N_VOX


if __name__ == "__main__":
    main()

"""Voxelize optimization variants. Usage: python benchmarks/prof_voxel2.py"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.utils.timing import chain, timeit_chained

N, V, P, D = 180000, 32000, 20, 5
key = jax.random.PRNGKey(0)
cell = jax.random.randint(key, (2, N), 0, 219024, jnp.int32)
pts = jnp.asarray(np.random.default_rng(0).uniform(-74, 74, (2, N, D)).astype(np.float32))
start = jnp.sort(jax.random.randint(key, (2, V), 0, N - P, jnp.int32), axis=1)
npts = jax.random.randint(key, (2, V), 0, P + 1, jnp.int32)
z = jnp.zeros(())


def bench(name, fj, carry, *rest, iters=20):
    dt = timeit_chained(lambda c, *r: chain(c, fj(*r)), carry, *rest, iters=iters, warmup=2)
    print(f"{name:52s} {dt * 1e3:8.2f} ms")


# A: buffer fill via vmap(dynamic_slice) — contiguous (P, D) slabs
def fill_slab(p2, st2):
    def one(p, st):
        return jax.vmap(lambda s: jax.lax.dynamic_slice(p, (s, 0), (P, D)))(st)
    return jax.vmap(one)(p2, st2)


bench("A: fill via vmap dynamic_slice (B,V,P,D)", jax.jit(fill_slab), z, pts, start)

# A2: same but with the validity mask applied
def fill_slab_masked(p2, st2, np2):
    vox = fill_slab(p2, st2)
    m = jnp.arange(P)[None, None, :] < np2[..., None]
    return jnp.where(m[..., None], vox, 0.0)


bench("A2: slab fill + mask", jax.jit(fill_slab_masked), z, pts, start, npts)

# C: sort carrying full payload vs argsort+gather
def sort_payload(c2, p2):
    def one(c, p):
        ops = (c,) + tuple(p[:, i] for i in range(D))
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return jnp.stack(out[1:], axis=-1)
    return jax.vmap(one)(c2, p2)


bench("C: sort carrying 5xf32 payload", jax.jit(sort_payload), z, cell, pts)


def argsort_gather(c2, p2):
    def one(c, p):
        o = jnp.argsort(c, stable=True)
        return p[o]
    return jax.vmap(one)(c2, p2)


bench("C2: argsort + row gather (current)", jax.jit(argsort_gather), z, cell, pts)

# C3: flat sort (batch folded into key) carrying payload
def flat_sort_payload(c2, p2):
    big = 219025
    k = (c2 + big * jnp.arange(2, dtype=jnp.int32)[:, None]).reshape(-1)
    p = p2.reshape(-1, D)
    ops = (k,) + tuple(p[:, i] for i in range(D))
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(out[1:], axis=-1).reshape(2, N, D)


bench("C3: flat sort 360k w/ payload", jax.jit(flat_sort_payload), z, cell, pts)

# D: start-position alternatives
pos = jnp.arange(N, dtype=jnp.int32)
slots = jax.random.randint(key, (2, N), 0, V + 1, jnp.int32)
bench("D0: scatter starts (current)", jax.jit(lambda s: jax.vmap(lambda sl: jnp.zeros((V + 1,), jnp.int32).at[sl].set(pos, mode="drop"))(s)[:, :V]), z, slots)

vox_id = jnp.sort(jax.random.randint(key, (2, N), 0, V, jnp.int32), axis=1)
bench("D1: searchsorted starts", jax.jit(lambda vi: jax.vmap(lambda v: jnp.searchsorted(v, jnp.arange(V, dtype=jnp.int32)))(vi)), z, vox_id)

# E: one-hot matmul segment-sum for per-voxel xyz mean? V too big; skip.

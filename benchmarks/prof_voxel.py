"""Voxelize internals profile. Usage: python benchmarks/prof_voxel.py"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.voxel import VoxelConfig, pad_points, voxelize_batch
from tdal.utils.timing import chain, timeit_chained

N = 180000
V, P = 32000, 20
key = jax.random.PRNGKey(0)
cell = jax.random.randint(key, (2, N), 0, 219024, jnp.int32)
pts = jnp.asarray(np.random.default_rng(0).uniform(-74, 74, (2, N, 5)).astype(np.float32))


def bench(name, fj, carry, *rest, iters=20):
    dt = timeit_chained(lambda c, *r: chain(c, fj(*r)), carry, *rest, iters=iters, warmup=2)
    print(f"{name:44s} {dt * 1e3:8.2f} ms")


z = jnp.zeros(())
bench("argsort 180k int32 (vmap b2)", jax.jit(lambda c: jax.vmap(lambda x: jnp.argsort(x, stable=True))(c)), z, cell)
bench("argsort 360k int32 (flat)", jax.jit(lambda c: jnp.argsort(c.reshape(-1), stable=True)), z, cell)
order = jax.vmap(lambda x: jnp.argsort(x, stable=True))(cell)
bench("gather pts by order (b2)", jax.jit(lambda o, p: jnp.take_along_axis(p, o[..., None], axis=1)), z, order, pts)

start = jax.random.randint(key, (2, V), 0, N - P, jnp.int32)
npts = jax.random.randint(key, (2, V), 0, P + 1, jnp.int32)


def buffer_fill(st, np_, p):
    src = st[..., None] + jnp.arange(P)[None, None, :]
    in_voxel = jnp.arange(P)[None, None, :] < np_[..., None]
    src = jnp.clip(src, 0, N - 1)
    vox = jnp.where(
        in_voxel[..., None],
        jnp.take_along_axis(p[:, :, None, :], src[..., None].repeat(5, -1).reshape(2, -1, 1, 5), axis=1).reshape(2, V, P, 5),
        0.0,
    )
    return vox


def buffer_fill2(st, np_, p):
    src = jnp.clip(st[..., None] + jnp.arange(P)[None, None, :], 0, N - 1)  # (B,V,P)
    vox = jax.vmap(lambda pp, ss: pp[ss])(p, src)  # (B,V,P,5)
    in_voxel = jnp.arange(P)[None, None, :] < np_[..., None]
    return jnp.where(in_voxel[..., None], vox, 0.0)


bench("buffer fill gather (B,V,P,5)", jax.jit(buffer_fill2), z, start, npts, pts)

VOX = VoxelConfig((-74.88, -74.88, -2, 74.88, 74.88, 4.0), (0.32, 0.32, 6.0), 20, 32000)
padded = jnp.stack([jnp.asarray(pad_points(np.random.default_rng(i).uniform(-74, 74, (160000, 5)).astype(np.float32), N)) for i in range(2)])
bench("voxelize_batch b2 (current)", jax.jit(lambda p: voxelize_batch(p, VOX)[0]), z, padded, iters=10)

# scatter of per-voxel starts
pos = jnp.arange(N, dtype=jnp.int32)
slots = jax.random.randint(key, (2, N), 0, V + 1, jnp.int32)
bench("start scatter (b2, 180k->32k)", jax.jit(lambda s: jax.vmap(lambda sl: jnp.zeros((V + 1,), jnp.int32).at[sl].set(pos, mode="drop"))(s)[:, :V]), z, slots)

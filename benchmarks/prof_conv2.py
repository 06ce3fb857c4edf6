"""Conv formulation shoot-out at the RPN stage-1 shape (468x468x64->64).

XLA's native conv vs a 9-shifted-matmul formulation (one (BHW, 9C) x (9C, C)
contraction per conv, MXU-friendly K=576).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.utils.timing import chain, timeit_chained

key = jax.random.PRNGKey(0)
DT = jnp.bfloat16
B, H, C = 2, 468, 64
x = jax.random.normal(key, (B, H, H, C), DT)
w = jax.random.normal(key, (3, 3, C, C), DT)
FL = 2 * B * H * H * 9 * C * C


def report(name, dt, flops=FL):
    print(f"{name:44s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def shift_mm(x, w):
    """sum_k shifted(x) @ w_k with fp32 accumulation."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, H, C))
            t = jax.lax.dot_general(
                xs.reshape(-1, C), w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(B, H, H, C).astype(DT)


def im2col_mm(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate([
        jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, H, C))
        for dy in range(3) for dx in range(3)], axis=-1)
    y = jax.lax.dot_general(
        cols.reshape(-1, 9 * C), w.reshape(9 * C, C), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.reshape(B, H, H, C).astype(DT)


fj = jax.jit(xla_conv)
report("xla conv fwd", timeit_chained(lambda z, xx: chain(z, fj(xx, w)), jnp.zeros(()), x, iters=20, warmup=3))
fj2 = jax.jit(shift_mm)
report("9-shift matmul fwd", timeit_chained(lambda z, xx: chain(z, fj2(xx, w)), jnp.zeros(()), x, iters=20, warmup=3))
fj3 = jax.jit(im2col_mm)
report("im2col matmul fwd", timeit_chained(lambda z, xx: chain(z, fj3(xx, w)), jnp.zeros(()), x, iters=20, warmup=3))

# sanity: same math
np.testing.assert_allclose(np.asarray(fj(x, w), np.float32), np.asarray(fj2(x, w), np.float32), rtol=0.1, atol=0.5)

for name, f in (("xla conv", xla_conv), ("9-shift matmul", shift_mm)):
    def loss(w, xx, f=f):
        return jnp.sum(f(xx, w).astype(jnp.float32) ** 2) * 1e-9
    gj = jax.jit(jax.grad(loss))
    report(f"{name} grad", timeit_chained(lambda z, xx: chain(z, gj(w, xx)), jnp.zeros(()), x, iters=10, warmup=2), flops=3 * FL)

# pure matmul reference point at this size
a = jax.random.normal(key, (B * H * H, 9 * C), DT)
bm = jax.random.normal(key, (9 * C, C), DT)
mj = jax.jit(lambda a: jax.lax.dot_general(a, bm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
report("bare (438k,576)@(576,64) matmul", timeit_chained(lambda z, aa: chain(z, mj(aa)), jnp.zeros(()), a, iters=20, warmup=3))

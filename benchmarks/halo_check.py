"""Check the Pallas in_act halo semantics vs the composition reference (TPU).

Hypothesis: _fwd_stats_kernel applies the input-side affine+ReLU to the
zero-padded halo, making border taps read relu(t) instead of 0.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.ops.pallas_conv import _use_pallas, _xla_conv, conv3x3_act_stats

rng = np.random.default_rng(0)
B, H, W, C, Co = 1, 64, 64, 64, 64
x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, C, Co)) * 0.1, jnp.bfloat16)
b = jnp.zeros((Co,), jnp.float32)
s = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
t = jnp.asarray(np.abs(rng.normal(size=C)) + 0.5, jnp.float32)  # positive shifts

print("backend:", jax.default_backend(), "use_pallas:", _use_pallas(x, Co))


def ref(x, w, b, s, t):
    xin = jnp.maximum(
        x.astype(jnp.float32) * s + t, 0.0
    ).astype(x.dtype)
    y = _xla_conv(xin, w) + b.astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.stack([yf.sum((0, 1, 2)), (yf * yf).sum((0, 1, 2))])


yp, stp = jax.jit(lambda *a: conv3x3_act_stats(*a, True))(x, w, b, s, t)
yr, str_ = jax.jit(ref)(x, w, b, s, t)
d = np.abs(np.asarray(yp, np.float32) - np.asarray(yr, np.float32))
print("max abs diff (all):     ", d.max())
print("max abs diff (interior):", d[:, 2:-2, 2:-2, :].max())
print("max abs diff (border):  ", max(d[:, 0].max(), d[:, -1].max(), d[:, :, 0].max(), d[:, :, -1].max()))
print("stats rel diff:", (np.abs(np.asarray(stp) - np.asarray(str_)) / (np.abs(np.asarray(str_)) + 1)).max())

# gradient parity (Pallas custom VJP vs autodiff through the XLA composition)
wy = jnp.asarray(rng.normal(size=(B, H, W, Co)), jnp.float32)
ws = jnp.asarray(rng.normal(size=(2, Co)) * 1e-3, jnp.float32)


def loss(f):
    def inner(x, w, b, s, t):
        y, st = f(x, w, b, s, t)
        return (y.astype(jnp.float32) * wy).sum() + (st * ws).sum()
    return inner


g1 = jax.jit(jax.grad(loss(lambda *a: conv3x3_act_stats(*a, True)), argnums=(0, 1, 2, 3, 4)))(x, w, b, s, t)
g2 = jax.jit(jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4)))(x, w, b, s, t)
for name, a, r in zip(("dx", "dw", "db", "ds", "dt"), g1, g2):
    a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
    scale = np.abs(r).max() + 1e-6
    print(f"grad {name}: max rel-to-peak diff {np.abs(a - r).max() / scale:.2e}")

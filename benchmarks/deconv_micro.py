"""Micro-bench: k==s ConvTranspose vs matmul + depth-to-space, fwd and train.

The RPN upsample deblocks use kernel_size == stride (2x2 s2, 4x4 s4), where each
input pixel independently emits an s x s output block — exactly a 1x1 conv to
s*s*Cout channels followed by depth-to-space. This compares XLA's transposed-conv
lowering against that formulation at the PP RPN shapes (B=2, bf16).

Usage: python benchmarks/deconv_micro.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tdal.utils.timing import chain, force_completion, timeit_chained

DT = jnp.bfloat16


def bench(name, fn, *args, iters=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    force_completion(out)

    def body(c, *a):
        return chain(c, jfn(*a))

    dt = timeit_chained(body, jnp.zeros(()), *args, iters=iters, warmup=2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def deconv_xla(x, w, s):
    return jax.lax.conv_transpose(
        x, w, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def deconv_mm(x, w, s):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    # (s, s, cin, cout) -> (cin, s, s, cout) -> (cin, s*s*cout)
    wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, s * s * cout)
    y = x.reshape(b * h * wd, cin) @ wm  # MXU
    y = y.reshape(b, h, wd, s, s, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h * s, wd * s, cout)
    return y


def main():
    rng = np.random.default_rng(0)
    for (h, cin, s) in [(234, 128, 2), (117, 256, 4), (468, 64, 1)]:
        if s == 1:
            continue
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)), DT)
        w = jnp.asarray(rng.normal(size=(s, s, cin, 128)) * 0.05, DT)
        a = jax.jit(lambda x, w: deconv_xla(x, w, s))(x, w)
        b = jax.jit(lambda x, w: deconv_mm(x, w, s))(x, w)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"shape {h}x{h}x{cin} s{s}: max|xla-mm| = {err:.4f}", flush=True)
        bench(f"  xla fwd {h} s{s}", lambda xx: deconv_xla(xx, w, s), x)
        bench(f"  mm  fwd {h} s{s}", lambda xx: deconv_mm(xx, w, s), x)

        def loss_xla(ww, xx):
            return (deconv_xla(xx, ww, s).astype(jnp.float32) ** 2).sum()

        def loss_mm(ww, xx):
            return (deconv_mm(xx, ww, s).astype(jnp.float32) ** 2).sum()

        bench(f"  xla grad {h} s{s}", lambda xx: jax.grad(loss_xla)(w, xx), x)
        bench(f"  mm  grad {h} s{s}", lambda xx: jax.grad(loss_mm)(w, xx), x)


if __name__ == "__main__":
    main()

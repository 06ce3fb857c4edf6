"""Raw conv throughput at RPN shapes. Usage: python benchmarks/prof_conv.py"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tdal.utils.timing import chain, timeit_chained

key = jax.random.PRNGKey(0)


def bench_conv(h, c_in, c_out, b=2, dtype=jnp.bfloat16, stride=1, mode="fwd"):
    x = jax.random.normal(key, (b, h, h, c_in), dtype)
    w = jax.random.normal(key, (3, 3, c_in, c_out), dtype)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    flops = 2 * b * (h // stride) ** 2 * 9 * c_in * c_out
    if mode == "fwd":
        fj = jax.jit(conv)
        dt = timeit_chained(lambda z, xx: chain(z, fj(xx, w)), jnp.zeros((), dtype), x, iters=20, warmup=3)
    else:
        def loss(w, x):
            return jnp.sum(conv(x, w).astype(jnp.float32) ** 2) * 1e-9
        fj = jax.jit(jax.grad(loss))
        flops *= 3
        dt = timeit_chained(lambda z, xx: chain(z, fj(w, xx)), jnp.zeros((), dtype), x, iters=20, warmup=3)
    print(f"conv {h}x{h}x{c_in}->{c_out} s{stride} {dtype.__name__} {mode}: "
          f"{dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")


for mode in ("fwd", "grad"):
    bench_conv(468, 64, 64, mode=mode)
    bench_conv(468, 128, 128, mode=mode)
    bench_conv(234, 128, 128, mode=mode)
    bench_conv(117, 256, 256, mode=mode)
bench_conv(468, 64, 64, dtype=jnp.float32)
bench_conv(512, 64, 64)
bench_conv(512, 128, 128)
bench_conv(464, 64, 64)
bench_conv(448, 128, 128)

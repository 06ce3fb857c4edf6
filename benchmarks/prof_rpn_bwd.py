"""Decompose the RPN backward cost. Usage: python benchmarks/prof_rpn_bwd.py"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdal.models.layers import ConvBNReLU, DeconvBNReLU
from tdal.utils.timing import chain, timeit_chained

key = jax.random.PRNGKey(0)
DT = jnp.bfloat16


def bench_grad(name, mod, x, train=True, iters=10):
    vars_ = mod.init({"params": key}, x, False)

    def loss(p, xx):
        out = mod.apply({"params": p, **{k: v for k, v in vars_.items() if k != "params"}},
                        xx, train, mutable=["batch_stats"])[0]
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9

    gj = jax.jit(jax.grad(loss))
    dt = timeit_chained(lambda z, xx: chain(z, gj(vars_["params"], xx)), jnp.zeros(()), x, iters=iters, warmup=2)
    print(f"{name:46s} {dt*1e3:8.2f} ms")


class ConvStack(nn.Module):
    n: int = 4
    c: int = 64
    bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n):
            if self.bn:
                x = ConvBNReLU(self.c, dtype=DT)(x, train)
            else:
                x = nn.relu(nn.Conv(self.c, (3, 3), padding="SAME", use_bias=False, dtype=DT)(x))
        return x


x1 = jax.random.normal(key, (2, 468, 468, 64), DT)
x2 = jax.random.normal(key, (2, 234, 234, 128), DT)
x3 = jax.random.normal(key, (2, 117, 117, 256), DT)

bench_grad("stage1 conv+bn eval-mode BN", ConvStack(4, 64, True), x1, train=False)
bench_grad("stage2 6x(conv+bn+relu) 234x128", ConvStack(6, 128, True), x2)
bench_grad("stage3 6x(conv+bn+relu) 117x256", ConvStack(6, 256, True), x3)


class Deconvs(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        # the three RPN up-heads from their native resolutions
        a = DeconvBNReLU(128, stride=1, dtype=DT)(x, train)
        return a


bench_grad("deblock s1 1x1 conv 468x64->128", Deconvs(), x1)


class Deconv2(nn.Module):
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DeconvBNReLU(128, stride=self.stride, dtype=DT)(x, train)


bench_grad("deblock s2 convT 234x128->468x128", Deconv2(2), x2)
bench_grad("deblock s4 convT 117x256->468x128", Deconv2(4), x3)

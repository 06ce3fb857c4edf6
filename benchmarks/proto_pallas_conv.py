"""Prototype: Pallas 3x3 stride-1 NHWC conv vs XLA at RPN shapes.

Plan: pad H/W by 1 (+ up to tile multiple) in XLA, then each grid step DMAs a
halo'd input tile from HBM, runs 9 shifted (TH*TW, C) @ (C, C) MXU matmuls with
fp32 accumulation, writes the (TH, TW, C) output block.
"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdal.utils.timing import chain, timeit_chained

key = jax.random.PRNGKey(0)


def conv3x3_pallas(x, w, th=64, tw=64):
    """x (B, H, W, C) bf16, w (3, 3, C, Co) -> (B, H, W, Co) bf16."""
    b, h, wd, c = x.shape
    co = w.shape[-1]
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    # pad: +1 halo on top/left, halo+tile-remainder on bottom/right
    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (1, wp - wd + 1), (0, 0)))

    def kernel(xr, wr, yr, xt, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        dma = pltpu.make_async_copy(
            xr.at[bi, pl.ds(i * th, th + 2), pl.ds(j * tw, tw + 2)],
            xt, sem,
        )
        dma.start()
        dma.wait()
        acc = jnp.zeros((th * tw, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tile = xt[dy : dy + th, dx : dx + tw, :].reshape(th * tw, c)
                acc += jax.lax.dot_general(
                    tile, wr[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        yr[:] = acc.reshape(1, th, tw, co).astype(yr.dtype)

    yp = pl.pallas_call(
        kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, co), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w)
    return yp[:, :h, :wd, :]


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


B, H, C = 2, 468, 64
x = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.1
FL = 2 * B * H * H * 9 * C * C

ref = xla_conv(x, w)
for th, tw in ((64, 64), (32, 128), (128, 128), (116, 128)):
    fj = jax.jit(functools.partial(conv3x3_pallas, th=th, tw=tw))
    out = fj(x, w)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    dt = timeit_chained(lambda z, xx: chain(z, fj(xx, w)), jnp.zeros(()), x, iters=20, warmup=3)
    print(f"pallas {th}x{tw}: {dt*1e3:7.2f} ms {FL/dt/1e12:6.1f} TFLOP/s  maxerr={err:.4f}")

fx = jax.jit(xla_conv)
dt = timeit_chained(lambda z, xx: chain(z, fx(xx, w)), jnp.zeros(()), x, iters=20, warmup=3)
print(f"xla        : {dt*1e3:7.2f} ms {FL/dt/1e12:6.1f} TFLOP/s")

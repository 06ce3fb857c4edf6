"""Pallas TPU 3x3 stride-1 NHWC convolution with fused bias and custom VJP.

Why: on the target chip the sustained HBM bandwidth (~150 GB/s measured, see
benchmarks/RESULTS.md) makes full-resolution convs bandwidth-bound, and XLA's
conv lowering reads the input with heavy amplification (measured up to ~6x the
minimal bytes at the 64-channel 468x468 BEV shapes). This kernel streams the
input ONCE: each grid step DMAs one halo'd input tile HBM->VMEM (double-
buffered so the next tile's DMA overlaps compute) and runs the 9 shifted
(TH, TW, C) @ (C, Co) MXU matmuls with fp32 accumulation; bias is added in the
accumulator, so traffic ~= read x + write y (the floor). Measured 1.6-2.6x
faster than XLA's conv at the detector's hot shapes.

Used by the detector stack's full-resolution convs (RPN stage convs, CenterHead
branches; reference det3d/models/necks/rpn.py:22-158, bbox_heads/center_head.py
:65-110). Falls back to jax.lax.conv off-TPU or for unsupported shapes/dtypes,
so CPU tests and other backends are unaffected.

Backward: dgrad reuses the forward kernel with spatially-flipped, transposed
weights (exact for stride-1 SAME); wgrad is a second kernel accumulating the
(3, 3, C, Co) gradient across sequential grid steps in fp32.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # DMA slice offsets stay 8-aligned; >= the 1-pixel conv halo

# Trace-time switch: under spatial partitioning the conv stack must stay in
# XLA ops (the SPMD partitioner cannot split an opaque pallas_call — it would
# force a full gather). Models set this via xla_only() around their sharded
# region; the choice is baked into the trace, and since it is driven by a
# static module field (detectors.bev_sharding) the jit cache stays coherent.
_FORCE_XLA = False


@contextlib.contextmanager
def xla_only():
    """Route conv3x3_* through XLA (not Pallas) for ops traced inside.

    The public conv ops capture the flag STATICALLY at call time (as a
    nondiff argument of their custom_vjp), because a custom_vjp backward is
    traced during grad transposition — AFTER the ``with`` block has exited —
    so reading the global there would re-enable Pallas in the backward of a
    spatially-partitioned step (regression: tests/test_spatial_partition.py
    ::test_xla_only_pins_the_backward_route)."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _cpad(c):
    """Channel padding for the input tiles. 128 is FORCED by Mosaic: slicing
    the VMEM scratch along the last dim must be aligned to the (8, 128) lane
    tiling ("Slice shape along dimension 3 must be aligned to tiling (128)").
    64-alignment would halve the input DMA traffic of the C=64 layers but
    fails to compile — measured dead end, do not retry."""
    return _round_up(c, 128)


def _use_pallas(x, co):
    return (
        not _FORCE_XLA
        and jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and co % 64 == 0
        and x.shape[1] >= 32
        and x.shape[2] >= 32
    )


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _tiles(cp, co):
    """Largest (th, tw=64) whose buffers fit the ~16MB VMEM budget:
    2 input slots (th+16, 80, cp) bf16 + fp32 acc + 2 output slots + weights.

    Negative result (do not retry without new evidence): a waste-aware tile
    search that picks th minimizing rounded-up rows (e.g. 480 instead of 512
    for h=468, saving 9.4% pad rows) models only ~3-6% traffic upside once
    halo re-reads per extra tile row and pad-write savings are both counted,
    while odd tile heights risk Mosaic layout cliffs — the fixed power-of-two
    ladder stays."""
    tw = 64
    for th in (64, 32, 16, 8):
        need = (
            2 * (th + 2 * HALO) * (tw + 2 * HALO) * cp * 2
            + th * tw * co * 4
            + 2 * th * tw * co * 2
            + 9 * cp * co * 2
        )
        # Mosaic's actual stack allocation runs ~1.5x this estimate (slice
        # copies feeding the MXU), so budget well under the 16MB VMEM.
        if need <= 8 * 1024 * 1024:
            return th, tw
    return 8, tw


def _dma(xr, xt, sem, slot, b, i, j, th, tw):
    return pltpu.make_async_copy(
        xr.at[b, pl.ds(i * th, th + 2 * HALO), pl.ds(j * tw, tw + 2 * HALO)],
        xt.at[slot], sem.at[slot],
    )


def _step_ids(step, nh, nw):
    b = step // (nh * nw)
    i = (step // nw) % nh
    j = step % nw
    return b, i, j


def _inbounds(nr, nc, off_r, off_c, h, w):
    """(nr, nc, 1) f32 mask: 1 where global pixel (off_r + r, off_c + c) lies
    inside the valid (h, w) image, 0 in the zero-padded halo/remainder."""
    row = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 0) + off_r
    col = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 1) + off_c
    return ((row >= 0) & (row < h) & (col >= 0) & (col < w)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel with INPUT-side affine(+ReLU) and fused output stats
# (the cross-layer BN restructure: the producing conv's BatchNorm normalize
# rides the consuming conv's input side inside VMEM, and the raw-output
# moments come out of the same pass — no separate stats/normalize HBM passes)
# ---------------------------------------------------------------------------


def _fwd_stats_kernel(
    xr, wr, isr, itr, br, yr, statr, xt, sem, *, th, tw, co, nh, nw, in_act, h, w
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (b * nh + i) * nw + j
    slot = step % 2

    @pl.when(step == 0)
    def _():
        _dma(xr, xt, sem, slot, b, i, j, th, tw).start()
        statr[:] = jnp.zeros_like(statr)

    nstep = step + 1
    nb, ni, nj = _step_ids(nstep, nh, nw)

    @pl.when(nstep < pl.num_programs(0) * nh * nw)
    def _():
        _dma(xr, xt, sem, (slot + 1) % 2, nb, ni, nj, th, tw).start()

    _dma(xr, xt, sem, slot, b, i, j, th, tw).wait()
    if in_act:
        # previous layer's BN normalize + ReLU, applied ONCE in VMEM over the
        # (th+2, tw+2) halo'd window; the 9 taps below slice the result. Cast
        # back to the input dtype so the math matches the materialized bf16
        # activation it replaces bit-for-bit. The halo outside the valid
        # (h, w) image is ZERO in the materialized-activation semantics, but
        # the affine turns padded zeros into relu(shift) — mask it back out
        # (border taps otherwise read garbage; measured 17% BN-stat error at
        # 64x64, benchmarks/halo_check.py).
        src = xt[slot, pl.ds(HALO - 1, th + 2), pl.ds(HALO - 1, tw + 2), :]
        act = jnp.maximum(src.astype(jnp.float32) * isr[:] + itr[:], 0.0)
        act = (
            act * _inbounds(th + 2, tw + 2, i * th - 1, j * tw - 1, h, w)
        ).astype(xt.dtype)

        def tap(dy, dx):
            return jax.lax.slice(act, (dy, dx, 0), (dy + th, dx + tw, act.shape[2]))

    else:

        def tap(dy, dx):
            return xt[slot, pl.ds(HALO - 1 + dy, th), pl.ds(HALO - 1 + dx, tw), :]

    acc = jnp.zeros((th, tw, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                tap(dy, dx), wr[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + br[:].astype(jnp.float32)
    yr[:] = acc.reshape(1, th, tw, co).astype(yr.dtype)
    # raw-output moments over the VALID region only (padding rows carry bias)
    vh = jnp.minimum(h - i * th, th)
    vw = jnp.minimum(w - j * tw, tw)
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1)
    m = ((row < vh) & (col < vw)).astype(jnp.float32)
    am = acc * m
    statr[0] += am.sum(axis=(0, 1))
    statr[1] += (am * acc).sum(axis=(0, 1))


def _pallas_fwd_stats(x, w, bias, in_scale, in_shift, in_act, return_padded=False):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    cp = _cpad(c)
    th, tw = _tiles(cp, co)
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    xp = jnp.pad(
        x, ((0, 0), (HALO, hp - h + HALO), (HALO, wp - wd + HALO), (0, cp - c))
    )
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, 0))).astype(x.dtype)
    # input-side affine lives in the PADDED channel space of x
    isc = jnp.pad(in_scale.astype(jnp.float32), (0, cp - c), constant_values=1.0)
    ish = jnp.pad(in_shift.astype(jnp.float32), (0, cp - c))
    kern = functools.partial(
        _fwd_stats_kernel, th=th, tw=tw, co=co, nh=nh, nw=nw, in_act=in_act,
        h=h, w=wd,
    )
    yp, stats = pl.pallas_call(
        kern,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw, co), lambda bi, i, j: (bi, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, co), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp, co), x.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * HALO, tw + 2 * HALO, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 9 * cp * co,
            bytes_accessed=xp.size * 2 + b * hp * wp * co * 2,
            transcendentals=0,
        ),
    )(xp, wpad, isc, ish, bias.astype(jnp.float32))
    if return_padded:
        return yp[:, :h, :wd, :], stats, xp
    return yp[:, :h, :wd, :], stats


def _fwd_kernel(xr, wr, sr, br, yr, xt, sem, *, th, tw, co, nh, nw, relu):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (b * nh + i) * nw + j
    slot = step % 2

    @pl.when(step == 0)
    def _():
        _dma(xr, xt, sem, slot, b, i, j, th, tw).start()

    nstep = step + 1
    nb, ni, nj = _step_ids(nstep, nh, nw)

    @pl.when(nstep < pl.num_programs(0) * nh * nw)
    def _():
        _dma(xr, xt, sem, (slot + 1) % 2, nb, ni, nj, th, tw).start()

    _dma(xr, xt, sem, slot, b, i, j, th, tw).wait()
    acc = jnp.zeros((th, tw, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = xt[slot, pl.ds(HALO - 1 + dy, th), pl.ds(HALO - 1 + dx, tw), :]
            acc = acc + jax.lax.dot_general(
                tile, wr[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # fused output-side affine (+ ReLU): bias, or a folded inference BatchNorm
    acc = acc * sr[:].astype(jnp.float32) + br[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    yr[:] = acc.reshape(1, th, tw, co).astype(yr.dtype)


def _pallas_fwd(x, w, shift, scale=None, relu=False):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    cp = _cpad(c)
    th, tw = _tiles(cp, co)
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    xp = jnp.pad(
        x, ((0, 0), (HALO, hp - h + HALO), (HALO, wp - wd + HALO), (0, cp - c))
    )
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, 0))).astype(x.dtype)
    if scale is None:
        scale = jnp.ones((co,), jnp.float32)
    kern = functools.partial(
        _fwd_kernel, th=th, tw=tw, co=co, nh=nh, nw=nw, relu=relu
    )
    yp = pl.pallas_call(
        kern,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, co), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * HALO, tw + 2 * HALO, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 9 * cp * co,
            bytes_accessed=xp.size * 2 + b * hp * wp * co * 2,
            transcendentals=0,
        ),
    )(xp, wpad, scale.astype(jnp.float32), shift.astype(jnp.float32))
    return yp[:, :h, :wd, :]


# ---------------------------------------------------------------------------
# fused dgrad for the in_act chain: dx = conv(gy, wt) * (pre > 0) * s with the
# ds/dt moment cotangents accumulated in the SAME VMEM pass (pre = x*s + t,
# x re-read from the forward's saved padded input).
#
# MEASURED: numerically exact (benchmarks/halo_check.py routes through it when
# wired) but a net LOSS on the PP train step (104.1 vs 102.5 ms same-session
# A/B) — XLA fuses the dxhat-consuming elementwise chain well enough that the
# extra x-tile DMA + the padded-channel dx write cost more than the fused
# passes save. Kept unrouted as a measured decision record; revisit on
# hardware with slower elementwise fusion or wider chained convs.
# ---------------------------------------------------------------------------


def _tiles_dgrad(cg, cd):
    """(th, tw) whose gy slots + x slots + acc + out slots + weights fit."""
    tw = 64
    for th in (64, 32, 16, 8):
        need = (
            2 * (th + 2 * HALO) * (tw + 2 * HALO) * cg * 2
            + 2 * th * tw * cd * 2
            + th * tw * cd * 4
            + 2 * th * tw * cd * 2
            + 9 * cg * cd * 2
        )
        if need <= 8 * 1024 * 1024:
            return th, tw
    return 8, tw


def _dgrad_act_kernel(
    gr, wr, xr, sr, tr, dxr, statr, gt, xt, sem, semx, *, th, tw, cd, nh, nw, h, w
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (b * nh + i) * nw + j
    slot = step % 2

    def xdma(slot, bb, ii, jj):
        # x tiles align with OUTPUT tiles (no halo): xp rows HALO + i*th ...
        return pltpu.make_async_copy(
            xr.at[bb, pl.ds(HALO + ii * th, th), pl.ds(HALO + jj * tw, tw)],
            xt.at[slot], semx.at[slot],
        )

    @pl.when(step == 0)
    def _():
        _dma(gr, gt, sem, slot, b, i, j, th, tw).start()
        xdma(slot, b, i, j).start()
        statr[:] = jnp.zeros_like(statr)

    nstep = step + 1
    nb, ni, nj = _step_ids(nstep, nh, nw)

    @pl.when(nstep < pl.num_programs(0) * nh * nw)
    def _():
        _dma(gr, gt, sem, (slot + 1) % 2, nb, ni, nj, th, tw).start()
        xdma((slot + 1) % 2, nb, ni, nj).start()

    _dma(gr, gt, sem, slot, b, i, j, th, tw).wait()
    acc = jnp.zeros((th, tw, cd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = gt[slot, pl.ds(HALO - 1 + dy, th), pl.ds(HALO - 1 + dx, tw), :]
            acc = acc + jax.lax.dot_general(
                tile, wr[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    xdma(slot, b, i, j).wait()
    xv = xt[slot].astype(jnp.float32)
    pre = xv * sr[:] + tr[:]
    # relu mask AND the valid-image mask (stats must not see the padded
    # remainder rows, where conv(gy) is nonzero near the edge)
    m = (pre > 0).astype(jnp.float32) * _inbounds(th, tw, i * th, j * tw, h, w)
    dxh = acc * m
    dxr[:] = (dxh * sr[:]).reshape(1, th, tw, cd).astype(dxr.dtype)
    statr[0] += (dxh * xv).sum(axis=(0, 1))
    statr[1] += dxh.sum(axis=(0, 1))


def _dgrad_fits(gy, xp):
    """True when the dgrad tiling's x-tile reads stay inside the forward's
    padded input (guaranteed when both tilings round up over the {64,32,16,8}
    divisor ladder, but checked explicitly)."""
    h, wd = gy.shape[1], gy.shape[2]
    cg = _cpad(gy.shape[-1])
    th, tw = _tiles_dgrad(cg, xp.shape[-1])
    hp, wp = pl.cdiv(h, th) * th, pl.cdiv(wd, tw) * tw
    return hp + 2 * HALO <= xp.shape[1] and wp + 2 * HALO <= xp.shape[2]


def _pallas_dgrad_act(gy, wt, xp, in_scale, in_shift, c):
    """dx (b, h, w, cd=xp channels) + stats (2, cd) = [ds, dt] for the in_act
    chain backward. ``wt`` is the flipped/transposed forward kernel
    (3, 3, co, c); its last dim is zero-padded to xp's channel count so the
    x tiles, dx and the affine all live in the same padded channel space
    (padded channels: s=1, t=0, x=0 -> pre=0 -> masked out)."""
    b = gy.shape[0]
    h, wd = gy.shape[1], gy.shape[2]
    cg = _cpad(gy.shape[-1])
    cd = xp.shape[-1]
    th, tw = _tiles_dgrad(cg, cd)
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    gyp = jnp.pad(
        gy,
        ((0, 0), (HALO, hp - h + HALO), (HALO, wp - wd + HALO),
         (0, cg - gy.shape[-1])),
    )
    wtp = jnp.pad(
        wt, ((0, 0), (0, 0), (0, cg - wt.shape[2]), (0, cd - wt.shape[3]))
    ).astype(gy.dtype)
    isc = jnp.pad(
        in_scale.astype(jnp.float32), (0, cd - c), constant_values=1.0
    )
    ish = jnp.pad(in_shift.astype(jnp.float32), (0, cd - c))
    kern = functools.partial(
        _dgrad_act_kernel, th=th, tw=tw, cd=cd, nh=nh, nw=nw, h=h, w=wd
    )
    dx, stats = pl.pallas_call(
        kern,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw, cd), lambda bi, i, j: (bi, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, cd), lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp, cd), xp.dtype),
            jax.ShapeDtypeStruct((2, cd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * HALO, tw + 2 * HALO, cg), gy.dtype),
            pltpu.VMEM((2, th, tw, cd), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 9 * cg * cd,
            bytes_accessed=gyp.size * 2 + b * hp * wp * cd * 2 * 2,
            transcendentals=0,
        ),
    )(gyp, wtp, xp, isc, ish)
    return dx[:, :h, :wd, :], stats


# ---------------------------------------------------------------------------
# wgrad kernel: dw[ky,kx,ci,co] = sum_{b,h,w} x[b,h+ky-1,w+kx-1,ci] dy[b,h,w,co]
#
# Cost model for a COMBINED dgrad+wgrad kernel sharing the gy tile DMA
# (ROADMAP lever, analyzed round 3): holding both halo'd gy and halo'd x
# tiles plus the fp32 dx accumulator and the (3,3,cp,cg) dw accumulator
# forces th 64->32 at the 128-channel shapes, raising halo read
# amplification from 1.56x to 1.875x per stream. Total traffic per conv
# backward: separate = 1.56(gy) + 1.0(dx write) + 1.56(xp) + 1.0(gy via
# BlockSpec) = 5.12x vs combined = 1.875 + 1.875 + 1.0 = 4.75x — ~7% on the
# ~2/3-backward share of the ~27 ms Pallas-conv step budget (~1.3 ms), with
# Mosaic layout risk and grid-step doubling on top. Two prior fused-backward
# attempts with the same "add an x DMA to save a pass" shape measured as net
# losses (_pallas_dgrad_act header); not built.
# ---------------------------------------------------------------------------


def _wgrad_act_kernel(
    xr, dyr, isr, itr, dwr, xt, sem, *, th, tw, co, nh, nw, in_act, h, w
):
    """wgrad with the producer-BN affine+ReLU applied to x tiles in VMEM
    (the input the conv actually saw on the chained train path)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (b * nh + i) * nw + j
    slot = step % 2

    @pl.when(step == 0)
    def _():
        _dma(xr, xt, sem, slot, b, i, j, th, tw).start()
        dwr[:] = jnp.zeros_like(dwr)

    nstep = step + 1
    nb, ni, nj = _step_ids(nstep, nh, nw)

    @pl.when(nstep < pl.num_programs(0) * nh * nw)
    def _():
        _dma(xr, xt, sem, (slot + 1) % 2, nb, ni, nj, th, tw).start()

    _dma(xr, xt, sem, slot, b, i, j, th, tw).wait()
    if in_act:
        # one affine+ReLU+halo-mask pass shared by the 9 taps — same masking
        # rationale as _fwd_stats_kernel
        src = xt[slot, pl.ds(HALO - 1, th + 2), pl.ds(HALO - 1, tw + 2), :]
        act = jnp.maximum(src.astype(jnp.float32) * isr[:] + itr[:], 0.0)
        act = (
            act * _inbounds(th + 2, tw + 2, i * th - 1, j * tw - 1, h, w)
        ).astype(xt.dtype)

        def tap(dy, dx):
            return jax.lax.slice(act, (dy, dx, 0), (dy + th, dx + tw, act.shape[2]))

    else:

        def tap(dy, dx):
            return xt[slot, pl.ds(HALO - 1 + dy, th), pl.ds(HALO - 1 + dx, tw), :]

    dyt = dyr[:].reshape(th * tw, co)
    for dy in range(3):
        for dx in range(3):
            dwr[dy, dx] += jax.lax.dot_general(
                tap(dy, dx).reshape(th * tw, -1), dyt,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _pallas_wgrad_act(x, dy, in_scale, in_shift, in_act, c: int, xp=None):
    """x may be the UNPADDED input or None when ``xp`` (the forward pass's
    already-padded input, saved in the VJP residuals) is supplied — reusing it
    skips one full pad (read+write of the activation) per conv backward."""
    b, h, wd = dy.shape[0], dy.shape[1], dy.shape[2]
    co = dy.shape[-1]
    cp = _cpad(c)
    th, tw = _tiles(cp, co)
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    if xp is None:
        xp = jnp.pad(
            x, ((0, 0), (HALO, hp - h + HALO), (HALO, wp - wd + HALO), (0, cp - c))
        )
    xdtype = xp.dtype
    dyp = jnp.pad(dy, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
    isc = jnp.pad(in_scale.astype(jnp.float32), (0, cp - c), constant_values=1.0)
    ish = jnp.pad(in_shift.astype(jnp.float32), (0, cp - c))
    kern = functools.partial(
        _wgrad_act_kernel, th=th, tw=tw, co=co, nh=nh, nw=nw, in_act=in_act,
        h=h, w=wd,
    )
    dw = pl.pallas_call(
        kern,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, th, tw, co), lambda bi, i, j: (bi, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, cp, co), lambda bi, i, j: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, cp, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * HALO, tw + 2 * HALO, cp), xdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 9 * cp * co,
            bytes_accessed=xp.size * 2 + dyp.size * 2,
            transcendentals=0,
        ),
    )(xp, dyp, isc, ish)
    return dw[:, :, :c, :]


def _wgrad_kernel(xr, dyr, dwr, xt, sem, *, th, tw, co, nh, nw):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (b * nh + i) * nw + j
    slot = step % 2

    @pl.when(step == 0)
    def _():
        _dma(xr, xt, sem, slot, b, i, j, th, tw).start()
        dwr[:] = jnp.zeros_like(dwr)

    nstep = step + 1
    nb, ni, nj = _step_ids(nstep, nh, nw)

    @pl.when(nstep < pl.num_programs(0) * nh * nw)
    def _():
        _dma(xr, xt, sem, (slot + 1) % 2, nb, ni, nj, th, tw).start()

    _dma(xr, xt, sem, slot, b, i, j, th, tw).wait()
    dyt = dyr[:].reshape(th * tw, co)
    for dy in range(3):
        for dx in range(3):
            tile = xt[
                slot, pl.ds(HALO - 1 + dy, th), pl.ds(HALO - 1 + dx, tw), :
            ].reshape(th * tw, -1)
            dwr[dy, dx] += jax.lax.dot_general(
                tile, dyt,
                (((0,), (0,)), ((), ())),  # contract over rows
                preferred_element_type=jnp.float32,
            )


def _pallas_wgrad(x, dy):
    b, h, wd, c = x.shape
    co = dy.shape[-1]
    cp = _cpad(c)
    th, tw = _tiles(cp, co)
    nh, nw = pl.cdiv(h, th), pl.cdiv(wd, tw)
    hp, wp = nh * th, nw * tw
    xp = jnp.pad(
        x, ((0, 0), (HALO, hp - h + HALO), (HALO, wp - wd + HALO), (0, cp - c))
    )
    dyp = jnp.pad(dy, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
    kern = functools.partial(_wgrad_kernel, th=th, tw=tw, co=co, nh=nh, nw=nw)
    dw = pl.pallas_call(
        kern,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, th, tw, co), lambda bi, i, j: (bi, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, cp, co), lambda bi, i, j: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, cp, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * HALO, tw + 2 * HALO, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 9 * cp * co,
            bytes_accessed=xp.size * 2 + dyp.size * 2,
            transcendentals=0,
        ),
    )(xp, dyp)
    return dw[:, :, :c, :]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_bias(x, w, bias, force_xla):
    if _use_pallas(x, w.shape[-1]) and not force_xla:
        return _pallas_fwd(x, w, bias)
    return _xla_conv(x, w) + bias.astype(x.dtype)


def _conv_fwd(x, w, bias, force_xla):
    # zero-size marker carries the bias dtype (dtypes aren't pytree leaves)
    return _conv3x3_bias(x, w, bias, force_xla), (x, w, jnp.zeros((0,), bias.dtype))


def _conv_bwd(force_xla, res, g):
    x, w, bdt = res
    # dgrad: stride-1 SAME conv of dy with flipped/transposed weights
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    db = g.astype(jnp.float32).sum(axis=(0, 1, 2))
    if _use_pallas(g, wt.shape[-1]) and not force_xla:
        dx = _pallas_fwd(g, wt, jnp.zeros((wt.shape[-1],), jnp.float32))
        dw = _pallas_wgrad(x, g)
    else:
        dx = _xla_conv(g, wt.astype(g.dtype))
        # correlation trick: lhs (ci, H, W, b) conv rhs (H, W, b, co), pad 1
        dw = jax.lax.conv_general_dilated(
            x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).transpose(1, 2, 0, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(bdt.dtype)


_conv3x3_bias.defvjp(_conv_fwd, _conv_bwd)


def conv3x3_bias(x, w, bias):
    """3x3 stride-1 SAME NHWC conv + bias. x (B,H,W,C), w (3,3,C,Co), bias (Co,).

    The Pallas/XLA route is resolved HERE (trace time, inside any xla_only()
    block) and baked into the custom_vjp as a static argument so forward and
    backward always take the same route."""
    return _conv3x3_bias(x, w, bias, _FORCE_XLA)


def conv3x3(x, w):
    """Bias-free 3x3 stride-1 SAME conv (grad w.r.t. the zero bias is dropped)."""
    return conv3x3_bias(x, w, jnp.zeros((w.shape[-1],), jnp.float32))


def conv3x3_affine(x, w, scale, shift, relu: bool = True):
    """INFERENCE-ONLY fused conv + per-channel affine (+ ReLU): one output pass.

    The affine is a folded eval-mode BatchNorm: scale = gamma*rsqrt(var+eps),
    shift = beta - mean*scale (+ conv bias folded by the caller). No custom VJP
    — eval paths only."""
    if _use_pallas(x, w.shape[-1]):
        return _pallas_fwd(x, w, shift, scale=scale, relu=relu)
    y = _xla_conv(x, w) * scale.astype(x.dtype) + shift.astype(x.dtype)
    return jnp.maximum(y, 0) if relu else y


# ---------------------------------------------------------------------------
# cross-layer fused train op: input-side BN normalize + conv + output stats
# ---------------------------------------------------------------------------


def _in_affine(x, s, t):
    return jnp.maximum(
        x.astype(jnp.float32) * s.astype(jnp.float32) + t.astype(jnp.float32), 0.0
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _conv3x3_act_stats(x, w, bias, in_scale, in_shift, in_act, bwd="auto"):
    if _use_pallas(x, w.shape[-1]):
        return _pallas_fwd_stats(x, w, bias, in_scale, in_shift, in_act)
    xin = _in_affine(x, in_scale, in_shift) if in_act else x
    y = _xla_conv(xin, w) + bias.astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack([yf.sum(axis=(0, 1, 2)), (yf * yf).sum(axis=(0, 1, 2))])
    return y, stats


def _cas_fwd(x, w, bias, in_scale, in_shift, in_act, bwd="auto"):
    if _use_pallas(x, w.shape[-1]):
        y, stats, xp = _pallas_fwd_stats(
            x, w, bias, in_scale, in_shift, in_act, return_padded=True
        )
        # save the PADDED input: wgrad reuses it directly, and the mask/ds/dt
        # reads slice it (XLA fuses the slice into the elementwise consumers)
        res = (xp, None, w, in_scale, in_shift, y, jnp.zeros((0,), bias.dtype))
        return (y, stats), res
    y, stats = _conv3x3_act_stats(x, w, bias, in_scale, in_shift, in_act, bwd)
    return (y, stats), (None, x, w, in_scale, in_shift, y, jnp.zeros((0,), bias.dtype))


def _cas_bwd(in_act, bwd, res, ct):
    xp, x, w, s, t, y, bmark = res
    c = w.shape[2]
    if xp is not None:
        # spatial dims of a SAME stride-1 conv match the output's
        h, wd = y.shape[1], y.shape[2]
        x = xp[:, HALO : HALO + h, HALO : HALO + wd, :c]
    gy, gstats = ct
    gsum, gss = gstats[0], gstats[1]
    # cotangent into the RAW conv output: direct + through the two moments
    gy_tot = (
        gy.astype(jnp.float32) + gsum + 2.0 * y.astype(jnp.float32) * gss
    ).astype(y.dtype)
    db = gy_tot.astype(jnp.float32).sum(axis=(0, 1, 2))
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    # Tiny-output convs (co << cin, e.g. the SepHead final 320->64-padded-11)
    # keep the XLA backward: its fused dgrad/wgrad beat both the plain Pallas
    # bwd (+1.6 ms on the step) and the fused _pallas_dgrad_act (+3.1 ms) —
    # measured round 3, /tmp A/Bs recorded in benchmarks/RESULTS.md. The
    # Pallas bwd stays for the square chains (co == cin), where it won round 2.
    # ``bwd`` overrides the heuristic per call site.
    xla_bwd = bwd == "xla" or (bwd == "auto" and w.shape[3] * 2 <= c)
    # xp is the fwd-route marker: Pallas backward only when the forward ran
    # the Pallas kernel (ties the backward to the route captured at call
    # time — the _FORCE_XLA global is stale by backward-trace time)
    if xp is not None and _use_pallas(gy_tot, wt.shape[-1]) and not xla_bwd:
        dxhat = _pallas_fwd(gy_tot, wt, jnp.zeros((wt.shape[-1],), jnp.float32))
        dw = _pallas_wgrad_act(x if xp is None else None, gy_tot, s, t, in_act, c, xp=xp)
    else:
        xin = _in_affine(x, s, t) if in_act else x
        dxhat = _xla_conv(gy_tot, wt.astype(gy_tot.dtype))
        dw = jax.lax.conv_general_dilated(
            xin.transpose(3, 1, 2, 0), gy_tot.transpose(1, 2, 0, 3), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).transpose(1, 2, 0, 3)
    if in_act:
        pre = x.astype(jnp.float32) * s.astype(jnp.float32) + t.astype(jnp.float32)
        dxh = dxhat.astype(jnp.float32) * (pre > 0)
        dx = (dxh * s.astype(jnp.float32)).astype(x.dtype)
        ds = (dxh * x.astype(jnp.float32)).sum(axis=(0, 1, 2))
        dt = dxh.sum(axis=(0, 1, 2))
    else:
        dx = dxhat.astype(x.dtype)
        ds = jnp.zeros_like(s, jnp.float32)
        dt = jnp.zeros_like(t, jnp.float32)
    return (
        dx,
        dw.astype(w.dtype),
        db.astype(bmark.dtype),
        ds.astype(s.dtype),
        dt.astype(t.dtype),
    )


_conv3x3_act_stats.defvjp(_cas_fwd, _cas_bwd)


def conv3x3_act_stats(x, w, bias, in_scale, in_shift, in_act, bwd="auto"):
    """3x3 s1 SAME conv returning ``(y, stats)`` with stats = [sum y, sum y^2]
    per channel, computed in the SAME VMEM pass as the conv.

    With ``in_act=True`` the previous layer's BatchNorm normalize + ReLU
    (per-channel ``in_scale``/``in_shift``) is applied to the input tiles in
    VMEM — the normalized activation never exists in HBM. This is the
    cross-layer BN restructure (ROADMAP item 3): the producing conv's BN
    stats come out of its own output pass, and its normalize rides the
    consuming conv's input side. The chip is HBM-bandwidth-bound, so cutting
    the separate stats-read and normalize read+write passes is the win.

    ``bwd``: backward-path routing on TPU — 'auto' (XLA for tiny-output convs
    2*co <= cin, Pallas otherwise; measured round 3), 'pallas', or 'xla'.
    Under xla_only() the route is pinned to XLA here, at trace time, because
    the custom_vjp backward is traced after the ``with`` block exits."""
    if _FORCE_XLA:
        bwd = "xla"
    return _conv3x3_act_stats(x, w, bias, in_scale, in_shift, in_act, bwd)

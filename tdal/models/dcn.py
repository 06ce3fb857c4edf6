"""Deformable convolution (DCNv1) + DCN-adapted CenterHead branch, TPU-native.

Capability parity with reference ``det3d/ops/dcn`` (C++/CUDA im2col with bilinear
offsets, ~2020 LoC) and the optional ``DCNSepHead``/``FeatureAdaption`` in
center_head.py:25-63,112-164. On TPU there is no custom kernel: the bilinear-offset
sampling is expressed as XLA gathers (vectorized over B*H*W*K taps) which XLA fuses;
the K-tap contraction is an MXU matmul. SURVEY.md §2.7 ranks this low priority (no
shipped config enables it) but it completes the head inventory.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def deform_sample(x, offsets, kernel_size: int = 3):
    """Bilinear-sample x at the deformed 3x3 taps of every output position.

    x (B, H, W, C); offsets (B, H, W, 2*K*K) ordered (dy, dx) per tap.
    Returns (B, H, W, K*K, C)."""
    b, h, w, c = x.shape
    k = kernel_size
    half = (k - 1) // 2
    # base tap grid
    ky, kx = jnp.meshgrid(
        jnp.arange(-half, half + 1), jnp.arange(-half, half + 1), indexing="ij"
    )
    base_y = jnp.arange(h)[:, None, None] + ky.reshape(1, 1, k * k)  # (H, 1, K2)
    base_x = jnp.arange(w)[None, :, None] + kx.reshape(1, 1, k * k)  # (1, W, K2)
    grid_y = jnp.broadcast_to(base_y, (h, w, k * k))[None].astype(jnp.float32)
    grid_x = jnp.broadcast_to(base_x, (h, w, k * k))[None].astype(jnp.float32)
    off = offsets.reshape(b, h, w, k * k, 2)
    ys = grid_y + off[..., 0]
    xs = grid_x + off[..., 1]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        lin = yi * w + xi  # (B, H, W, K*K)
        flat = x.reshape(b, h * w, c)
        return jnp.take_along_axis(
            flat[:, :, None, :], lin.reshape(b, -1, 1, 1), axis=1
        ).reshape(b, h, w, k * k, c)

    # zero out-of-bounds taps (reference im2col zero padding)
    def in_bounds(yy, xx):
        return (
            (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        ).astype(x.dtype)[..., None]

    va = gather(y0, x0) * in_bounds(y0, x0)
    vb = gather(y0 + 1, x0) * in_bounds(y0 + 1, x0)
    vc = gather(y0, x0 + 1) * in_bounds(y0, x0 + 1)
    vd = gather(y0 + 1, x0 + 1) * in_bounds(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        va * (1 - wy) * (1 - wx)
        + vb * wy * (1 - wx)
        + vc * (1 - wy) * wx
        + vd * wy * wx
    )


class DeformConv(nn.Module):
    """3x3 deformable conv: offsets supplied by the caller."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offsets):
        taps = deform_sample(x, offsets, self.kernel_size)  # (B,H,W,K2,C)
        b, h, w, k2, c = taps.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k2 * c, self.features),
        )
        out = taps.reshape(b, h, w, k2 * c) @ kernel.astype(self.dtype)
        return out


class FeatureAdaption(nn.Module):
    """1x1 conv predicts tap offsets (zero-init) -> deformable conv -> ReLU.

    Parity: center_head.FeatureAdaption (:25-63)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k2 = self.kernel_size * self.kernel_size
        offsets = nn.Conv(
            2 * k2, (1, 1), use_bias=True,
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
        )(x)
        y = DeformConv(self.features, self.kernel_size, dtype=self.dtype)(x, offsets)
        return nn.relu(y)


class DCNSepHead(nn.Module):
    """Deformable feature adaptation split for cls vs reg branches.

    Parity: center_head.DCNSepHead (:112-164)."""

    heads: dict  # without 'hm'
    num_cls: int
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tdal.models.center_head import SepHead

        center_feat = FeatureAdaption(x.shape[-1], dtype=self.dtype)(x)
        reg_feat = FeatureAdaption(x.shape[-1], dtype=self.dtype)(x)

        h = nn.Conv(self.head_conv, (3, 3), padding="SAME", dtype=self.dtype)(center_feat)
        # Reference nn.BatchNorm2d(64) defaults (center_head.py:187): torch
        # momentum 0.1 == flax momentum 0.9, eps 1e-5 — same as the other
        # head BNs (PARITY.md pins this).
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(h)
        h = nn.relu(h)
        hm = nn.Conv(
            self.num_cls, (3, 3), padding="SAME",
            bias_init=nn.initializers.constant(self.init_bias), dtype=self.dtype,
        )(h)

        ret = SepHead(self.heads, head_conv=self.head_conv, dtype=self.dtype)(
            reg_feat, train
        )
        ret["hm"] = hm
        return ret

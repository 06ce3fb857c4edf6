"""Shared flax layers for the detection stack: masked BatchNorm, conv blocks.

TPU notes: all convs are channels-last (NHWC) so XLA tiles them onto the MXU without
layout transposes; BatchNorm hyperparams mirror the reference's norm_cfg
(eps=1e-3, torch momentum 0.01 -> flax momentum 0.99; rpn.py:45, pillar_encoder.py:39).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-feature axes, with an optional validity mask.

    Padded rows (empty voxels/pillars of the fixed-shape batch) must not pollute the
    batch statistics — the reference never sees padding because its voxel tensors are
    ragged (collate.py:137-144); ours are dense. Mask shape broadcasts to x's non-
    feature dims."""

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(x, axis=axes)
                var = jnp.var(x, axis=axes)
            else:
                w = jnp.broadcast_to(mask[..., None], x.shape).astype(x.dtype)
                denom = jnp.maximum(w.sum(axis=axes), 1.0)
                mean = (x * w).sum(axis=axes) / denom
                var = ((x - mean) ** 2 * w).sum(axis=axes) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ConvBNReLU(nn.Module):
    """3x3 (default) Conv2d + BN + ReLU, NHWC."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    """Transpose-conv upsample (or strided conv when stride < 1 is encoded as
    downsample=True) + BN + ReLU. Parity: RPN deblocks (necks/rpn.py:80-110)."""

    features: int
    stride: int = 2
    downsample: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample:
            x = nn.Conv(
                self.features,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        elif self.stride == 1:
            x = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)

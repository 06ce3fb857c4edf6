"""Shared flax layers for the detection stack: masked BatchNorm, conv blocks.

TPU notes: all convs are channels-last (NHWC) so XLA tiles them onto the MXU without
layout transposes; BatchNorm hyperparams mirror the reference's norm_cfg
(eps=1e-3, torch momentum 0.01 -> flax momentum 0.99; rpn.py:45, pillar_encoder.py:39).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


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
            # Stats accumulate in fp32 (bf16 sums over B*V*P elements lose bits).
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
            else:
                w = jnp.broadcast_to(mask[..., None], x.shape).astype(jnp.float32)
                denom = jnp.maximum(w.sum(axis=axes), 1.0)
                mean = (xf * w).sum(axis=axes) / denom
                var = ((xf - mean) ** 2 * w).sum(axis=axes) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # Normalize in the module dtype so a bf16 activation chain stays bf16
        # end-to-end (the fp32 round-trip doubled HBM traffic on TPU).
        inv = jax.lax.rsqrt(var + self.epsilon).astype(self.dtype)
        y = (x.astype(self.dtype) - mean.astype(self.dtype)) * inv
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


class PallasConv3x3(nn.Module):
    """3x3 stride-1 SAME conv through tdal.ops.pallas_conv (bias fused in the
    accumulator). Param tree matches nn.Conv ('kernel' (3,3,Cin,Co), 'bias').
    Dispatches to XLA off-TPU / for unsupported shapes."""

    features: int
    use_bias: bool = False
    bias_init: object = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tdal.ops.pallas_conv import conv3x3_bias

        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features)
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        return conv3x3_bias(
            x.astype(self.dtype), kernel.astype(self.dtype), bias
        )


class FusedConvBN(nn.Module):
    """3x3 stride-1 conv + BatchNorm + optional ReLU with EVAL-time folding
    and a chainable TRAIN path (cross-layer BN fusion).

    Owns its BatchNorm variables so that at eval the running stats (and the
    conv bias) fold into the fused conv's output affine — conv + BN +
    ReLU in a single input/output pass (the chip is HBM-bandwidth-bound).

    TRAIN: the conv runs through conv3x3_act_stats, which returns the RAW
    output plus its per-channel moments from the same VMEM pass (no separate
    stats read). In a chain (``pre``/``emit_raw``), this layer's BN normalize
    + ReLU is handed to the NEXT layer as ``pre=(scale, shift)`` and applied
    to its input tiles inside VMEM — the normalized activation never touches
    HBM. The math is identical to materializing (same bf16 rounding point);
    only var uses E[y^2]-mu^2 instead of two-pass.
    Param/batch_stats names: kernel, conv_bias?, scale, bias, mean, var."""

    features: int
    use_bias: bool = False  # conv bias (reference SepHead convs carry one)
    relu: bool = True
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    bwd: str = "auto"  # TPU backward routing: auto | pallas | xla

    @nn.compact
    def __call__(self, x, train: bool = False, pre=None, emit_raw: bool = False):
        from tdal.ops.pallas_conv import conv3x3_act_stats

        c = x.shape[-1]
        f = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, c, f))
        cbias = (
            self.param("conv_bias", nn.initializers.zeros, (f,))
            if self.use_bias
            else jnp.zeros((f,), jnp.float32)
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        gamma = self.param("scale", nn.initializers.ones, (f,))
        beta = self.param("bias", nn.initializers.zeros, (f,))
        xc = x.astype(self.dtype)
        wc = kernel.astype(self.dtype)
        if not train:
            # EVAL: XLA conv + folded affine. In-graph XLA fuses the whole
            # conv+BN+ReLU epilogue and overlaps across layers, beating the
            # opaque Pallas call at inference (measured: RPN eval 13.8ms XLA
            # vs 17.8ms Pallas). The Pallas kernel wins in TRAIN, where XLA's
            # conv backward reads with heavy amplification.
            from tdal.ops.pallas_conv import _xla_conv

            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * gamma
            shift = beta + (cbias - ra_mean.value) * inv
            xin = x
            if pre is not None:  # chained eval: apply predecessor's BN here
                xin = nn.relu(
                    xc * pre[0].astype(self.dtype) + pre[1].astype(self.dtype)
                )
            y = (
                _xla_conv(xin.astype(self.dtype), wc) * inv.astype(self.dtype)
                + shift.astype(self.dtype)
            )
            if emit_raw:
                # stay chainable: hand an identity post-affine to the caller
                ones = jnp.ones((f,), jnp.float32)
                zeros = jnp.zeros((f,), jnp.float32)
                return (y if self.relu else y), (ones, zeros)
            return nn.relu(y) if self.relu else y
        if emit_raw or pre is not None:
            # chained layers hand their ReLU to the next layer's input side
            assert self.relu, "chained FusedConvBN requires relu=True"
        if pre is None:
            in_scale = jnp.ones((c,), jnp.float32)
            in_shift = jnp.zeros((c,), jnp.float32)
        else:
            in_scale, in_shift = pre
        y, stats = conv3x3_act_stats(
            xc, wc, cbias, in_scale, in_shift, pre is not None, self.bwd
        )
        n = float(np.prod(y.shape[:-1]))
        mean = stats[0] / n
        var = jnp.maximum(stats[1] / n - mean * mean, 0.0)
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        shift = beta - mean * inv
        if emit_raw:
            return y, (inv, shift)
        y = y.astype(self.dtype) * inv.astype(self.dtype) + shift.astype(self.dtype)
        return nn.relu(y) if self.relu else y


class ConvBNReLU(nn.Module):
    """3x3 (default) Conv2d + BN + ReLU, NHWC.

    The 3x3 stride-1 case runs through FusedConvBN (Pallas conv, eval-time BN
    folding); strided/non-3x3 cases use nn.Conv + nn.BatchNorm."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, pre=None, emit_raw: bool = False):
        if self.kernel == 3 and self.stride == 1 and not self.use_bias:
            return FusedConvBN(
                self.features, momentum=self.momentum, epsilon=self.epsilon,
                dtype=self.dtype,
            )(x, train, pre=pre, emit_raw=emit_raw)
        assert pre is None and not emit_raw, "chaining needs the 3x3/s1 fused path"

        # Explicit symmetric padding k//2 (not "SAME"): the reference's strided
        # stage entry is ZeroPad2d(1) + Conv(stride, pad=0) (necks/rpn.py:126),
        # whose windows center on EVEN input pixels; "SAME" at stride 2 pads
        # (0, 1) and shifts every downsampled feature by one input pixel.
        # Identical for stride 1. Pinned by tests/test_torch_parity_detector.py.
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
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


class SubpixelDeconv(nn.Module):
    """k==s transposed conv as ONE MXU matmul + depth-to-space.

    With kernel_size == stride every input pixel independently emits an s x s
    output block, so the transposed conv is exactly a 1x1 conv to s*s*features
    channels followed by depth-to-space. XLA lowers nn.ConvTranspose to an
    input-dilated conv, which is slower on TPU at the RPN shapes (234^2x128 s2
    b2 bf16: fwd 12.7 -> 10.8 ms, wgrad 10.6 -> 5.1 ms; benchmarks/
    deconv_micro.py). Param path/shape match nn.ConvTranspose ("kernel",
    (s, s, cin, features)) so checkpoints are interchangeable; flax's
    ConvTranspose applies the kernel flipped, which we mirror."""

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.stride
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (s, s, cin, self.features),
        )
        wm = (
            jnp.flip(kernel, (0, 1))
            .astype(self.dtype)
            .transpose(2, 0, 1, 3)
            .reshape(cin, s * s * self.features)
        )
        y = x.reshape(b * h * w, cin) @ wm
        y = y.reshape(b, h, w, s, s, self.features)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, h * s, w * s, self.features
        )


class KSDeconv(nn.Module):
    """k==s transposed conv through tdal.ops.deconv.ks_deconv (XLA forward +
    dgrad, custom strided-slice MXU wgrad). Param tree matches
    nn.ConvTranspose ("kernel", (s, s, cin, features))."""

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tdal.ops.deconv import ks_deconv

        s = self.stride
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (s, s, x.shape[-1], self.features),
        )
        return ks_deconv(x.astype(self.dtype), kernel.astype(self.dtype), s)


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
            # Measured: SubpixelDeconv (matmul + depth-to-space) wins isolated
            # (benchmarks/deconv_micro.py) but LOSES integrated — PP train step
            # 102.5 -> 106.3 ms, predict 34.3 -> 35.8 ms b2 — because XLA fuses
            # BN/ReLU into the transposed conv but not across the 6D transpose.
            # ks_deconv keeps XLA's conv_transpose forward (same lowering as
            # nn.ConvTranspose -> epilogue fusion preserved) and its dgrad,
            # replacing only the slow input-dilated WGRAD with s^2 strided-
            # slice MXU contractions. Param tree matches nn.ConvTranspose.
            # named ConvTranspose_0 so the param path (and checkpoints) stay
            # identical to the nn.ConvTranspose it replaces
            x = KSDeconv(
                self.features, self.stride, dtype=self.dtype,
                name="ConvTranspose_0",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)

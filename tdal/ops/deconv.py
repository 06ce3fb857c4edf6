"""k==s transposed conv with a custom wgrad (TPU).

XLA's ConvTranspose weight-gradient lowers to an input-dilated convolution
that runs ~2x slower than necessary at the RPN deblock shapes (10.6 vs 5.1 ms
isolated at 234^2x128 s2, benchmarks/deconv_micro.py). With kernel_size ==
stride every output pixel (s*i+u, s*j+v) is produced by exactly one input
pixel (i, j), so dw factorizes into s^2 plain (BHW, Cin) x (BHW, Co) MXU
contractions over strided slices of the cotangent — no dilation.

The forward stays jax.lax.conv_transpose (identical lowering to flax
nn.ConvTranspose, so XLA's BN/ReLU epilogue fusion is preserved — the reason
SubpixelDeconv lost integrated, benchmarks/RESULTS.md), and dgrad reuses
XLA's autodiff. Parity: reference det3d/models/necks/rpn.py:80-110 deblocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _fwd(x, w, s):
    return jax.lax.conv_transpose(
        x, w, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ks_deconv(x, w, s: int):
    """x (B, H, W, Ci), w (s, s, Ci, Co) -> (B, H*s, W*s, Co)."""
    return _fwd(x, w, s)


def _ks_fwd(x, w, s):
    return _fwd(x, w, s), (x, w)


def _ks_bwd(s, res, g):
    x, w = res
    # dgrad through XLA's autodiff of the forward (its strided-conv dgrad is
    # already efficient; only the wgrad lowering is the problem)
    _, vjp_x = jax.vjp(lambda xx: _fwd(xx, w, s), x)
    (dx,) = vjp_x(g)
    b, h, wd, ci = x.shape
    co = g.shape[-1]
    gr = g.reshape(b, h, s, wd, s, co)
    xf = x.reshape(b * h * wd, ci)
    taps = []
    for u in range(s):
        for v in range(s):
            gs = gr[:, :, u, :, v, :].reshape(b * h * wd, co)
            taps.append(
                jax.lax.dot_general(
                    xf, gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    # conv_transpose applies the kernel mirrored: output offset (u, v) reads
    # w[s-1-u, s-1-v] -> scatter the taps back flipped.
    dw = jnp.stack(taps).reshape(s, s, ci, co)[::-1, ::-1]
    return dx.astype(x.dtype), dw.astype(w.dtype)


ks_deconv.defvjp(_ks_fwd, _ks_bwd)

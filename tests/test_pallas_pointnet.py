"""Parity tests for the fused Pallas Frustum-PointNet seg kernels (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdal.models.pointnet import PointNetSeg
from tdal.ops.pallas_pointnet import (
    fold_bn,
    fused_seg_encoder,
    fold_pointnet_seg_params,
    pointnet_seg_logits,
)


def test_fold_bn_matches_flax_eval():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 8))
    kernel = jax.random.normal(key, (8, 4))
    scale = jnp.abs(jax.random.normal(key, (4,))) + 0.5
    bias = jax.random.normal(key, (4,))
    mean = jax.random.normal(key, (4,))
    var = jnp.abs(jax.random.normal(key, (4,))) + 0.1
    w, b = fold_bn(kernel, None, scale, bias, mean, var)
    got = x @ w + b
    ref = ((x @ kernel) - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_seg_matches_flax():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (2, 512, 3))
    model = PointNetSeg()
    variables = model.init({"params": key}, pts, train=False)
    ref = model.apply(variables, pts, train=False)
    got = pointnet_seg_logits(
        variables["params"], variables["batch_stats"], pts, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=1e-3)


def test_fused_encoder_gmax_accumulates_across_tiles():
    """The per-set max must cover ALL point tiles (revisited-output accumulation)."""
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (1, 4096, 3))
    model = PointNetSeg()
    variables = model.init({"params": key}, pts, train=False)
    enc_w, enc_b, *_ = fold_pointnet_seg_params(
        variables["params"], variables["batch_stats"]
    )
    skip, gmax = fused_seg_encoder(pts, enc_w, enc_b, interpret=True)
    # oracle: dense forward of the encoder
    x = pts
    for i, (w, b) in enumerate(zip(enc_w, enc_b)):
        x = jnp.maximum(x @ w + b, 0.0)
        if i == 1:
            # bf16 matmul operands: ~0.8% relative rounding vs the fp32 oracle
            np.testing.assert_allclose(
                np.asarray(skip), np.asarray(x), atol=3e-2, rtol=2e-2
            )
    np.testing.assert_allclose(
        np.asarray(gmax), np.asarray(x.max(axis=1)), atol=3e-1, rtol=2e-2
    )

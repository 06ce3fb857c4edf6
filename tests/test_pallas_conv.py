"""conv3x3_bias custom-VJP correctness (CPU fallback path; the Pallas TPU path
is numerically checked on hardware in benchmarks/proto_pallas_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdal.ops.pallas_conv import _xla_conv, conv3x3, conv3x3_bias


def test_forward_matches_lax_conv():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 37, 41, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 24)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (24,)) * 0.1
    np.testing.assert_allclose(
        conv3x3_bias(x, w, b), _xla_conv(x, w) + b, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(conv3x3(x, w), _xla_conv(x, w), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 21, 19, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 12)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (12,)) * 0.1

    def loss_c(x, w, b):
        return jnp.sum(jnp.tanh(conv3x3_bias(x, w, b)))

    def loss_r(x, w, b):
        return jnp.sum(jnp.tanh(_xla_conv(x, w) + b))

    gc = jax.grad(loss_c, (0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, (0, 1, 2))(x, w, b)
    for a, r in zip(gc, gr):
        np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-5)


def test_pallas_conv_module_params_match_nn_conv():
    """PallasConv3x3 exposes nn.Conv-shaped params and the same math."""
    import flax.linen as nn

    from tdal.models.layers import PallasConv3x3

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 8))
    mod = PallasConv3x3(12, use_bias=True)
    vs = mod.init(key, x)
    assert vs["params"]["kernel"].shape == (3, 3, 8, 12)
    assert vs["params"]["bias"].shape == (12,)
    ref = nn.Conv(12, (3, 3), padding="SAME", use_bias=True)
    out_ref = ref.apply({"params": vs["params"]}, x)
    np.testing.assert_allclose(mod.apply(vs, x), out_ref, rtol=1e-5, atol=1e-5)


def test_fused_conv_bn_matches_reference_composition():
    """FusedConvBN == nn.Conv -> nn.BatchNorm -> relu in BOTH modes, including
    running-stat updates and the eval-time folding."""
    import flax.linen as nn

    from tdal.models.layers import FusedConvBN

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 8))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(12, (3, 3), padding="SAME", use_bias=True)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3
            )(x)
            return nn.relu(x)

    fused = FusedConvBN(12, use_bias=True)
    fv = fused.init(key, x, False)
    ref = Ref()
    rv = ref.init(key, x, False)
    # graft fused params onto the reference layout
    rp = {
        "Conv_0": {"kernel": fv["params"]["kernel"], "bias": fv["params"]["conv_bias"]},
        "BatchNorm_0": {"scale": fv["params"]["scale"], "bias": fv["params"]["bias"]},
    }
    rbs = {"BatchNorm_0": {"mean": fv["batch_stats"]["mean"],
                           "var": fv["batch_stats"]["var"]}}

    # train mode: same outputs AND same updated running stats
    yf, updf = fused.apply(fv, x, True, mutable=["batch_stats"])
    yr, updr = ref.apply({"params": rp, "batch_stats": rbs}, x, True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updf["batch_stats"]["mean"]),
        np.asarray(updr["batch_stats"]["BatchNorm_0"]["mean"]), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(updf["batch_stats"]["var"]),
        np.asarray(updr["batch_stats"]["BatchNorm_0"]["var"]), rtol=1e-5, atol=1e-6,
    )

    # eval mode with nontrivial running stats: the folded affine must match
    fv2 = {"params": fv["params"], "batch_stats": {
        "mean": jnp.linspace(-1, 1, 12), "var": jnp.linspace(0.5, 2, 12)}}
    rbs2 = {"BatchNorm_0": {"mean": fv2["batch_stats"]["mean"],
                            "var": fv2["batch_stats"]["var"]}}
    ye_f = fused.apply(fv2, x, False)
    ye_r = ref.apply({"params": rp, "batch_stats": rbs2}, x, False)
    np.testing.assert_allclose(np.asarray(ye_f), np.asarray(ye_r), rtol=1e-5, atol=1e-5)


def test_conv3x3_act_stats_grads_match_autodiff():
    """The cross-layer fused-BN op's custom VJP (input-side affine+ReLU, fused
    output moments) == plain autodiff through the composite, for all five
    differentiable inputs, chained (in_act=True) and unchained."""
    import jax
    import jax.numpy as jnp

    from tdal.ops.pallas_conv import _xla_conv, conv3x3_act_stats

    rng = np.random.default_rng(0)
    B, H, W, C, Co = 2, 8, 9, 5, 7
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, Co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 2.0, C).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    def ref(x, w, b, s, t, in_act):
        xin = jnp.maximum(x * s + t, 0.0) if in_act else x
        y = _xla_conv(xin, w) + b
        stats = jnp.stack([y.sum((0, 1, 2)), (y * y).sum((0, 1, 2))])
        return y, stats

    wy = jnp.arange(B * H * W * Co, dtype=jnp.float32).reshape(B, H, W, Co)
    ws = jnp.array([[1.7], [0.3]])
    for in_act in (False, True):
        def loss(f):
            def inner(x, w, b, s, t):
                y, st = f(x, w, b, s, t, in_act)
                return (y * wy).sum() + (st * ws).sum()
            return inner

        g1 = jax.grad(loss(conv3x3_act_stats), argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
        g2 = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-4 * float(np.max(np.abs(bb)) + 1)
            )


def test_in_act_halo_is_zero_on_tpu():
    """TPU-only regression test: the Pallas in_act path must treat the padded
    halo as ZERO in the materialized-activation semantics (relu(x*s+t) padded
    with zeros), not apply the affine to padded zeros (relu(t) leakage).

    Caught on hardware round 3: border outputs were off by O(shift) and BN
    stats by 17% before the per-tap in-bounds masks (benchmarks/halo_check.py).
    Skips off-TPU (the XLA fallback applies the affine pre-pad, which is the
    reference semantics by construction)."""
    import pytest

    from tdal.ops.pallas_conv import _use_pallas, conv3x3_act_stats

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    b = jnp.zeros((64,), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    t = jnp.asarray(np.abs(rng.normal(size=64)) + 0.5, jnp.float32)  # positive shifts
    if not _use_pallas(x, 64):
        pytest.skip("Pallas path requires a TPU backend")

    def ref(x, w, b, s, t):
        xin = jnp.maximum(x.astype(jnp.float32) * s + t, 0.0).astype(x.dtype)
        y = _xla_conv(xin, w) + b.astype(x.dtype)
        yf = y.astype(jnp.float32)
        return y, jnp.stack([yf.sum((0, 1, 2)), (yf * yf).sum((0, 1, 2))])

    yp, stp = jax.jit(lambda *a: conv3x3_act_stats(*a, True))(x, w, b, s, t)
    yr, str_ = jax.jit(ref)(x, w, b, s, t)
    np.testing.assert_allclose(
        np.asarray(yp, np.float32), np.asarray(yr, np.float32), atol=0.07
    )
    np.testing.assert_allclose(
        np.asarray(stp), np.asarray(str_), rtol=1e-4
    )

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

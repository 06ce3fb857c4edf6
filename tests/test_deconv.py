"""ks_deconv (k==s transposed conv with custom strided-slice wgrad) parity."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.ops.deconv import _fwd, ks_deconv


@pytest.mark.parametrize("s", [2, 4])
def test_ks_deconv_matches_flax_and_autodiff(s):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 6)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(s, s, 6, 5)), jnp.float32)
    mod = nn.ConvTranspose(5, (s, s), strides=(s, s), use_bias=False, padding="SAME")
    yf = mod.apply({"params": {"kernel": w}}, x)
    np.testing.assert_allclose(
        np.asarray(ks_deconv(x, w, s)), np.asarray(yf), rtol=1e-5, atol=1e-5
    )
    cot = jnp.asarray(rng.normal(size=yf.shape), jnp.float32)
    gk = jax.grad(lambda x, w: (ks_deconv(x, w, s) * cot).sum(), (0, 1))(x, w)
    gr = jax.grad(lambda x, w: (_fwd(x, w, s) * cot).sum(), (0, 1))(x, w)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ks_deconv_module_param_tree():
    """KSDeconv registers ConvTranspose_0-compatible params inside DeconvBNReLU."""
    from tdal.models.layers import DeconvBNReLU

    mod = DeconvBNReLU(8, stride=2)
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 4)), True)
    assert v["params"]["ConvTranspose_0"]["kernel"].shape == (2, 2, 4, 8)

"""Layer-level numeric pins: SubpixelDeconv vs flax ConvTranspose."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.models.layers import SubpixelDeconv


@pytest.mark.parametrize("stride,cin", [(2, 8), (4, 16)])
def test_subpixel_deconv_matches_conv_transpose(stride, cin):
    """k==s transposed conv == matmul + depth-to-space, with the SAME kernel
    param (path "kernel", shape (s, s, cin, cout)) — checkpoints interchange."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, cin)), jnp.float32)
    ref = nn.ConvTranspose(
        12, (stride, stride), strides=(stride, stride), use_bias=False
    )
    vs = ref.init(jax.random.PRNGKey(0), x)
    sub = SubpixelDeconv(12, stride)
    y_ref = ref.apply(vs, x)
    y_sub = sub.apply(vs, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sub), rtol=1e-5, atol=1e-5)

    # gradients agree too (the train path uses the matmul formulation's VJP)
    g_ref = jax.grad(lambda p: (ref.apply(p, x) ** 2).sum())(vs)
    g_sub = jax.grad(lambda p: (sub.apply(p, x) ** 2).sum())(vs)
    np.testing.assert_allclose(
        np.asarray(g_ref["params"]["kernel"]),
        np.asarray(g_sub["params"]["kernel"]),
        rtol=1e-4, atol=1e-4,
    )

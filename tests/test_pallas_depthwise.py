"""Pallas depthwise 7x7 kernel (opt-in experiment; measured slower than
XLA on v5e — see docs/benchmarks.md round-3 notes). Numerics vs the
grouped-conv reference across the ConvNeXt stage shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.nn.layers import Conv2D
from ics_tpu.ops.pallas_depthwise import depthwise_conv


@pytest.mark.parametrize("c,hw", [(96, 56), (192, 28), (384, 14), (768, 7)])
def test_matches_grouped_conv(c, hw):
    conv = Conv2D(c, c, 7, 1, padding="SAME", groups=c, use_bias=True)
    params = conv.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(c)
    params["b"] = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, c)), jnp.float32)
    ref = conv.apply(params, x)
    out = depthwise_conv(x, params["w"], params["b"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5
    )


def test_no_bias():
    conv = Conv2D(64, 64, 3, 1, padding="SAME", groups=64, use_bias=False)
    params = conv.init(jax.random.PRNGKey(2))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 8, 64)), jnp.float32
    )
    ref = conv.apply(params, x)
    out = depthwise_conv(x, params["w"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5
    )

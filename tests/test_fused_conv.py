"""Fused conv3x3+BN+ReLU Pallas kernel vs the XLA oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from unet_torch_tpu.kernels.fused_conv import (
    fold_bn,
    fused_conv3x3_bn_relu_pallas,
    fused_conv3x3_bn_relu_reference,
)


@pytest.mark.parametrize("shape", [(2, 16, 32, 8), (1, 13, 16, 4)])
def test_fused_conv_matches_xla(shape):
    rng = np.random.RandomState(0)
    b, h, w, cin = shape
    cout = 8
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(cout), jnp.float32)
    mean = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    var = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    scale, bias = fold_bn(gamma, beta, mean, var)

    ref = fused_conv3x3_bn_relu_reference(x, k, scale, bias)
    out = fused_conv3x3_bn_relu_pallas(x, k, scale, bias, th=4,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 16, 32, 8), (1, 13, 16, 4)])
def test_fused_conv_v2_matches_xla(shape):
    from unet_torch_tpu.kernels.fused_conv import fused_conv3x3_bn_relu_pallas_v2

    rng = np.random.RandomState(1)
    b, h, w, cin = shape
    cout = 8
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    ref = fused_conv3x3_bn_relu_reference(x, k, scale, bias)
    out = fused_conv3x3_bn_relu_pallas_v2(x, k, scale, bias, th=4,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

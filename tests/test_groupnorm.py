"""Fused GroupNorm+SiLU kernel parity (interpret mode) vs the XLA reference
and vs the flax GroupNorm module used in the models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.models.layers import GroupNorm
from sketch2img_tpu.ops import groupnorm as gnops


@pytest.fixture(autouse=True)
def interpret():
    gnops.set_interpret_mode(True)
    yield
    gnops.set_interpret_mode(False)


@pytest.mark.parametrize("shape,groups", [
    ((1, 8, 8, 128), 32),
    ((2, 4, 8, 256), 32),
    ((1, 16, 16, 128), 16),
])
def test_kernel_matches_xla(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    scale = jnp.asarray(rng.randn(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.randn(shape[-1]), jnp.float32)
    assert gnops.supported(x, groups)
    got = gnops._fused(x, scale, bias, groups, 1e-5, True)
    want = gnops._xla_reference(x, scale, bias, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matches_flax_module():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(128), jnp.float32)
    gn = GroupNorm(32, 1e-5)
    variables = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    want = nn.silu(gn.apply(variables, x))
    got = gnops.fused_groupnorm_silu(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_xla():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(128), jnp.float32)

    def lf(x, s, b):
        return jnp.sum(gnops._fused(x, s, b, 32, 1e-5, True) ** 2)

    def lx(x, s, b):
        return jnp.sum(gnops._xla_reference(x, s, b, 32, 1e-5, True) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(lx, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_unsupported_shapes_fall_back():
    x = jnp.zeros((1, 4, 4, 96))  # 96 not lane-aligned
    out = gnops.fused_groupnorm_silu(x, jnp.ones(96), jnp.zeros(96), 32)
    assert out.shape == x.shape

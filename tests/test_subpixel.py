"""Subpixel upsample-conv equivalence: the phase-decomposed lowering must
match nearest-repeat + SAME conv3x3 (values and gradients) — the composite
the reference's up path computes (diffusers Upsample2D use_conv=True,
consumed via SURVEY.md D1/D2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.ops.subpixel import upsample2x_conv3x3

SHAPES = [
    # (B, H, W, Cin, Cout) — source resolution before the 2x upsample
    (1, 8, 8, 96, 96),     # up_0-like
    (2, 16, 16, 64, 32),   # up_1-like, channel change
    (1, 4, 4, 8, 16),      # tiny (boundary rows/cols dominate)
    (1, 1, 1, 8, 8),       # degenerate 1x1 source: all taps are pads
    (2, 5, 3, 16, 8),      # odd, non-square
]


@pytest.mark.parametrize("shape", SHAPES)
def test_subpixel_matches_naive(shape):
    b, h, w, cin, cout = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (b, h, w, cin))
    wt = jax.random.normal(kw, (3, 3, cin, cout)) * 0.05
    bias = jnp.linspace(-1.0, 1.0, cout)
    want = upsample2x_conv3x3(x, wt, bias, backend="naive")
    got = upsample2x_conv3x3(x, wt, bias, backend="subpixel")
    assert got.shape == (b, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_subpixel_gradients_match_naive():
    """The guided vjp differentiates through the up-path convs."""
    b, h, w, cin, cout = 1, 8, 8, 32, 16
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (b, h, w, cin))
    wt = jax.random.normal(kw, (3, 3, cin, cout)) * 0.05
    bias = jnp.zeros((cout,))

    def loss(be):
        def f(x, wt, bias):
            y = upsample2x_conv3x3(x, wt, bias, backend=be)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f, argnums=(0, 1, 2))(x, wt, bias)

    for g, w_ in zip(loss("subpixel"), loss("naive")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=3e-5, atol=3e-5)


def test_upsample_module_uses_subpixel_and_keeps_param_paths():
    """models.layers.Upsample must keep the conv/kernel checkpoint path the
    torch converter targets, and compute the same values as the old
    repeat+conv formulation."""
    from sketch2img_tpu.models.layers import Upsample

    m = Upsample(16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8))
    variables = m.init(jax.random.PRNGKey(3), x)
    assert variables["params"]["conv"]["kernel"].shape == (3, 3, 8, 16)
    assert variables["params"]["conv"]["bias"].shape == (16,)
    got = m.apply(variables, x)
    want = upsample2x_conv3x3(
        x, variables["params"]["conv"]["kernel"],
        variables["params"]["conv"]["bias"], backend="naive")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(1, 5, 7, 6, 4), (2, 8, 8, 8, 3),
                                   (1, 1, 1, 4, 2)])
def test_conv_transpose_phase_decomposition(shape):
    """conv_transpose4x4_s2 must match nn.ConvTranspose(k4, s2, p1,
    transpose_kernel=True) — the anime2sketch decoder op — values and
    gradients."""
    import flax.linen as nn
    from sketch2img_tpu.ops.subpixel import conv_transpose4x4_s2

    class M(nn.Module):
        co: int

        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(
                self.co, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                transpose_kernel=True, use_bias=True, name="upconv")(x)

    from sketch2img_tpu.ops import subpixel

    b, h, w, ci, co = shape
    m = M(co)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci))
    v = m.init(jax.random.PRNGKey(1), x)
    k, bias = v["params"]["upconv"]["kernel"], v["params"]["upconv"]["bias"]
    want = m.apply(v, x)
    for be in ("xla", "phase"):
        subpixel.set_conv_transpose_backend(be)
        try:
            got = conv_transpose4x4_s2(x, k, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
            g_got = jax.grad(lambda x: jnp.sum(jnp.sin(
                conv_transpose4x4_s2(x, k, bias))))(x)
            g_want = jax.grad(lambda x: jnp.sum(jnp.sin(m.apply(v, x))))(x)
            np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                       rtol=3e-5, atol=3e-5)
        finally:
            subpixel.set_conv_transpose_backend("xla")

"""conv3x3 lowering equivalence: every backend must match XLA's conv
(values and gradients) for all UNet/VAE shape regimes the dispatch covers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.ops.conv2d import Conv3x3, _pick_backend, conv3x3

SHAPES = [
    # (B, H, W, Cin, Cout, stride, padding)
    (2, 16, 16, 96, 128, 1, ((1, 1), (1, 1))),   # im2col regime
    (2, 8, 8, 128, 128, 1, ((1, 1), (1, 1))),    # im2col regime
    (1, 32, 32, 96, 96, 1, ((1, 1), (1, 1))),    # shift9 regime
    (2, 16, 16, 96, 96, 2, ((1, 1), (1, 1))),    # strided (xla)
    (1, 17, 17, 8, 8, 2, ((0, 1), (0, 1))),      # VAE asymmetric downsample
    (1, 8, 8, 4, 32, 1, ((1, 1), (1, 1))),       # tiny channels (conv_in-like)
]


@pytest.mark.parametrize("backend", ["im2col", "shift9"])
@pytest.mark.parametrize("shape", SHAPES)
def test_backend_matches_xla(backend, shape):
    b, h, w, cin, cout, stride, pad = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (b, h, w, cin))
    wt = jax.random.normal(kw, (3, 3, cin, cout)) * 0.05
    want = conv3x3(x, wt, stride=stride, padding=pad, backend="xla")
    got = conv3x3(x, wt, stride=stride, padding=pad, backend=backend)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("backend", ["im2col", "shift9", "auto"])
def test_backend_gradients_match_xla(backend):
    """The guided pipeline differentiates through every conv (pipeline vjp);
    gradients w.r.t. input and kernel must match the XLA lowering."""
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (1, 16, 16, 96))
    wt = jax.random.normal(kw, (3, 3, 96, 64)) * 0.05
    ct = jax.random.normal(kg, (1, 16, 16, 64))

    def loss(be):
        def f(x, wt):
            return jnp.sum(conv3x3(x, wt, backend=be) * ct)
        return jax.grad(f, argnums=(0, 1))(x, wt)

    gx_want, gw_want = loss("xla")
    gx, gw = loss(backend)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_want),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_table():
    assert _pick_backend(1, 8, 8, 1280, 1280, 1) == "im2col"     # 64 rows
    assert _pick_backend(2, 16, 16, 2560, 1280, 1) == "im2col"   # 512 rows
    assert _pick_backend(4, 16, 16, 1280, 1280, 1) == "shift9"   # 1024 rows
    assert _pick_backend(2, 32, 32, 640, 640, 1) == "shift9"
    assert _pick_backend(1, 64, 64, 320, 320, 1) == "shift9"
    assert _pick_backend(4, 64, 64, 320, 320, 1) == "xla"        # 16384 rows
    assert _pick_backend(1, 64, 64, 320, 320, 2) == "xla"    # strided
    assert _pick_backend(1, 64, 64, 4, 320, 1) == "xla"      # tiny channels
    assert _pick_backend(1, 512, 512, 128, 128, 1) == "xla"  # VAE resolution
    # large batch: XLA conv reaches ~100% MFU, alternates lose
    assert _pick_backend(16, 16, 16, 1280, 1280, 1) == "xla"
    assert _pick_backend(8, 8, 8, 1280, 1280, 1) == "xla"


def test_module_param_layout_matches_nn_conv():
    """Conv3x3 must expose the exact nn.Conv param tree (kernel HWIO, bias)
    so the torch checkpoint converters keep working unchanged."""
    import flax.linen as nn

    m = Conv3x3(24)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 12)))
    ref = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1))).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 12))
    )
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    want_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    assert got_shapes == want_shapes, (got_shapes, want_shapes)

    # loading nn.Conv-trained params into Conv3x3 gives identical outputs
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 12))
    want = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1))).apply(ref, x)
    got = m.apply(ref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pad", [((1, 1), (1, 1)), ((0, 1), (0, 1))])
@pytest.mark.parametrize("shape", [(2, 16, 16, 32, 64), (1, 8, 8, 16, 16)])
def test_down2_custom_vjp_matches_xla(pad, shape):
    """The stride-2 downsample's phase-decomposed dx (auto dispatch) must
    match XLA conv autodiff — both UNet SAME pad and VAE asymmetric pad."""
    b, h, w, cin, cout = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (b, h, w, cin))
    wt = jax.random.normal(kw, (3, 3, cin, cout)) * 0.05

    def loss(be):
        def f(x, wt):
            y = conv3x3(x, wt, stride=2, padding=pad, backend=be)
            return jnp.sum(jnp.sin(y)), y
        (l, y), g = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(x, wt)
        return y, g

    y_auto, g_auto = loss("auto")
    y_xla, g_xla = loss("xla")
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)
    for ga, gx in zip(g_auto, g_xla):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gx),
                                   rtol=3e-5, atol=3e-5)

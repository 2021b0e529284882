"""Serving-mode parameter cast (utils/params.cast_float_params) and the
norm-input barrier hook: numerics must stay within bf16 tolerance of the
fp32-param baseline (reference analog: demos load fp16 weights, app.py:29-43).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.models.layers import set_norm_input_barrier
from sketch2img_tpu.models.unet import UNet2DCondition, UNetConfig
from sketch2img_tpu.utils.params import cast_float_params


def _mini_cfg():
    return UNetConfig(
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=2,
        cross_attn=(True, False),
        num_heads=2,
        cross_attention_dim=24,
    )


def test_cast_float_params_leaves():
    tree = {
        "w": jnp.ones((3, 3), jnp.float32),
        "step": jnp.asarray(7, jnp.int32),
        "nested": {"b": jnp.zeros((4,), jnp.float32)},
    }
    out = cast_float_params(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["nested"]["b"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32  # untouched


@pytest.fixture
def tiny_unet():
    cfg = _mini_cfg()
    unet = UNet2DCondition(cfg, compute_dtype=jnp.bfloat16)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 24)),
    )["params"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.asarray([100, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24)) * 0.1
    return unet, params, (x, t, ctx)


def test_cast_params_unet_close(tiny_unet):
    unet, params, args = tiny_unet
    want = np.asarray(unet.apply({"params": params}, *args), np.float32)
    got = np.asarray(
        unet.apply({"params": cast_float_params(params)}, *args), np.float32
    )
    # params were already consumed at bf16 compute; rounding them once more
    # shifts outputs by at most a few bf16 ulps
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_norm_barrier_is_identity(tiny_unet):
    unet, params, args = tiny_unet
    base = np.asarray(unet.apply({"params": params}, *args), np.float32)
    set_norm_input_barrier(True)
    try:
        got = np.asarray(unet.apply({"params": params}, *args), np.float32)
    finally:
        set_norm_input_barrier(False)
    np.testing.assert_allclose(got, base, rtol=2e-2, atol=2e-2)

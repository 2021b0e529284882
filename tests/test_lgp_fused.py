"""Fused (native-resolution) LGP head must equal the naive
concat_taps -> LatentEdgePredictor path exactly (fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.models.lgp import LatentEdgePredictor, lgp_fused_apply
from sketch2img_tpu.models.unet import TAP_NAMES, concat_taps


@pytest.fixture(scope="module")
def setup():
    # tap channel layout of the tiny 4-block config: 480 channels total
    dims = {"down_0": 32, "down_1": 32, "down_2": 64,
            "mid_attn": 64, "mid_res_0": 64, "mid_res_1": 64,
            "up_0": 64, "up_1": 64, "up_2": 32}
    sizes = {"down_0": 8, "down_1": 4, "down_2": 2,
             "mid_attn": 2, "mid_res_0": 2, "mid_res_1": 2,
             "up_0": 4, "up_1": 8, "up_2": 16}
    total = sum(dims.values())
    lgp = LatentEdgePredictor(input_dim=total + 4 + 36, output_dim=4, num_layers=9)
    variables = lgp.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, total)), jnp.zeros((1, 16, 16, 4)),
                         train=False)
    # non-trivial BN stats
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.25 * jnp.arange(x.size).reshape(x.shape).astype(x.dtype) / x.size,
        variables,
    )
    rng = np.random.RandomState(0)
    taps = {
        name: jnp.asarray(rng.randn(2, sizes[name], sizes[name], dims[name]),
                          jnp.float32)
        for name in TAP_NAMES
    }
    nl = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    return lgp, variables, taps, nl


def test_fused_matches_naive(setup):
    lgp, variables, taps, nl = setup
    feats = concat_taps(taps, 16, 16)
    want = lgp.apply(variables, feats, nl, train=False)
    got = lgp_fused_apply(variables, taps, nl, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradient_matches_naive(setup):
    """The guided loop differentiates through the LGP w.r.t. the taps."""
    lgp, variables, taps, nl = setup

    def loss_naive(taps):
        feats = concat_taps(taps, 16, 16)
        return jnp.mean(lgp.apply(variables, feats, nl, train=False) ** 2)

    def loss_fused(taps):
        return jnp.mean(lgp_fused_apply(variables, taps, nl, 16, 16) ** 2)

    gn = jax.grad(loss_naive)(taps)
    gf = jax.grad(loss_fused)(taps)
    for name in TAP_NAMES:
        np.testing.assert_allclose(np.asarray(gf[name]), np.asarray(gn[name]),
                                   rtol=1e-3, atol=1e-6, err_msg=name)

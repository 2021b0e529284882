"""Sketch-variant injection-state construction (set_res_samples parity,
sketch_guided_attn.py:29-44) and end-to-end injected forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.models.injection import build_sketch_injection_states
from sketch2img_tpu.models.unet import (
    SD15_CONFIG,
    UNet2DCondition,
    UNetConfig,
    num_transformer_blocks,
    transformer_block_dims,
)


def _fake_residuals(config, b=1, latent=16):
    """Shapes of down_residuals output without running a model."""
    out = []
    size = latent
    n = len(config.block_out_channels)
    for i, (ch, ca) in enumerate(zip(config.block_out_channels, config.cross_attn)):
        res = tuple(
            jnp.full((b, size, size, ch), float(i * 10 + j))
            for j in range(config.layers_per_block)
        )
        if i < n - 1:
            size //= 2
            res += (jnp.full((b, size, size, ch), float(i * 10 + 9)),)
        out.append(res)
    return out


def test_sd15_state_dims_consume_all_features():
    res = _fake_residuals(SD15_CONFIG, latent=16)
    states = build_sketch_injection_states(SD15_CONFIG, res)
    dims = transformer_block_dims(SD15_CONFIG)
    assert len(states) == num_transformer_blocks(SD15_CONFIG) == 16
    for s, want in zip(states, dims):
        assert s.ndim == 3 and s.shape[-1] == want
    # literal reference ordering holds wherever it type-checks: the six down
    # blocks get (r0, r1) pairs of their own stage
    assert float(states[0][0, 0, 0]) == 0.0    # b0 r0
    assert float(states[1][0, 0, 0]) == 1.0    # b0 r1
    assert float(states[2][0, 0, 0]) == 10.0   # b1 r0
    assert float(states[5][0, 0, 0]) == 21.0   # b2 r1
    # mid block gets the first reversed-up feature (b2 r1), as in the reference
    assert float(states[6][0, 0, 0]) == 21.0


def test_injected_forward_with_built_states():
    cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, True),
                     num_heads=2, cross_attention_dim=24, layers_per_block=1,
                     injection="sketch")
    base_cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, True),
                          num_heads=2, cross_attention_dim=24, layers_per_block=1)
    unet = UNet2DCondition(cfg)
    sketch_enc = UNet2DCondition(base_cfg)  # plain UNet params, down half only

    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([3])
    ctx = jnp.ones((1, 7, 24))
    enc_params = sketch_enc.init(jax.random.PRNGKey(0), x, t, ctx)
    res = sketch_enc.apply(enc_params, x, t, ctx,
                           method=UNet2DCondition.down_residuals)
    states = build_sketch_injection_states(cfg, res)
    assert len(states) == num_transformer_blocks(cfg)

    variables = unet.init(jax.random.PRNGKey(1), x, t, ctx,
                          injection_states=states, injection_scale=0.7)
    eps = unet.apply(variables, x, t, ctx,
                     injection_states=states, injection_scale=0.7)
    assert eps.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(eps)).all()

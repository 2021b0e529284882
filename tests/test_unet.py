"""UNet golden parity vs the torch mirror, including hook-vs-taps semantics
(the functional replacement for hook_unet, latent_predictor.py:47-80)."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.core.convert import convert_torch_unet  # noqa: E402
from sketch2img_tpu.models.unet import (  # noqa: E402
    SD15_CONFIG,
    TAP_NAMES,
    UNet2DCondition,
    UNetConfig,
    concat_taps,
    num_transformer_blocks,
    transformer_block_dims,
)

from torch_sd_mirror import TorchMiniUNet  # noqa: E402


def _mini_cfg(**kw):
    base = dict(
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=2,
        cross_attn=(True, False),
        num_heads=2,
        cross_attention_dim=24,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_parity_two_blocks():
    torch.manual_seed(0)
    cfg = _mini_cfg()
    golden = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=(32, 64), layers=2, cross=(True, False),
        context_dim=24, heads=2,
    ).eval()
    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([100, 700])
    ctx = torch.randn(2, 7, 24)
    with torch.no_grad():
        want = golden(x, t, ctx).numpy()

    params = convert_torch_unet(golden.state_dict(), cfg)
    unet = UNet2DCondition(cfg)
    apply = jax.jit(functools.partial(unet.apply, {"params": params}))
    got = np.asarray(
        apply(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(t.numpy()),
              jnp.asarray(ctx.numpy()))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_taps_match_torch_hooks():
    """Register reference-style forward hooks on the torch mirror and compare
    against capture_taps outputs (hook_unet order + content,
    latent_predictor.py:47-80)."""
    torch.manual_seed(2)
    block_out = (32, 32, 64, 64)
    cross = (True, True, True, False)
    golden = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=block_out, layers=2, cross=cross,
        context_dim=24, heads=2, groups=32,
    ).eval()
    cfg = _mini_cfg(block_out_channels=block_out, cross_attn=cross)

    captured = {}

    def mk_hook(name):
        def hook(module, inputs, output):
            if isinstance(output, tuple):
                output = output[0]
            captured[name] = output.float().detach()
        return hook

    # hook_unet parity: down_blocks[0..2], mid attentions+resnets, up_blocks[0..2]
    for idx in (0, 1, 2):
        golden.down_blocks[idx].register_forward_hook(mk_hook(f"down_{idx}"))
    golden.mid_block.attentions[0].register_forward_hook(mk_hook("mid_attn"))
    golden.mid_block.resnets[0].register_forward_hook(mk_hook("mid_res_0"))
    golden.mid_block.resnets[1].register_forward_hook(mk_hook("mid_res_1"))
    for idx in (0, 1, 2):
        golden.up_blocks[idx].register_forward_hook(mk_hook(f"up_{idx}"))

    x = torch.randn(1, 4, 16, 16)
    t = torch.tensor([300])
    ctx = torch.randn(1, 7, 24)
    with torch.no_grad():
        want_eps = golden(x, t, ctx).numpy()

    # DownBlock hooks capture the (sample, res) tuple -> output[0] = sample
    # after the downsampler; UpBlock output is after the upsampler.
    params = convert_torch_unet(golden.state_dict(), cfg)
    unet = UNet2DCondition(cfg)
    eps, taps = unet.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
        capture_taps=True,
    )
    np.testing.assert_allclose(
        np.asarray(eps).transpose(0, 3, 1, 2), want_eps, rtol=1e-3, atol=2e-4
    )
    assert set(taps.keys()) == set(TAP_NAMES)
    for name in TAP_NAMES:
        got = np.asarray(taps[name]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(
            got, captured[name].numpy(), rtol=1e-3, atol=2e-4, err_msg=name
        )

    # concat order = reference feature_blocks order; channel sum parity
    cat = concat_taps(taps, 16, 16)
    want_ch = sum(captured[n].shape[1] for n in TAP_NAMES)
    assert cat.shape == (1, 16, 16, want_ch)


def test_sd15_tap_channel_arithmetic():
    """SD1.5 taps must concat to 9280 channels: +4 noise +36 pos-enc = 9320
    (app.py:67, SURVEY.md §6)."""
    cfg = SD15_CONFIG
    ch = cfg.block_out_channels
    down = [ch[0], ch[1], ch[2]]
    mid = [ch[3]] * 3
    up = [ch[3], ch[3], ch[1]]  # up block outputs: 1280, 1280, 640
    assert sum(down + mid + up) == 9280


def test_injection_state_bookkeeping():
    cfg = _mini_cfg(block_out_channels=(32, 32, 64, 64), cross_attn=(True, True, True, False))
    assert num_transformer_blocks(cfg) == 6 + 1 + 9
    dims = transformer_block_dims(cfg)
    # up side: rev channels (64,64,32,32) with rev cross (F,T,T,T) ->
    # BTBs at 64 (up1), 32 (up2), 32 (up3), 3 each
    assert dims == [32, 32, 32, 32, 64, 64] + [64] + [64, 64, 64, 32, 32, 32, 32, 32, 32]


@pytest.mark.parametrize("variant", ["clip", "sketch"])
def test_injection_variants_forward(variant):
    cfg = _mini_cfg(injection=variant, injection_context_dim=16)
    unet = UNet2DCondition(cfg)
    n_blocks = num_transformer_blocks(cfg)
    dims = transformer_block_dims(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([10, 20])
    ctx = jnp.zeros((2, 7, 24))
    if variant == "clip":
        states = [jnp.zeros((2, 5, 16))] * n_blocks
    else:
        states = [jnp.zeros((2, 9, d)) for d in dims]
    variables = unet.init(
        jax.random.PRNGKey(0), x, t, ctx,
        injection_states=states, injection_scale=0.5,
    )
    eps = unet.apply(variables, x, t, ctx, injection_states=states, injection_scale=0.5)
    assert eps.shape == (2, 8, 8, 4)
    # injection params exist
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("sketch_attn" in n for n in names)
    # base (no-injection) graph has no injection params
    base = UNet2DCondition(_mini_cfg())
    bvars = base.init(jax.random.PRNGKey(0), x, t, ctx)
    bflat = jax.tree_util.tree_leaves_with_path(bvars["params"])
    bnames = {"/".join(str(p) for p in path) for path, _ in bflat}
    assert not any("sketch" in n for n in bnames)


def test_down_residuals_matches_full_forward_params():
    """down_residuals (the SketchEncoder) reuses the same down-half params."""
    cfg = _mini_cfg()
    unet = UNet2DCondition(cfg)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jnp.ones((1, 7, 24))
    variables = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    res = unet.apply(variables, x, t, ctx, method=UNet2DCondition.down_residuals)
    assert len(res) == 2
    assert len(res[0]) == 3  # 2 resnets + downsample
    assert len(res[1]) == 2  # 2 resnets, no downsample on last block
    assert res[0][0].shape == (1, 8, 8, 32)
    assert res[0][2].shape == (1, 4, 4, 32)
    assert res[1][1].shape == (1, 4, 4, 64)


def test_remat_output_matches():
    import dataclasses

    cfg = _mini_cfg()
    cfg_r = dataclasses.replace(cfg, remat=True)
    unet = UNet2DCondition(cfg)
    unet_r = UNet2DCondition(cfg_r)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([7])
    ctx = jnp.ones((1, 7, 24))
    variables = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    a = unet.apply(variables, x, t, ctx)
    b = unet_r.apply(variables, x, t, ctx)  # same params, rematted graph
    # the rematted graph compiles to different fusions — fp rounding differs
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-6)

    # gradient path works under remat (the guided loop's requirement)
    def loss(lat):
        return jnp.sum(unet_r.apply(variables, lat, t, ctx) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()

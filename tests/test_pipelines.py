"""Pipeline semantics tests.

The flagship test reproduces ONE guided step of the reference's
AntiGradientPipeline literally in torch (hooks + autograd.grad + alpha norm
ratio, pipeline.py:83-161) on the mirror UNet + LGP, and requires the jax
sketch-guided pipeline to match the resulting latents.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.core.convert import convert_torch_unet  # noqa: E402
from sketch2img_tpu.core.schedulers import make_schedule, plan_dpm_solver  # noqa: E402
from sketch2img_tpu.models.lgp import LatentEdgePredictor, convert_torch_lgp  # noqa: E402
from sketch2img_tpu.models.unet import UNet2DCondition, UNetConfig, num_transformer_blocks  # noqa: E402
from sketch2img_tpu.pipelines.text2img import make_text2img_fn  # noqa: E402
from sketch2img_tpu.pipelines.sketch_guided import (  # noqa: E402
    make_sketch_guided_fn,
    num_guided_steps,
)
from sketch2img_tpu.pipelines.attn_injected import (  # noqa: E402
    make_attn_injected_fn,
    cfg_injection_state,
)

from torch_sd_mirror import TorchMiniUNet  # noqa: E402
from test_lgp import _torch_lgp  # noqa: E402


def test_num_guided_steps():
    # i <= 0.5*steps (pipeline.py:90-92): 50 -> 26 guided, 25 -> 13, 1 -> 1
    assert num_guided_steps(50) == 26
    assert num_guided_steps(25) == 13
    assert num_guided_steps(1) == 1


def test_text2img_perfect_model():
    sched = make_schedule()
    rng = np.random.RandomState(0)
    x_star = rng.randn(1, 8, 8, 4).astype(np.float32)
    ac = sched.alphas_cumprod

    def fake_unet(params, x, t, ctx):
        a = jnp.sqrt(jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1 - jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        xs = jnp.concatenate([jnp.asarray(x_star)] * x.shape[0], axis=0)
        return (x - a * xs) / s

    fn = make_text2img_fn(fake_unet, sched, num_steps=20)
    lat0 = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((2, 7, 24))
    out = fn({}, lat0, ctx, 7.5)  # both CFG halves identical -> scale irrelevant
    want = np.sqrt(ac[0]) * x_star + np.sqrt(1 - ac[0]) * np.asarray(lat0)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-2)


@pytest.fixture(scope="module")
def mini_stack():
    torch.manual_seed(3)
    block_out = (32, 32, 64, 64)
    cross = (True, True, True, False)
    tunet = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=block_out, layers=2, cross=cross,
        context_dim=24, heads=2, groups=32,
    ).eval()
    cfg = UNetConfig(
        block_out_channels=block_out, cross_attn=cross,
        num_heads=2, cross_attention_dim=24,
    )
    params = convert_torch_unet(tunet.state_dict(), cfg)
    unet = UNet2DCondition(cfg)

    # tap channels: down 32+32+64, mid 64*3, up 64+64+32 = 480; +4 +36 = 520
    tap_ch = 480
    tlgp = _torch_lgp(tap_ch + 4 + 36, 4)
    for m in tlgp.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    tlgp.eval()
    lgp_params, lgp_stats = convert_torch_lgp(tlgp.state_dict())
    lgp = LatentEdgePredictor(input_dim=tap_ch + 4 + 36, output_dim=4, num_layers=9)
    lgp_vars = {"params": lgp_params, "batch_stats": lgp_stats}
    return tunet, unet, params, tlgp, lgp, lgp_vars


def _torch_lgp_forward(tlgp, x_nchw, t_nchw, num_layers=9):
    pos = [torch.sin(2 * math.pi * t_nchw * (2 ** -l)) for l in range(num_layers)]
    x = torch.cat((x_nchw, t_nchw, torch.cat(pos, dim=1)), dim=1)
    b, c, h, w = x.shape
    flat = x.permute(0, 3, 2, 1).reshape(b * w * h, c)
    out = tlgp["layers"](flat)
    return out.reshape(b, w, h, 4).permute(0, 3, 2, 1)  # (b w h) c -> b c h w


def test_sketch_guided_one_step_matches_torch_reference(mini_stack):
    tunet, unet, params, tlgp, lgp, lgp_vars = mini_stack
    sched = make_schedule()
    num_steps = 1  # single guided step (n_guided == 1, no plain steps)
    plan = plan_dpm_solver(sched, num_steps)
    t_int = int(plan.timesteps[0])

    rng = np.random.RandomState(5)
    lat0 = rng.randn(1, 4, 16, 16).astype(np.float32)
    ctx_u = rng.randn(1, 7, 24).astype(np.float32)
    ctx_c = rng.randn(1, 7, 24).astype(np.float32)
    target = rng.randn(1, 4, 16, 16).astype(np.float32)
    gscale = 7.5
    beta = 1.6

    # ---- literal torch reference step (pipeline.py:83-161) ----
    captured = []

    def mk_hook():
        def hook(module, inputs, output):
            if isinstance(output, tuple):
                output = output[0]
            captured.append(output.float())
        return hook

    hooks = []
    for idx in (0, 1, 2):
        hooks.append(tunet.down_blocks[idx].register_forward_hook(mk_hook()))
    hooks.append(tunet.mid_block.attentions[0].register_forward_hook(mk_hook()))
    hooks.append(tunet.mid_block.resnets[0].register_forward_hook(mk_hook()))
    hooks.append(tunet.mid_block.resnets[1].register_forward_hook(mk_hook()))
    for idx in (0, 1, 2):
        hooks.append(tunet.up_blocks[idx].register_forward_hook(mk_hook()))

    try:
        latents = torch.from_numpy(lat0)
        noise = latents.clone()
        ctx_pair = torch.from_numpy(np.concatenate([ctx_u, ctx_c], axis=0))
        lmi = torch.cat([latents] * 2).requires_grad_(True)
        t = torch.tensor([t_int, t_int])
        noise_pred = tunet(lmi, t, ctx_pair)
        eps_u, eps_t = noise_pred.chunk(2)
        eps = eps_u + gscale * (eps_t - eps_u)
        # scheduler step (tables already parity-tested)
        x0 = (latents - float(plan.sigma[0]) * eps) / float(plan.alpha[0])
        x_prev = float(plan.c_x[0]) * latents + float(plan.c_m0[0]) * x0

        # hook capture order is execution order: down0..2, mid_res0, mid_attn,
        # mid_res1, up0..2 -> reorder to feature_blocks list order
        by_exec = captured
        feature_order = [by_exec[0], by_exec[1], by_exec[2],  # down
                         by_exec[4], by_exec[3], by_exec[5],  # attn, res0, res1
                         by_exec[6], by_exec[7], by_exec[8]]  # up
        resized = [F.interpolate(f, size=latents.shape[2], mode="bilinear")
                   for f in feature_order]
        feats = torch.cat(resized, dim=1)
        sqrt_om = float(np.sqrt(1 - sched.alphas_cumprod[t_int]))
        noise_level = sqrt_om * noise
        out = _torch_lgp_forward(tlgp, feats, torch.cat([noise_level] * 2))
        _, cond_out = out.chunk(2)
        loss = F.mse_loss(torch.from_numpy(target).float(), cond_out.float(),
                          reduction="mean")
        grad = torch.autograd.grad(loss, lmi)[0]
        _, cond_grad = (-grad).chunk(2)
        alpha = torch.linalg.norm(lmi.detach() - x_prev) / torch.linalg.norm(cond_grad) * beta
        want = (x_prev + alpha * cond_grad).detach().numpy()
    finally:
        for h in hooks:
            h.remove()

    # ---- jax pipeline ----
    def unet_apply(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def lgp_apply(v, feats, nl):
        return lgp.apply(v, feats, nl, train=False)

    fn = make_sketch_guided_fn(
        unet_apply, unet_apply_taps, lgp_apply, sched, num_steps, beta=beta
    )
    got = fn(
        params, lgp_vars,
        jnp.asarray(lat0.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx_u), jnp.asarray(ctx_c),
        jnp.asarray(target.transpose(0, 2, 3, 1)),
        gscale,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_attn_injected_scale_zero_matches_base(mini_stack):
    """With injection scale 0 the injected UNet must reproduce base sampling
    (modulo the injected blocks' extra zero-scaled branch)."""
    _, _, _, _, _, _ = mini_stack
    cfg = UNetConfig(
        block_out_channels=(32, 64), cross_attn=(True, False),
        num_heads=2, cross_attention_dim=24,
        injection="clip", injection_context_dim=16,
    )
    unet = UNet2DCondition(cfg)
    n_sites = num_transformer_blocks(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([1, 1])
    ctx = jnp.zeros((2, 7, 24))
    states = [jnp.ones((2, 5, 16))] * n_sites
    variables = unet.init(jax.random.PRNGKey(0), x, t, ctx,
                          injection_states=states, injection_scale=1.0)

    def apply_inj(p, x, t, ctx, states, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=states, injection_scale=scale)

    sched = make_schedule()
    fn = make_attn_injected_fn(apply_inj, sched, 3, n_sites)
    rng = np.random.RandomState(1)
    lat0 = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    ctx_pair = jnp.asarray(rng.randn(2, 7, 24), jnp.float32)
    clip_hidden = jnp.asarray(rng.randn(1, 5, 16), jnp.float32)
    state = cfg_injection_state(clip_hidden)
    out0 = fn(variables["params"], lat0, ctx_pair, state, 0.0, 7.5)
    out1 = fn(variables["params"], lat0, ctx_pair, state, 0.9, 7.5)
    assert out0.shape == (1, 8, 8, 4)
    # scale must modulate the output
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_sketch_guided_fused_lgp_matches_naive(mini_stack):
    """The native-resolution fused LGP head inside the full guided loop must
    reproduce the naive concat_taps path."""
    from sketch2img_tpu.models.lgp import lgp_fused_apply

    _, unet, params, _, lgp, lgp_vars = mini_stack
    sched = make_schedule()
    rng = np.random.RandomState(9)
    lat0 = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)
    ctx_u = jnp.asarray(rng.randn(1, 7, 24), jnp.float32)
    ctx_c = jnp.asarray(rng.randn(1, 7, 24), jnp.float32)
    target = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)

    def unet_apply(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def lgp_apply(v, feats, nl):
        return lgp.apply(v, feats, nl, train=False)

    fn_naive = make_sketch_guided_fn(unet_apply, unet_apply_taps, lgp_apply,
                                     sched, 3)
    fn_fused = make_sketch_guided_fn(
        unet_apply, unet_apply_taps, lgp_apply, sched, 3,
        lgp_apply_fused=lambda v, taps, nl, hh, ww: lgp_fused_apply(
            v, taps, nl, hh, ww),
    )
    a = fn_naive(params, lgp_vars, lat0, ctx_u, ctx_c, target, 7.5)
    b = fn_fused(params, lgp_vars, lat0, ctx_u, ctx_c, target, 7.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_sketch_guided_unrolled_loop_matches(mini_stack):
    """``unroll`` only re-shapes the XLA while loop (staging amortization);
    the trajectory must be unchanged — including an odd step count, where
    the unrolled loop has a remainder iteration."""
    _, unet, params, _, lgp, lgp_vars = mini_stack
    sched = make_schedule()
    rng = np.random.RandomState(11)
    lat0 = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)
    ctx_u = jnp.asarray(rng.randn(1, 7, 24), jnp.float32)
    ctx_c = jnp.asarray(rng.randn(1, 7, 24), jnp.float32)
    target = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)

    def unet_apply(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def lgp_apply(v, feats, nl):
        return lgp.apply(v, feats, nl, train=False)

    args = (params, lgp_vars, lat0, ctx_u, ctx_c, target, 7.5)
    base = make_sketch_guided_fn(unet_apply, unet_apply_taps, lgp_apply,
                                 sched, 5)(*args)
    un2 = make_sketch_guided_fn(unet_apply, unet_apply_taps, lgp_apply,
                                sched, 5, unroll=2)(*args)
    # unrolling re-fuses the body, so fp32 reassociation noise is expected
    # (measured 5e-4 relative over a 5-step guided vjp chain)
    np.testing.assert_allclose(np.asarray(base), np.asarray(un2),
                               rtol=1e-3, atol=1e-4)

    from sketch2img_tpu.pipelines.text2img import make_text2img_fn

    ctx_pair = jnp.concatenate([ctx_u, ctx_c], axis=0)
    t_base = make_text2img_fn(unet_apply, sched, 5)(params, lat0, ctx_pair, 7.5)
    t_un2 = make_text2img_fn(unet_apply, sched, 5, unroll=2)(
        params, lat0, ctx_pair, 7.5)
    np.testing.assert_allclose(np.asarray(t_base), np.asarray(t_un2),
                               rtol=1e-3, atol=1e-4)

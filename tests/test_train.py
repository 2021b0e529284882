"""Training-step tests on tiny configs, incl. data-parallel execution on the
virtual 8-device CPU mesh (the SURVEY.md §4 multi-device strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sketch2img_tpu.core.schedulers import make_schedule
from sketch2img_tpu.models.anime2sketch import UnetGenerator
from sketch2img_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from sketch2img_tpu.models.lgp import LatentEdgePredictor
from sketch2img_tpu.models.unet import UNet2DCondition, UNetConfig, num_transformer_blocks
from sketch2img_tpu.models.vae import AutoencoderKL, VAEConfig
from sketch2img_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
from sketch2img_tpu.parallel import make_mesh, shard_batch, shard_params
from sketch2img_tpu.train.optim import make_lr_schedule, make_optimizer
from sketch2img_tpu.train.train_lgp import (
    LGPTrainState,
    encode_tokens_static,
    init_lgp_train_state,
    make_lgp_train_step,
)
from sketch2img_tpu.train.train_attn_inject import (
    init_inject_train_state,
    make_inject_train_step,
    merge_injection_params,
    split_injection_params,
)


TAP_CH = 480  # 4-block mini UNet (32,32,64,64): 128 + 192 + 160


@pytest.fixture(scope="module")
def tiny():
    key = jax.random.PRNGKey(0)
    unet_cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                          cross_attn=(True, True, True, False),
                          num_heads=2, cross_attention_dim=32)
    unet = UNet2DCondition(unet_cfg)
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 64)))
    text = CLIPTextEncoder(CLIPTextConfig(vocab_size=100, hidden_size=32,
                                          intermediate_size=64, num_layers=2,
                                          num_heads=4))
    gan = UnetGenerator(3, 1, num_downs=5, ngf=4)
    lgp = LatentEdgePredictor(input_dim=TAP_CH + 4 + 36, output_dim=4, num_layers=9)

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    latent = jnp.zeros((1, 16, 16, 4))
    unet_params = unet.init(k1, latent, jnp.array([0]), jnp.zeros((1, 12, 32)))["params"]
    vae_params = vae.init(k2, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 16, 4)))["params"]
    text_params = text.init(k3, jnp.zeros((1, 12), jnp.int32))["params"]
    gan_params = gan.init(k4, jnp.zeros((1, 32, 32, 3)))["params"]
    lgp_vars = lgp.init(k5, jnp.zeros((1, 16, 16, TAP_CH)), jnp.zeros((1, 16, 16, 4)),
                        train=False)

    def lgp_apply(variables, feats, nl, train):
        return lgp.apply(variables, feats, nl, train=train, mutable=["batch_stats"])

    def unet_apply_taps(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def vae_encode(p, img):
        return vae.apply({"params": p}, img, method=AutoencoderKL.encode)

    def text_apply(p, ids):
        return text.apply({"params": p}, ids)

    def gan_apply(p, img):
        return gan.apply({"params": p}, img)

    frozen = {"unet": unet_params, "vae": vae_params, "text": text_params,
              "gan": gan_params}
    fns = dict(lgp_apply=lgp_apply, unet_apply_taps=unet_apply_taps,
               vae_encode=vae_encode, text_apply=text_apply, gan_apply=gan_apply)
    return unet, unet_cfg, lgp, lgp_vars, frozen, fns


def _make_step(tiny_fixture, lr=1e-3):
    _, _, _, lgp_vars, frozen, fns = tiny_fixture
    sched = make_schedule()
    tx = make_optimizer("adamw", lr)
    step = make_lgp_train_step(
        fns["lgp_apply"], fns["unet_apply_taps"], fns["vae_encode"],
        fns["text_apply"], fns["gan_apply"], sched, tx, sketch_fixed_size=32,
    )
    state = init_lgp_train_state(lgp_vars, tx)
    return step, state, frozen


def _batch(bsz=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "input_ids": jnp.asarray(rng.randint(0, 100, (bsz, 12)), jnp.int32),
        "pixels": jnp.asarray(rng.uniform(-1, 1, (bsz, 32, 32, 3)), jnp.float32),
    }


def test_lgp_train_step_runs_and_updates(tiny):
    step, state, frozen = _make_step(tiny)
    jstep = jax.jit(step)
    batch = _batch()
    s1, m1 = jstep(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert int(s1.step) == 1
    # params and batch stats actually moved
    d0 = jax.tree_util.tree_leaves(state.params)[0]
    d1 = jax.tree_util.tree_leaves(s1.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    b0 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    b1 = jax.tree_util.tree_leaves(s1.batch_stats)[0]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))


def test_lgp_loss_decreases(tiny):
    step, state, frozen = _make_step(tiny, lr=5e-3)
    jstep = jax.jit(step)
    batch = _batch()
    losses = []
    for i in range(8):
        state, m = jstep(state, frozen, batch, jax.random.PRNGKey(42))  # fixed rng
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_lgp_train_step_data_parallel_matches_single(tiny):
    """Same batch, 8-way data-sharded vs unsharded — identical update."""
    step, state, frozen = _make_step(tiny)
    jstep = jax.jit(step)
    batch = _batch(bsz=8)
    rng = jax.random.PRNGKey(7)
    s_single, m_single = jstep(state, frozen, batch, rng)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded_batch = shard_batch(mesh, batch)
    sharded_frozen = shard_params(mesh, frozen)
    sharded_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    s_dp, m_dp = jstep(sharded_state, sharded_frozen, sharded_batch, rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=1e-5)
    l_single = jax.tree_util.tree_leaves(s_single.params)[0]
    l_dp = jax.tree_util.tree_leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_single),
                               rtol=1e-4, atol=1e-6)


def test_encode_tokens_static_shapes(tiny):
    _, _, _, _, frozen, fns = tiny
    ids = jnp.full((2, 12), 1, jnp.int32)
    out = fns["text_apply"](frozen["text"], ids)
    assert out.shape == (2, 12, 32)
    ids_long = jnp.full((2, 150), 1, jnp.int32)
    out = encode_tokens_static(fns["text_apply"], frozen["text"], ids_long,
                               bos_token_id=2, eos_token_id=3)
    assert out.shape == (2, 2 * 77, 32)


def test_lr_schedules():
    s = make_lr_schedule("constant_with_warmup", 2e-4, 150, 1000)
    assert float(s(0)) == 0.0
    assert np.isclose(float(s(150)), 2e-4)
    assert np.isclose(float(s(900)), 2e-4)
    c = make_lr_schedule("cosine_with_restarts", 2e-4, 10, 110)
    assert np.isclose(float(c(10)), 2e-4, rtol=1e-3)
    assert float(c(60)) < 2e-5  # cosine trough mid-span
    assert float(c(109)) > float(c(60)) or float(c(109)) >= 0.0


def test_inject_split_merge_roundtrip():
    cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, False),
                     num_heads=2, cross_attention_dim=32,
                     injection="clip", injection_context_dim=16)
    unet = UNet2DCondition(cfg)
    n = num_transformer_blocks(cfg)
    states = [jnp.zeros((1, 5, 16))] * n
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.array([0]), jnp.zeros((1, 12, 32)),
                       injection_states=states)["params"]
    base, inj = split_injection_params(params)
    # injected modules present and disjoint
    import flax.traverse_util as tu
    inj_keys = set(tu.flatten_dict(inj))
    base_keys = set(tu.flatten_dict(base))
    assert inj_keys and base_keys and not (inj_keys & base_keys)
    assert all(any(p in ("sketch_proj", "sketch_norm", "sketch_attn", "sketch_conv")
                   for p in k) for k in inj_keys)
    merged = merge_injection_params(base, inj)
    assert set(tu.flatten_dict(merged)) == set(tu.flatten_dict(params))


def test_inject_train_step(tiny):
    cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, False),
                     num_heads=2, cross_attention_dim=32,
                     injection="clip", injection_context_dim=24)
    unet = UNet2DCondition(cfg)
    n = num_transformer_blocks(cfg)
    clip_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24,
                                intermediate_size=48, num_layers=2, num_heads=2)
    clip = CLIPVisionEncoder(clip_cfg)

    states = [jnp.zeros((1, 17, 24))] * n
    unet_params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                            jnp.array([0]), jnp.zeros((1, 12, 32)),
                            injection_states=states)["params"]
    clip_params = clip.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]

    _, _, _, _, frozen_all, fns = tiny
    sched = make_schedule()
    tx = make_optimizer("adamw", 1e-3)
    state, base = init_inject_train_state(unet_params, clip_params, tx)

    def unet_apply_injected(p, x, t, ctx, s, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=s, injection_scale=scale)

    def clip_apply(p, px):
        return clip.apply({"params": p}, px)

    step = make_inject_train_step(
        unet_apply_injected, clip_apply, fns["vae_encode"], fns["text_apply"],
        fns["gan_apply"], sched, tx, n, sketch_fixed_size=32, clip_image_size=32,
    )
    frozen = {"unet_base": base, "vae": frozen_all["vae"],
              "text": frozen_all["text"], "gan": frozen_all["gan"]}
    batch = _batch()
    s1, m = jax.jit(step)(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    i0 = jax.tree_util.tree_leaves(state.inj_params)[0]
    i1 = jax.tree_util.tree_leaves(s1.inj_params)[0]
    assert not np.allclose(np.asarray(i0), np.asarray(i1))
    c0 = jax.tree_util.tree_leaves(state.clip_params)[0]
    c1 = jax.tree_util.tree_leaves(s1.clip_params)[0]
    assert not np.allclose(np.asarray(c0), np.asarray(c1))


def test_inject_train_step_data_parallel_matches_single(tiny):
    """Same batch, 8-way data-sharded vs unsharded — identical update for
    the injection trainer (the trainer whose reference counterpart is
    explicitly DDP with find_unused_parameters=True,
    /root/reference/modules/clip_guided_trainer.py:85-92). Its DP gradient
    all-reduce spans the injected modules AND the trainable CLIP tower —
    the largest collective in the framework (VERDICT r4 item 2)."""
    cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, False),
                     num_heads=2, cross_attention_dim=32,
                     injection="clip", injection_context_dim=24)
    unet = UNet2DCondition(cfg)
    n = num_transformer_blocks(cfg)
    clip_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24,
                                intermediate_size=48, num_layers=2, num_heads=2)
    clip = CLIPVisionEncoder(clip_cfg)
    states = [jnp.zeros((1, 17, 24))] * n
    unet_params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                            jnp.array([0]), jnp.zeros((1, 12, 32)),
                            injection_states=states)["params"]
    clip_params = clip.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]

    _, _, _, _, frozen_all, fns = tiny
    sched = make_schedule()
    tx = make_optimizer("adamw", 1e-3)
    state, base = init_inject_train_state(unet_params, clip_params, tx)

    def unet_apply_injected(p, x, t, ctx, s, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=s, injection_scale=scale)

    def clip_apply(p, px):
        return clip.apply({"params": p}, px)

    step = make_inject_train_step(
        unet_apply_injected, clip_apply, fns["vae_encode"], fns["text_apply"],
        fns["gan_apply"], sched, tx, n, sketch_fixed_size=32,
        clip_image_size=32,
    )
    frozen = {"unet_base": base, "vae": frozen_all["vae"],
              "text": frozen_all["text"], "gan": frozen_all["gan"]}
    jstep = jax.jit(step)
    batch = _batch(bsz=8)
    rng = jax.random.PRNGKey(9)
    s_single, m_single = jstep(state, frozen, batch, rng)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded_batch = shard_batch(mesh, batch)
    sharded_frozen = shard_params(mesh, frozen)
    sharded_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    s_dp, m_dp = jstep(sharded_state, sharded_frozen, sharded_batch, rng)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_single["loss"]),
                               rtol=1e-5)
    # atol 1e-5, not 1e-6: Adam normalizes near-zero first-step grads to
    # O(lr)-scale updates, so the 8-way reduction-order drift surfaces as
    # ~2e-6 absolute differences on ~1e-7-scale leaves (measured); a real
    # DP fault (unsummed or double-summed grads) is orders above this
    for which in ("inj_params", "clip_params"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s_single, which)),
                        jax.tree_util.tree_leaves(getattr(s_dp, which))):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


def test_adamw8bit_tracks_adamw():
    """Blockwise-int8-state AdamW must track exact fp32 AdamW closely over a
    short quadratic optimization."""
    import optax

    tx8 = make_optimizer("adamw8bit", 0.05, weight_decay=0.0)
    tx32 = make_optimizer("adamw", 0.05, weight_decay=0.0)
    target = jnp.asarray(np.random.RandomState(0).randn(64, 33), jnp.float32)

    def run(tx, steps=60):
        p = jnp.zeros((64, 33))
        s = tx.init(p)
        for _ in range(steps):
            g = 2 * (p - target)
            upd, s = tx.update(g, s, p)
            p = optax.apply_updates(p, upd)
        return p

    p8 = run(tx8)
    p32 = run(tx32)
    # both should approach the target; quantized within a small gap of exact
    err8 = float(jnp.mean(jnp.abs(p8 - target)))
    err32 = float(jnp.mean(jnp.abs(p32 - target)))
    assert err32 < 0.1
    assert err8 < err32 + 0.05

    # state really is int8
    s = tx8.init(jnp.zeros((100, 7)))
    assert s["mu"]["q"].dtype == jnp.int8
    assert s["nu"]["q"].dtype == jnp.int8


def test_adamw8bit_in_train_step(tiny):
    step, state, frozen = _make_step(tiny)  # baseline state for shape
    _, _, _, lgp_vars, _, fns = tiny
    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.train.train_lgp import init_lgp_train_state, make_lgp_train_step

    sched = make_schedule()
    tx = make_optimizer("bitsandbytes.optim.AdamW8bit", 1e-3)  # config-path alias
    # the alias maps to exact adamw; use the explicit 8-bit one too
    tx8 = make_optimizer("adamw8bit", 1e-3)
    step8 = make_lgp_train_step(
        fns["lgp_apply"], fns["unet_apply_taps"], fns["vae_encode"],
        fns["text_apply"], fns["gan_apply"], sched, tx8, sketch_fixed_size=32,
    )
    st8 = init_lgp_train_state(lgp_vars, tx8)
    s1, m = jax.jit(step8)(st8, frozen, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert s1.opt_state["mu"]["dense_0"]["kernel"]["q"].dtype == jnp.int8


def test_cached_latents_step_matches_uncached(tiny):
    """cache_latents path: precomputed VAE moments for image + sketch must
    reproduce the uncached step exactly under the same rng (the cache stores
    distributions, not samples, so per-step noise stays stochastic)."""
    _, _, _, lgp_vars, frozen, fns = tiny
    sched = make_schedule()
    # SGD, not Adam: Adam normalizes near-zero gradients to full-size
    # updates, so the moments' jit-boundary fp drift (~1e-7) would surface
    # as O(lr) param differences despite identical math
    import optax

    tx = optax.sgd(1e-3)
    kw = dict(sketch_fixed_size=32)
    step = make_lgp_train_step(
        fns["lgp_apply"], fns["unet_apply_taps"], fns["vae_encode"],
        fns["text_apply"], fns["gan_apply"], sched, tx, **kw)
    cstep = make_lgp_train_step(
        fns["lgp_apply"], fns["unet_apply_taps"], fns["vae_encode"],
        fns["text_apply"], fns["gan_apply"], sched, tx,
        cached_latents=True, **kw)
    state = init_lgp_train_state(lgp_vars, tx)

    batch = _batch()
    from sketch2img_tpu.train.train_lgp import generate_sketch

    mean, logvar = fns["vae_encode"](frozen["vae"], batch["pixels"])
    sk = generate_sketch(fns["gan_apply"], frozen["gan"], batch["pixels"],
                         fixed=32)
    smean, slogvar = fns["vae_encode"](frozen["vae"], sk)
    cbatch = {
        "input_ids": batch["input_ids"],
        "latent_dist": jnp.concatenate([mean, logvar], axis=-1),
        "sketch_latent_dist": jnp.concatenate([smean, slogvar], axis=-1),
    }
    rng = jax.random.PRNGKey(7)
    s_a, m_a = jax.jit(step)(state, frozen, batch, rng)
    s_b, m_b = jax.jit(cstep)(state, frozen, cbatch, rng)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_inject_cached_latents_step_matches_uncached(tiny):
    """Injection-trainer cache path: precomputed VAE moments + the
    CLIP-normalized sketch must reproduce the uncached step exactly under
    the same rng (SGD — see the LGP twin test for why not Adam)."""
    import optax

    cfg = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, False),
                     num_heads=2, cross_attention_dim=32,
                     injection="clip", injection_context_dim=24)
    unet = UNet2DCondition(cfg)
    n = num_transformer_blocks(cfg)
    clip_cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=24,
                                intermediate_size=48, num_layers=2, num_heads=2)
    clip = CLIPVisionEncoder(clip_cfg)
    states = [jnp.zeros((1, 17, 24))] * n
    unet_params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                            jnp.array([0]), jnp.zeros((1, 12, 32)),
                            injection_states=states)["params"]
    clip_params = clip.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]

    _, _, _, _, frozen_all, fns = tiny
    sched = make_schedule()
    tx = optax.sgd(1e-3)
    state, base = init_inject_train_state(unet_params, clip_params, tx)

    def unet_apply_injected(p, x, t, ctx, s, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=s, injection_scale=scale)

    def clip_apply(p, px):
        return clip.apply({"params": p}, px)

    kw = dict(sketch_fixed_size=32, clip_image_size=32)
    step = make_inject_train_step(
        unet_apply_injected, clip_apply, fns["vae_encode"], fns["text_apply"],
        fns["gan_apply"], sched, tx, n, **kw)
    cstep = make_inject_train_step(
        unet_apply_injected, clip_apply, fns["vae_encode"], fns["text_apply"],
        fns["gan_apply"], sched, tx, n, cached_latents=True, **kw)
    frozen = {"unet_base": base, "vae": frozen_all["vae"],
              "text": frozen_all["text"], "gan": frozen_all["gan"]}
    batch = _batch()

    from sketch2img_tpu.train.train_lgp import generate_sketch

    mean, logvar = fns["vae_encode"](frozen["vae"], batch["pixels"])
    raw = generate_sketch(fns["gan_apply"], frozen["gan"], batch["pixels"],
                          fixed=32, binarize=False)
    sk = jnp.clip(raw, 0.0, 1.0)
    sk = jax.image.resize(sk, (sk.shape[0], 32, 32, 3), method="cubic")
    sk = ((sk - jnp.asarray([0.48145466, 0.4578275, 0.40821073]))
          / jnp.asarray([0.26862954, 0.26130258, 0.27577711]))
    cbatch = {"input_ids": batch["input_ids"],
              "latent_dist": jnp.concatenate([mean, logvar], axis=-1),
              "sketch_clip_pixels": sk}
    rng = jax.random.PRNGKey(5)
    s_a, m_a = jax.jit(step)(state, frozen, batch, rng)
    s_b, m_b = jax.jit(cstep)(state, frozen, cbatch, rng)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.inj_params),
                    jax.tree_util.tree_leaves(s_b.inj_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)

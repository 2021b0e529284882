"""Mid-training sampler (the reference's dead sampling: block, made real)."""

import numpy as np

import jax
import jax.numpy as jnp

from sketch2img_tpu.core.schedulers import make_schedule
from sketch2img_tpu.train.sampling import TrainingSampler


def test_sampler_disabled_by_default():
    s = TrainingSampler({}, None, None, None, None)
    assert not s.should_sample(step=100)
    assert not s.should_sample(epoch=1)


def test_sampler_cadence():
    cfg = {"enabled": True, "every_n_steps": 50, "every_n_epochs": 2}
    s = TrainingSampler(cfg, None, None, None, None)
    assert s.should_sample(step=50)
    assert not s.should_sample(step=51)
    assert s.should_sample(epoch=1)   # (epoch+1) % 2 == 0
    assert not s.should_sample(epoch=2)


def test_sampler_generates(tmp_path):
    sched = make_schedule()
    ac = sched.alphas_cumprod
    x_star = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4), jnp.float32)

    def unet_apply(p, x, t, ctx):  # perfect delta model
        a = jnp.sqrt(jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1 - jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        xs = jnp.concatenate([x_star] * x.shape[0], axis=0)
        return (x - a * xs) / s

    def vae_decode(p, z):  # fake decoder: upsample latents to pixels
        return jnp.tile(jnp.repeat(jnp.repeat(z[..., :3], 8, 1), 8, 2), (1, 1, 1, 1))

    def encode_prompt(prompt, negative):
        return jnp.zeros((1, 7, 8)), jnp.ones((1, 7, 8))

    cfg = {"enabled": True, "every_n_epochs": 1, "steps": 3,
           "height": 32, "width": 32, "seed": 3, "cfg_scale": 7.0,
           "save_dir": str(tmp_path), "prompts": ["a", "b"],
           "negative_prompts": ["n"]}
    s = TrainingSampler(cfg, unet_apply, vae_decode, encode_prompt, sched)
    assert s.should_sample(epoch=0)
    paths = s({}, {}, "epoch1")
    assert len(paths) == 2
    import os
    assert all(os.path.exists(p) for p in paths)

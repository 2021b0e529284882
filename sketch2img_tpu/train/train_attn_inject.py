"""Attention-injection training — clip_guided_trainer.py:68-267 as one
pjit'd step.

Trains the injected per-block modules (sketch_proj/norm/attn/conv) and the
CLIP vision encoder with the standard epsilon-prediction MSE
(clip_guided_trainer.py:230-231); the base UNet stays frozen. Trainable
selection replaces torch's requires_grad_ partitioning
(clip_guided_trainer.py:156-159) with an explicit param-tree split on the
``sketch_*`` name prefix — the injected modules are the only UNet params that
receive gradients, a static property of the tree rather than runtime flags.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from sketch2img_tpu.core.schedulers import DiffusionSchedule, add_noise
from sketch2img_tpu.models.vae import SCALING_FACTOR
from sketch2img_tpu.train.train_lgp import encode_tokens_static, generate_sketch


_INJECTION_KEYS = ("sketch_proj", "sketch_norm", "sketch_attn", "sketch_conv")


def _is_injection_path(path: Tuple[str, ...]) -> bool:
    return any(part in _INJECTION_KEYS for part in path)


def split_injection_params(unet_params) -> Tuple[dict, dict]:
    """-> (frozen_base, trainable_injection) as flat-key dicts rebuilt to trees."""
    flat = flatten_dict(unet_params)
    base = {k: v for k, v in flat.items() if not _is_injection_path(k)}
    inj = {k: v for k, v in flat.items() if _is_injection_path(k)}
    return unflatten_dict(base), unflatten_dict(inj)


def merge_injection_params(base, inj) -> dict:
    flat = dict(flatten_dict(base))
    flat.update(flatten_dict(inj))
    return unflatten_dict(flat)


@struct.dataclass
class InjectTrainState:
    step: jnp.ndarray
    inj_params: Any       # injected UNet modules
    clip_params: Any      # CLIP vision encoder (trainable, clip_guided_trainer.py:157)
    opt_state: Any


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def sketch_to_clip_pixels(gan_apply, gan_params, px, *,
                          sketch_fixed_size: int = 512,
                          clip_image_size: int = 224):
    """anime2sketch (NO binarization, clip_guided_trainer.py:33-38) ->
    CLIPImageProcessor parity: clip to [0,1], resize to 224 bicubic, CLIP
    mean/std normalize (clip_guided_trainer.py:212). Single source of truth
    for the train step AND the latent-cache precompute — they must produce
    byte-identical sketches."""
    raw = generate_sketch(gan_apply, gan_params, px,
                          fixed=sketch_fixed_size, binarize=False)
    sk = jnp.clip(raw, 0.0, 1.0)
    sk = jax.image.resize(
        sk, (px.shape[0], clip_image_size, clip_image_size, 3), method="cubic")
    return (sk - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def make_inject_train_step(
    unet_apply_injected: Callable,
    clip_vision_apply: Callable,
    vae_encode: Callable,
    text_apply: Callable,
    gan_apply: Callable,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    num_injection_sites: int,
    *,
    sketch_fixed_size: int = 512,
    clip_image_size: int = 224,
    cached_latents: bool = False,
) -> Callable:
    """Returns ``step_fn(state, frozen, batch, rng) -> (state, metrics)``.

    * ``frozen`` = dict(unet_base=..., vae=..., text=..., gan=...)
    * ``unet_apply_injected(params, x, t, ctx, states, scale) -> eps``
    * ``clip_vision_apply(params, pixel_values) -> last_hidden_state``
    * with ``cached_latents=True`` the batch carries precomputed VAE
      moments ``latent_dist`` (B,h,w,8) and the CLIP-normalized sketch
      ``sketch_clip_pixels`` (B,224,224,3) — the frozen GAN and the VAE
      encode drop out of the step (the trainable CLIP tower still runs on
      the cached sketch every step, so its gradients are unaffected).
    """

    def step_fn(state: InjectTrainState, frozen: Dict[str, Any], batch, rng):
        r_lat, r_noise, r_t = jax.random.split(rng, 3)
        b = batch["input_ids"].shape[0]

        ctx = encode_tokens_static(text_apply, frozen["text"], batch["input_ids"])
        if cached_latents:
            mean, logvar = jnp.split(batch["latent_dist"], 2, axis=-1)
            sk = batch["sketch_clip_pixels"]
        else:
            px = batch["pixels"]
            mean, logvar = vae_encode(frozen["vae"], px)
            sk = sketch_to_clip_pixels(
                gan_apply, frozen["gan"], px,
                sketch_fixed_size=sketch_fixed_size,
                clip_image_size=clip_image_size)
        latents = (mean + jnp.exp(0.5 * logvar)
                   * jax.random.normal(r_lat, mean.shape, mean.dtype)) * SCALING_FACTOR

        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        t = jax.random.randint(r_t, (b,), 0, schedule.num_train_timesteps)
        noisy = add_noise(schedule, latents, noise, t)

        def loss_fn(trainable):
            clip_hidden = clip_vision_apply(trainable["clip"], sk)
            states = [clip_hidden] * num_injection_sites
            unet_params = merge_injection_params(frozen["unet_base"], trainable["inj"])
            eps = unet_apply_injected(unet_params, noisy, t, ctx, states, 1.0)
            return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

        trainable = {"inj": state.inj_params, "clip": state.clip_params}
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_state = InjectTrainState(
            step=state.step + 1,
            inj_params=new_trainable["inj"],
            clip_params=new_trainable["clip"],
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    return step_fn


def init_inject_train_state(unet_params, clip_params, tx) -> Tuple[InjectTrainState, dict]:
    """Split UNet params; returns (state, frozen_base_unet_params)."""
    base, inj = split_injection_params(unet_params)
    trainable = {"inj": inj, "clip": clip_params}
    state = InjectTrainState(
        step=jnp.zeros((), jnp.int32),
        inj_params=inj,
        clip_params=clip_params,
        opt_state=tx.init(trainable),
    )
    return state, base

"""LGP training — the reference's trainer.py:74-282 as ONE pjit'd step.

Per step (trainer.py:208-252, with the intermediate_result typo of
trainer.py:237-245 fixed to its documented intent):
  1. encode text (chunked CLIP), VAE-encode pixels and the on-the-fly
     anime2sketch sketch (all frozen, no gradient),
  2. noise latents at a uniform random timestep, build the noise-level map,
  3. frozen UNet forward with taps (eps output discarded, trainer.py:235),
  4. LGP on resized+concatenated taps, MSE against sketch latents,
  5. AdamW update of the LGP only.

TPU design: the whole step is a single jit over a (data,)-sharded batch;
gradient all-reduce is the implicit psum from replicated params (replaces
DDP/NCCL, trainer.py:91-98). The sketch GAN runs on-device inside the step —
the reference's host-side fp32 GAN (trainer.py:152) would starve the chip.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sketch2img_tpu.core.schedulers import DiffusionSchedule, add_noise, get_noise_level
from sketch2img_tpu.models.unet import concat_taps
from sketch2img_tpu.models.vae import SCALING_FACTOR


@struct.dataclass
class LGPTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def generate_sketch(
    gan_apply: Callable,
    gan_params: Any,
    px: jnp.ndarray,
    fixed: int = 1024,
    binarize: bool = True,
) -> jnp.ndarray:
    """trainer.py:36-44: resize to fixed^2 (bicubic), GAN, invert, threshold
    at 0.5, tile to 3 channels, resize back. px NHWC in [-1,1]."""
    b, h, w, _ = px.shape
    big = jax.image.resize(px, (b, fixed, fixed, 3), method="cubic")
    val = 1.0 - gan_apply(gan_params, big)  # (B,fixed,fixed,1)
    if binarize:
        val = jnp.where(val < 0.5, 0.0, 1.0)
    tiled = jnp.tile(val, (1, 1, 1, 3))
    return jax.image.resize(tiled, (b, h, w, 3), method="cubic")


def encode_tokens_static(
    text_apply: Callable,
    text_params: Any,
    input_ids: jnp.ndarray,
    *,
    bos_token_id: int = 49406,
    eos_token_id: int = 49407,
) -> jnp.ndarray:
    """Static-shape version of trainer.py:46-72's chunked text encode.

    input_ids: (B, L) already padded with EOS to a fixed L. L <= 77 encodes
    directly; otherwise the ids are split into ceil(L/75) windows of 75,
    each re-wrapped in BOS/EOS (the window count is static in L, so this jits).
    Deviation from the host-dynamic reference path: the tail window is padded
    to the full 75 tokens with EOS instead of keeping its natural width —
    extra EOS-position states appear in the context (see
    clip_text.encode_tokens for the exact-parity host path).
    """
    b, L = input_ids.shape
    if L <= 77:
        return text_apply(text_params, input_ids)
    states = []
    bos = jnp.full((b, 1), bos_token_id, input_ids.dtype)
    eos = jnp.full((b, 1), eos_token_id, input_ids.dtype)
    for start in range(0, L, 75):
        window = input_ids[:, start : start + 75]
        if window.shape[1] < 75:
            window = jnp.pad(window, ((0, 0), (0, 75 - window.shape[1])),
                             constant_values=eos_token_id)
        states.append(text_apply(text_params, jnp.concatenate([bos, window, eos], axis=1)))
    return jnp.concatenate(states, axis=-2)


def make_lgp_train_step(
    lgp_apply: Callable,
    unet_apply_taps: Callable,
    vae_encode: Callable,
    text_apply: Callable,
    gan_apply: Callable,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    *,
    sketch_fixed_size: int = 1024,
    cached_latents: bool = False,
) -> Callable:
    """Returns ``step_fn(state, frozen, batch, rng) -> (state, metrics)``.

    * ``frozen`` = dict(unet=..., vae=..., text=..., gan=...) params
    * ``batch`` = dict(input_ids=(B,L) int32 eos-padded, pixels=(B,H,W,3));
      with ``cached_latents=True`` the pixels are replaced by precomputed
      VAE moments ``latent_dist``/``sketch_latent_dist`` ((B,h,w,8) =
      mean ‖ logvar, ImageStore.cache_latents) — the GAN and both VAE
      encodes drop out of the step. Per-step latent SAMPLING stays
      stochastic; note the dataset cache fixes one crop per image
      (ImageStore.cache_latents docstring).
    * signatures: lgp_apply(vars, feats, nl, train) -> (out, new_stats);
      unet_apply_taps(params, x, t, ctx) -> (eps, taps);
      vae_encode(params, img) -> (mean, logvar); text_apply(params, ids);
      gan_apply(params, img).
    """

    def step_fn(state: LGPTrainState, frozen: Dict[str, Any], batch, rng) -> Tuple[LGPTrainState, dict]:
        r_lat, r_sketch, r_noise, r_t = jax.random.split(rng, 4)
        b = batch["input_ids"].shape[0]

        # ---- frozen preprocessing (trainer.py:216-220) ----
        ctx = encode_tokens_static(text_apply, frozen["text"], batch["input_ids"])
        if cached_latents:
            mean, logvar = jnp.split(batch["latent_dist"], 2, axis=-1)
            smean, slogvar = jnp.split(batch["sketch_latent_dist"], 2, axis=-1)
        else:
            px = batch["pixels"]
            mean, logvar = vae_encode(frozen["vae"], px)
            sketch_img = generate_sketch(gan_apply, frozen["gan"], px,
                                         fixed=sketch_fixed_size)
            smean, slogvar = vae_encode(frozen["vae"], sketch_img)
        latents = (mean + jnp.exp(0.5 * logvar)
                   * jax.random.normal(r_lat, mean.shape, mean.dtype)) * SCALING_FACTOR
        sketch_latents = (smean + jnp.exp(0.5 * slogvar)
                          * jax.random.normal(r_sketch, smean.shape, smean.dtype)) * SCALING_FACTOR

        # ---- diffusion noising (trainer.py:222-232) ----
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        t = jax.random.randint(r_t, (b,), 0, schedule.num_train_timesteps)
        noisy = add_noise(schedule, latents, noise, t)
        noise_level = get_noise_level(schedule, noise, t)

        # ---- frozen UNet, taps only (trainer.py:235-244) ----
        _, taps = unet_apply_taps(frozen["unet"], noisy, t, ctx)
        h, w = latents.shape[1], latents.shape[2]
        feats = jax.lax.stop_gradient(concat_taps(taps, h, w))
        sketch_latents = jax.lax.stop_gradient(sketch_latents)
        noise_level = jax.lax.stop_gradient(noise_level)

        # ---- LGP loss + update (trainer.py:245-252) ----
        def loss_fn(params):
            out, new_stats = lgp_apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, noise_level, train=True,
            )
            loss = jnp.mean((out.astype(jnp.float32)
                             - sketch_latents.astype(jnp.float32)) ** 2)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = LGPTrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats["batch_stats"],
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    return step_fn


def init_lgp_train_state(lgp_variables, tx: optax.GradientTransformation) -> LGPTrainState:
    return LGPTrainState(
        step=jnp.zeros((), jnp.int32),
        params=lgp_variables["params"],
        batch_stats=lgp_variables["batch_stats"],
        opt_state=tx.init(lgp_variables["params"]),
    )

"""Attention-injection conditioned sampling (the CLIP-variant demo path).

Reference: /root/reference/modules/clip_guided_inf.py:78-119 — a stock SD
pipeline whose UNet blocks were monkey-patched (SatMixin) with CLIP-token
self-attention injection; the CFG pair is a stacked [zeros; clip_hidden]
state and the injection strength is the UI slider (set_state/set_scale,
:107-108).

Here the injected UNet is a static Flax variant (UNetConfig.injection="clip")
and the state/scale are function arguments — no module mutation, one jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sketch2img_tpu.core.schedulers import (
    DiffusionSchedule,
    make_sampler_step,
)
from sketch2img_tpu.pipelines.text2img import cfg_combine


def cfg_injection_state(clip_hidden: jnp.ndarray) -> jnp.ndarray:
    """stack([zeros_like(h), h]) over the CFG batch (clip_guided_inf.py:107)."""
    return jnp.concatenate([jnp.zeros_like(clip_hidden), clip_hidden], axis=0)


def make_attn_injected_fn(
    unet_apply_injected: Callable,
    schedule: DiffusionSchedule,
    num_steps: int,
    num_injection_sites: int,
    *,
    solver: str = "dpm++",
    vae_decode: Optional[Callable] = None,
) -> Callable:
    """Returns jit-able ``fn(unet_params, latents0, context_pair,
    injection_state, injection_scale, guidance_scale) -> latents``.

    ``unet_apply_injected(params, x, t, ctx, states, scale) -> eps`` where
    ``states`` is a list (one entry per TransformerBlock); the CLIP variant
    shares one (2B, S, 1024) tensor across all sites.
    """
    ts, sampler_step = make_sampler_step(solver, schedule, num_steps)
    timesteps = jnp.asarray(ts)

    def run(unet_params, latents0, context_pair, injection_state,
            injection_scale, guidance_scale):
        states = [injection_state] * num_injection_sites
        b = latents0.shape[0]
        # ``injection_scale``: scalar (the reference's one UI slider,
        # clip_guided_inf.py:108) or a (B,) vector of per-image strengths —
        # the serving extension that lets the micro-batcher merge requests
        # with different sliders into one program. Tiled over the CFG pair
        # and broadcast over tokens/channels inside the blocks.
        sc = jnp.broadcast_to(jnp.asarray(injection_scale, jnp.float32), (b,))
        sc_pair = jnp.concatenate([sc, sc])[:, None, None]

        def body(i, carry):
            x, x0_prev = carry
            t = jnp.broadcast_to(timesteps[i], (2 * x.shape[0],))
            inp = jnp.concatenate([x, x], axis=0)
            eps_pair = unet_apply_injected(
                unet_params, inp, t, context_pair, states, sc_pair
            )
            eps = cfg_combine(eps_pair, guidance_scale)
            return sampler_step(i, x, eps, x0_prev)

        carry = (latents0, jnp.zeros_like(latents0))
        latents, _ = jax.lax.fori_loop(0, num_steps, body, carry)
        return latents

    if vae_decode is None:
        return run

    from sketch2img_tpu.pipelines.text2img import latents_to_image

    def full(unet_params, vae_params, latents0, context_pair, injection_state,
             injection_scale, guidance_scale):
        latents = run(unet_params, latents0, context_pair, injection_state,
                      injection_scale, guidance_scale)
        return latents_to_image(vae_decode, vae_params, latents)

    return full

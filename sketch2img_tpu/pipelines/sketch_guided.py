"""Sketch-guided sampling — the AntiGradientPipeline semantics, TPU-native.

Reference hot loop: /root/reference/modules/pipeline.py:83-161. Each guided
step runs the UNet with forward hooks, feeds the nine tapped activations to
the LGP, and nudges the latents by the gradient of the LGP's MSE against the
user sketch, taken w.r.t. the UNet input (``torch.autograd.grad``,
pipeline.py:159), with step size  alpha = ||x - x_prev|| / ||grad|| * beta
(beta = 1.6) on the first half of the schedule only (pipeline.py:90-92,109).

TPU-first redesign:
  * hooks -> ``capture_taps=True`` functional outputs; ``autograd.grad`` ->
    ``jax.value_and_grad`` of a scalar-loss closure over the latent.
  * guided/unguided phases are two separate ``fori_loop``s — branch-free,
    no traced Python control flow (the x0 multistep history carries across).
  * CFG split-batch guidance: the reference backprops the CFG-doubled batch
    (2B) even though the loss only touches the cond half. Every module is
    per-sample (GroupNorm/LayerNorm/eval BatchNorm), so the uncond half's
    gradient is exactly zero — we run the uncond forward without taps or
    gradient and differentiate only the cond half: same math, ~half the
    backward FLOPs and tap memory.
  * the reference's ||lmi - x_prev|| is a Frobenius norm over the DOUBLED
    difference, i.e. sqrt(2)*||x - x_prev|| — preserved exactly.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sketch2img_tpu.core.schedulers import (
    DiffusionSchedule,
    get_noise_level,
    make_sampler_step,
)
from sketch2img_tpu.models.unet import concat_taps
from sketch2img_tpu.pipelines.text2img import cfg_combine, emit_callback


def num_guided_steps(num_steps: int) -> int:
    """i <= 0.5*num_steps (inclusive, pipeline.py:90-92,108)."""
    return int(math.floor(0.5 * num_steps)) + 1


def make_sketch_guided_fn(
    unet_apply: Callable,
    unet_apply_taps: Callable,
    lgp_apply: Callable,
    schedule: DiffusionSchedule,
    num_steps: int,
    *,
    beta: float = 1.6,
    solver: str = "dpm++",
    vae_decode: Optional[Callable] = None,
    lgp_apply_fused: Optional[Callable] = None,
    callback: Optional[Callable] = None,
    callback_steps: int = 1,
    unroll: int = 1,
) -> Callable:
    """Returns jit-able
    ``fn(unet_params, lgp_vars, latents0, context_uncond, context_cond,
    sketch_latent, guidance_scale) -> latents``.

    * ``unet_apply(params, x, t, ctx) -> eps``
    * ``unet_apply_taps(params, x, t, ctx) -> (eps, taps dict)``
    * ``lgp_apply(vars, features, noise_level) -> (B,h,w,4)`` (eval mode)
    * ``lgp_apply_fused`` (optional): ``(vars, taps, noise_level, h, w)`` —
      native-resolution tap projection (models.lgp.lgp_fused_apply); exact
      same math, skips the (B,h,w,9280) concat. Used when provided.
    * ``latents0``: (B,h,w,4) initial noise — also the reference's ``noise``
      copy used for the noise-level feature (pipeline.py:75).
    * ``sketch_latent``: (B,h,w,4) VAE-encoded sketch x0.18215 (app.py:109).
    * ``unroll``: solver steps per XLA while-loop iteration (both phases) —
      amortizes per-iteration carry staging at the cost of a bigger body.
    """
    ts, sampler_step = make_sampler_step(solver, schedule, num_steps)
    timesteps = jnp.asarray(ts)
    n_guided = num_guided_steps(num_steps)

    def run(unet_params, lgp_vars, latents0, context_uncond, context_cond,
            sketch_latent, guidance_scale):
        noise0 = latents0  # pipeline.py:75 — kept for noise-level features
        guided_body, plain_body = _guided_plain_bodies(
            unet_apply, unet_apply_taps, lgp_apply, schedule, timesteps,
            sampler_step, beta, lgp_apply_fused, callback, callback_steps,
            unet_params, lgp_vars, noise0, context_uncond, context_cond,
            sketch_latent, guidance_scale)

        # unroll=1 keeps the exact round-2 while lowering (and its compile
        # cache); unroll>1 switches to the scan-unrolled body (measured
        # slower in-model — docs/ROADMAP.md, kept for reproducibility)
        kw = {} if unroll == 1 else {"unroll": unroll}
        carry = (latents0, jnp.zeros_like(latents0))
        carry = jax.lax.fori_loop(0, n_guided, guided_body, carry, **kw)
        carry = jax.lax.fori_loop(n_guided, num_steps, plain_body, carry, **kw)
        return carry[0]

    if vae_decode is None:
        return run

    from sketch2img_tpu.pipelines.text2img import latents_to_image

    def full(unet_params, vae_params, lgp_vars, latents0, context_uncond,
             context_cond, sketch_latent, guidance_scale):
        latents = run(unet_params, lgp_vars, latents0, context_uncond,
                      context_cond, sketch_latent, guidance_scale)
        return latents_to_image(vae_decode, vae_params, latents)

    return full


def _guided_plain_bodies(unet_apply, unet_apply_taps, lgp_apply, schedule,
                         timesteps, sampler_step, beta, lgp_apply_fused,
                         callback, callback_steps,
                         unet_params, lgp_vars, noise0, context_uncond,
                         context_cond, sketch_latent, guidance_scale):
    """The two per-step loop bodies, shared verbatim between the monolithic
    jit (``make_sketch_guided_fn``) and the host-driven range programs
    (``make_sketch_guided_range_fns``) — one source of truth for the
    guidance math."""
    b, h, w, _ = noise0.shape

    def guided_body(i, carry):
            x, x0_prev = carry
            t = jnp.broadcast_to(timesteps[i], (b,))

            eps_u = unet_apply(unet_params, x, t, context_uncond)

            def loss_fn(xc):
                eps_t, taps = unet_apply_taps(unet_params, xc, t, context_cond)
                nl = get_noise_level(schedule, noise0, t)
                if lgp_apply_fused is not None:
                    out = lgp_apply_fused(lgp_vars, taps, nl, h, w)
                else:
                    feats = concat_taps(taps, h, w)
                    out = lgp_apply(lgp_vars, feats, nl)
                # mse(target.float(), cond_outputs.float()) — pipeline.py:157
                loss = jnp.mean(
                    (sketch_latent.astype(jnp.float32) - out.astype(jnp.float32)) ** 2
                )
                return loss, eps_t

            (_, eps_t), g = jax.value_and_grad(loss_fn, has_aux=True)(x)

            eps_pair = jnp.concatenate([eps_u, eps_t], axis=0)
            eps = cfg_combine(eps_pair, guidance_scale)
            x_prev, x0 = sampler_step(i, x, eps, x0_prev)

            cond_grad = -g
            # ||cat([x,x]) - x_prev|| == sqrt(2) * ||x - x_prev|| (pipeline.py:160).
            # Norms are PER IMAGE (the reference's whole-batch norm is an
            # artifact of its batch-1 formulation; at batch 1 this is
            # identical — pinned by the torch-parity test — and at batch>1
            # each image gets its own guidance magnitude, which keeps
            # results independent of batch composition for serving)
            def _per_image_norm(v):
                return jnp.sqrt(jnp.sum(
                    v.astype(jnp.float32) ** 2, axis=(1, 2, 3),
                    keepdims=True))

            num = jnp.sqrt(2.0) * _per_image_norm(x - x_prev)
            den = _per_image_norm(cond_grad)
            alpha = num / jnp.maximum(den, 1e-20) * beta
            x_next = x_prev + (alpha * cond_grad.astype(jnp.float32)).astype(
                x_prev.dtype)
            emit_callback(callback, callback_steps, i, t, x_next)
            return (x_next, x0)

    def plain_body(i, carry):
        x, x0_prev = carry
        t2 = jnp.broadcast_to(timesteps[i], (2 * b,))
        inp = jnp.concatenate([x, x], axis=0)
        ctx = jnp.concatenate([context_uncond, context_cond], axis=0)
        eps = cfg_combine(unet_apply(unet_params, inp, t2, ctx), guidance_scale)
        x_next, x0 = sampler_step(i, x, eps, x0_prev)
        emit_callback(callback, callback_steps, i, t2, x_next)
        return (x_next, x0)

    return guided_body, plain_body


def make_sketch_guided_range_fns(
    unet_apply: Callable,
    unet_apply_taps: Callable,
    lgp_apply: Callable,
    schedule: DiffusionSchedule,
    num_steps: int,
    *,
    beta: float = 1.6,
    solver: str = "dpm++",
    lgp_apply_fused: Optional[Callable] = None,
) -> tuple:
    """Range variants of the two loop phases for host-driven progress
    callbacks (the axon TPU backend has no in-jit host callbacks — see
    ``text2img.emit_callback``). Returns ``(guided_range, plain_range)``:

    * ``guided_range(unet_params, lgp_vars, x, x0_prev, noise0,
      context_uncond, context_cond, sketch_latent, guidance_scale, start,
      stop)`` — steps [start, stop) of the guided phase;
    * ``plain_range(unet_params, x, x0_prev, noise0, context_uncond,
      context_cond, guidance_scale, start, stop)`` — the plain-CFG phase.

    Bounds are traced (dynamic fori_loop), so ONE jit per phase serves any
    segmentation; chaining segments over [0, num_steps) with the phase
    split at ``num_guided_steps`` reproduces ``make_sketch_guided_fn``'s
    trajectory (same bodies — ``_guided_plain_bodies``; pinned by tests).
    ``noise0`` is the initial latents, threaded for the noise-level
    features (pipeline.py:75)."""
    ts, sampler_step = make_sampler_step(solver, schedule, num_steps)
    timesteps = jnp.asarray(ts)

    def guided_range(unet_params, lgp_vars, x, x0_prev, noise0,
                     context_uncond, context_cond, sketch_latent,
                     guidance_scale, start, stop):
        guided_body, _ = _guided_plain_bodies(
            unet_apply, unet_apply_taps, lgp_apply, schedule, timesteps,
            sampler_step, beta, lgp_apply_fused, None, 1,
            unet_params, lgp_vars, noise0, context_uncond, context_cond,
            sketch_latent, guidance_scale)
        return jax.lax.fori_loop(start, stop, guided_body, (x, x0_prev))

    def plain_range(unet_params, x, x0_prev, noise0, context_uncond,
                    context_cond, guidance_scale, start, stop):
        _, plain_body = _guided_plain_bodies(
            unet_apply, unet_apply_taps, lgp_apply, schedule, timesteps,
            sampler_step, beta, lgp_apply_fused, None, 1,
            unet_params, None, noise0, context_uncond, context_cond,
            None, guidance_scale)
        return jax.lax.fori_loop(start, stop, plain_body, (x, x0_prev))

    return guided_range, plain_range

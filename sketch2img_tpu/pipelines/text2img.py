"""Plain SD text-to-image sampling loop (CFG only) — jit-compiled.

This is the unguided base of the reference's AntiGradientPipeline
(modules/pipeline.py:20-130 minus the anti-gradient): CFG-doubled UNet
epsilon, DPM-Solver++ 2M update, VAE decode. The whole denoise loop is one
``lax.fori_loop`` inside one jit — static shapes per (H, W, steps), no host
round-trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sketch2img_tpu.core.schedulers import (
    DiffusionSchedule,
    make_sampler_step,
)


def cfg_combine(eps_pair: jnp.ndarray, guidance_scale) -> jnp.ndarray:
    """uncond + g * (text - uncond) over a CFG-doubled batch (pipeline.py:99-101)."""
    eps_u, eps_t = jnp.split(eps_pair, 2, axis=0)
    return eps_u + guidance_scale * (eps_t - eps_u)


def latents_to_image(vae_apply, params, latents: jnp.ndarray) -> jnp.ndarray:
    """latents /0.18215 -> VAE decode -> [0,1] float image (pipeline.py:163-169)."""
    img = vae_apply(params, latents / 0.18215)
    return jnp.clip(img / 2 + 0.5, 0.0, 1.0)


def emit_callback(callback: Optional[Callable], callback_steps: int,
                  i, t, x) -> None:
    """Host progress callback inside a traced loop body — the reference's
    ``callback(i, t, latents)`` hook (modules/pipeline.py:34-35,113). Runs
    every ``callback_steps`` via ``jax.debug.callback`` (best-effort
    ordering, which matches a progress hook's contract). No-op when
    ``callback`` is None, so the plain path traces to the same program.

    NOTE: the axon TPU backend does not implement host callbacks at all
    (``UNIMPLEMENTED: axon_pjrt does not support host send/recv``) — the
    runtime therefore drives callbacks from the HOST between range-program
    dispatches (``make_text2img_range_fn`` / ``segment_plan``) and never
    traces this on TPU; this in-jit variant remains for direct users of
    the pipeline fns on backends that support it (CPU mesh)."""
    if callback is None:
        return
    import numpy as np

    def host_cb(i_, t_, x_):
        callback(int(i_), int(t_), np.asarray(x_))

    jax.lax.cond(
        i % callback_steps == 0,
        lambda: jax.debug.callback(host_cb, i, t[0], x),
        lambda: None,
    )


def segment_plan(num_steps: int, callback_steps: int,
                 *phase_bounds: int) -> list:
    """Host-side sampling-segment plan for backends without in-jit host
    callbacks (the axon TPU): split [0, num_steps) so every step with
    ``i % callback_steps == 0`` ends a segment (the callback fires on the
    host with that step's latents, exactly the reference's cadence,
    modules/pipeline.py:113) and no segment crosses a phase bound (the
    guided/plain split of the sketch pipeline). Returns [(start, stop)].
    The range programs take traced bounds, so every segment of a phase
    shares ONE compiled program regardless of the cadence."""
    ends = {i + 1 for i in range(num_steps) if i % callback_steps == 0}
    ends.update(b for b in phase_bounds if 0 < b < num_steps)
    ends.add(num_steps)
    bounds = sorted(ends)
    return list(zip([0] + bounds[:-1], bounds))


def make_text2img_range_fn(
    unet_apply: Callable,
    schedule: DiffusionSchedule,
    num_steps: int,
    *,
    solver: str = "dpm++",
) -> Callable:
    """Range variant of the sampling loop for host-driven progress:
    ``fn(unet_params, x, x0_prev, context_pair, guidance_scale, start,
    stop) -> (x, x0_prev)`` runs solver steps [start, stop) of the same
    ``num_steps`` plan. ``start``/``stop`` are traced (dynamic fori_loop
    bounds), so one jit covers every segment; chaining the segments over
    the full range reproduces ``make_text2img_fn`` step for step."""
    ts, sampler_step = make_sampler_step(solver, schedule, num_steps)
    timesteps = jnp.asarray(ts)

    def run_range(unet_params, x, x0_prev, context_pair, guidance_scale,
                  start, stop):
        def body(i, carry):
            x, x0_prev = carry
            t = jnp.broadcast_to(timesteps[i], (2 * x.shape[0],))
            inp = jnp.concatenate([x, x], axis=0)
            eps_pair = unet_apply(unet_params, inp, t, context_pair)
            eps = cfg_combine(eps_pair, guidance_scale)
            x, x0 = sampler_step(i, x, eps, x0_prev)
            return (x, x0)

        return jax.lax.fori_loop(start, stop, body, (x, x0_prev))

    return run_range


def make_text2img_fn(
    unet_apply: Callable,
    schedule: DiffusionSchedule,
    num_steps: int,
    *,
    solver: str = "dpm++",
    vae_decode: Optional[Callable] = None,
    callback: Optional[Callable] = None,
    callback_steps: int = 1,
    unroll: int = 1,
) -> Callable:
    """Returns jit-able ``fn(unet_params, latents0, context_pair,
    guidance_scale) -> latents`` (or decoded image if ``vae_decode`` given,
    signature then takes (unet_params, vae_params, ...)).

    ``context_pair`` is the CFG-stacked (2B, N, 768) text embedding
    ([uncond; cond], pipeline.py:55-57); ``latents0`` the (B, h, w, 4)
    initial noise (DPM-Solver++ init_noise_sigma == 1).

    ``unroll``: solver steps per XLA while-loop iteration — amortizes the
    per-iteration carry staging copies at the cost of a proportionally
    bigger loop body (compile time). Same math at any value.
    """
    ts, sampler_step = make_sampler_step(solver, schedule, num_steps)
    timesteps = jnp.asarray(ts)

    def denoise(unet_params, latents0, context_pair, guidance_scale):
        def body(i, carry):
            x, x0_prev = carry
            t = jnp.broadcast_to(timesteps[i], (2 * x.shape[0],))
            inp = jnp.concatenate([x, x], axis=0)
            eps_pair = unet_apply(unet_params, inp, t, context_pair)
            eps = cfg_combine(eps_pair, guidance_scale)
            x, x0 = sampler_step(i, x, eps, x0_prev)
            emit_callback(callback, callback_steps, i, t, x)
            return (x, x0)

        init = (latents0, jnp.zeros_like(latents0))
        kw = {} if unroll == 1 else {"unroll": unroll}
        latents, _ = jax.lax.fori_loop(0, num_steps, body, init, **kw)
        return latents

    if vae_decode is None:
        return denoise

    def full(unet_params, vae_params, latents0, context_pair, guidance_scale):
        latents = denoise(unet_params, latents0, context_pair, guidance_scale)
        return latents_to_image(vae_decode, vae_params, latents)

    return full

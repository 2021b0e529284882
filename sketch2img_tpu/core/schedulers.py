"""Pure-function diffusion noise schedulers.

TPU-first design: every scheduler is a *plan* of precomputed per-step
coefficient tables (built host-side with numpy, static per number of steps)
plus a branch-free ``step`` function that is a pure elementwise expression —
safe inside ``jax.lax.scan`` / ``fori_loop`` under ``jit``, no Python control
flow on traced values, no mutable scheduler object.

Behavioral parity targets (reference, Mikubill/sketch2img):
  * beta schedule constants:   /root/reference/app.py:14-25 (scaled_linear,
    0.00085 -> 0.012, 1000 train steps)
  * training noising (DDIM.add_noise): /root/reference/trainer.py:188-194,231
  * noise-level feature:       /root/reference/modules/pipeline.py:132-139
  * inference solver: DPM-Solver++ multistep, order 2, midpoint,
    lower_order_final=True, epsilon prediction — /root/reference/app.py:14-25
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Base diffusion schedule (alphas / betas)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed diffusion constants (host-side numpy; cast on use)."""

    num_train_timesteps: int
    betas: np.ndarray            # (N,)
    alphas_cumprod: np.ndarray   # (N,)

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> DiffusionSchedule:
    """SD1.x default: scaled_linear betas (linspace in sqrt-space, squared)."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule: {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        num_train_timesteps=num_train_timesteps,
        betas=betas.astype(np.float32),
        alphas_cumprod=alphas_cumprod.astype(np.float32),
    )


def _gather_per_sample(table: jnp.ndarray, t: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """table[t] broadcast to the rank of `like` (batch-leading)."""
    vals = jnp.asarray(table)[t].reshape((-1,) + (1,) * (like.ndim - 1))
    return vals.astype(like.dtype)


def add_noise(
    schedule: DiffusionSchedule,
    original: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-diffuse: sqrt(ac[t])*x0 + sqrt(1-ac[t])*eps.

    Parity: diffusers DDIMScheduler.add_noise as used at trainer.py:231.
    """
    sqrt_ac = _gather_per_sample(jnp.asarray(schedule.sqrt_alphas_cumprod), timesteps, original)
    sqrt_om = _gather_per_sample(
        jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod), timesteps, original
    )
    return sqrt_ac * original + sqrt_om * noise


def get_noise_level(
    schedule: DiffusionSchedule, noise: jnp.ndarray, timesteps: jnp.ndarray
) -> jnp.ndarray:
    """sqrt(1 - alphas_cumprod[t]) * noise.

    Parity: modules/pipeline.py:132-139 / trainer.py:199-206.
    """
    sqrt_om = _gather_per_sample(
        jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod), timesteps, noise
    )
    return sqrt_om * noise


# ---------------------------------------------------------------------------
# Inference timestep spacing (shared by DDIM / DPM-Solver)
# ---------------------------------------------------------------------------


def _inference_timesteps(num_train_timesteps: int, num_steps: int) -> np.ndarray:
    """linspace(0, N-1, steps+1).round()[::-1][:-1] — diffusers DPM-Solver spacing."""
    ts = (
        np.linspace(0, num_train_timesteps - 1, num_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    return ts


# ---------------------------------------------------------------------------
# DPM-Solver++ multistep (2M, midpoint, lower_order_final)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DPMSolverPlan:
    """Per-step coefficient tables for a branch-free DPM-Solver++ 2M loop.

    The update at step i (current sample x, epsilon prediction eps):
        x0   = (x - sigma[i] * eps) / alpha[i]
        x'   = c_x[i] * x + c_m0[i] * x0 + c_m1[i] * x0_prev
    where x0_prev is the x0 prediction from step i-1 (at i=0 the c_m1 entry
    is 0, so any placeholder works). Order switching (first order at i=0,
    optional lower_order_final) is folded into the tables at plan time.
    """

    num_steps: int
    timesteps: np.ndarray  # (steps,) int64, descending
    alpha: np.ndarray      # (steps,) alpha_t at the *current* step's t
    sigma: np.ndarray      # (steps,) sigma_t at the *current* step's t
    c_x: np.ndarray        # (steps,)
    c_m0: np.ndarray       # (steps,)
    c_m1: np.ndarray       # (steps,)


def plan_dpm_solver(
    schedule: DiffusionSchedule,
    num_steps: int,
    lower_order_final: bool = True,
) -> DPMSolverPlan:
    """Build the coefficient tables for DPM-Solver++ 2M (midpoint).

    Math (epsilon-pred, algorithm dpmsolver++, solver_type midpoint):
        alpha_t = sqrt(ac_t); sigma_t = sqrt(1-ac_t); lambda_t = log(alpha/sigma)
        1st order: x_t = (sig_t/sig_s) x - alpha_t (e^{-h} - 1) m0
        2nd order (midpoint, multistep):
            h   = lambda_t - lambda_s0;  h0 = lambda_s0 - lambda_s1;  r0 = h0/h
            x_t = (sig_t/sig_s0) x - alpha_t(e^{-h}-1) m0
                  - 0.5 alpha_t(e^{-h}-1) (m0 - m1)/r0
    Step i=0 is first order. If lower_order_final and num_steps < 15, the
    final step is also first order (diffusers semantics).
    """
    ac = schedule.alphas_cumprod.astype(np.float64)
    alpha_all = np.sqrt(ac)
    sigma_all = np.sqrt(1.0 - ac)
    lam_all = np.log(alpha_all) - np.log(sigma_all)

    ts = _inference_timesteps(schedule.num_train_timesteps, num_steps)

    c_x = np.zeros(num_steps)
    c_m0 = np.zeros(num_steps)
    c_m1 = np.zeros(num_steps)
    alpha_cur = np.zeros(num_steps)
    sigma_cur = np.zeros(num_steps)

    def lam_at(t: int) -> float:
        # prev_timestep==0 means "fully denoised": diffusers indexes tables at
        # t-0 with t=0 giving ac[0]; for the terminal target it uses t_prev=0.
        return lam_all[t]

    for i in range(num_steps):
        t_s0 = ts[i]
        t_prev = 0 if i == num_steps - 1 else ts[i + 1]
        a_t, s_t = alpha_all[t_prev], sigma_all[t_prev]
        a_s0, s_s0 = alpha_all[t_s0], sigma_all[t_s0]
        h = lam_at(t_prev) - lam_at(t_s0)
        phi = np.expm1(-h)  # e^{-h} - 1

        alpha_cur[i] = a_s0
        sigma_cur[i] = s_s0

        first_order = i == 0 or (
            lower_order_final and num_steps < 15 and i == num_steps - 1
        )
        c_x[i] = s_t / s_s0
        if first_order:
            c_m0[i] = -a_t * phi
            c_m1[i] = 0.0
        else:
            t_s1 = ts[i - 1]
            h0 = lam_at(t_s0) - lam_at(t_s1)
            r0 = h0 / h
            c_m0[i] = -a_t * phi * (1.0 + 0.5 / r0)
            c_m1[i] = a_t * phi * (0.5 / r0)

    return DPMSolverPlan(
        num_steps=num_steps,
        timesteps=ts,
        alpha=alpha_cur.astype(np.float32),
        sigma=sigma_cur.astype(np.float32),
        c_x=c_x.astype(np.float32),
        c_m0=c_m0.astype(np.float32),
        c_m1=c_m1.astype(np.float32),
    )


def dpm_solver_step(
    plan: DPMSolverPlan,
    i: jnp.ndarray,
    x: jnp.ndarray,
    eps: jnp.ndarray,
    x0_prev: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM-Solver++ 2M update. Returns (x_next, x0) — thread x0 as carry.

    `i` may be a traced int32 (scan counter); the tables are gathered with it.
    """
    alpha = jnp.asarray(plan.alpha)[i].astype(x.dtype)
    sigma = jnp.asarray(plan.sigma)[i].astype(x.dtype)
    c_x = jnp.asarray(plan.c_x)[i].astype(x.dtype)
    c_m0 = jnp.asarray(plan.c_m0)[i].astype(x.dtype)
    c_m1 = jnp.asarray(plan.c_m1)[i].astype(x.dtype)

    x0 = (x - sigma * eps) / alpha
    x_next = c_x * x + c_m0 * x0 + c_m1 * x0_prev
    return x_next, x0


# ---------------------------------------------------------------------------
# DDIM (eta = 0) — used for parity tests and as an alternative sampler
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDIMPlan:
    num_steps: int
    timesteps: np.ndarray       # (steps,) descending
    sqrt_ac_t: np.ndarray       # (steps,) at current t
    sqrt_om_t: np.ndarray       # (steps,)
    sqrt_ac_prev: np.ndarray    # (steps,) at previous (target) t
    sqrt_om_prev: np.ndarray    # (steps,)


def plan_ddim(schedule: DiffusionSchedule, num_steps: int) -> DDIMPlan:
    """DDIM spacing: leading — t_i = (N // steps) * i, descending (diffusers)."""
    step_ratio = schedule.num_train_timesteps // num_steps
    ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
    ac = schedule.alphas_cumprod.astype(np.float64)

    prev_ts = ts - step_ratio
    ac_t = ac[ts]
    ac_prev = np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], 1.0)
    return DDIMPlan(
        num_steps=num_steps,
        timesteps=ts,
        sqrt_ac_t=np.sqrt(ac_t).astype(np.float32),
        sqrt_om_t=np.sqrt(1 - ac_t).astype(np.float32),
        sqrt_ac_prev=np.sqrt(ac_prev).astype(np.float32),
        sqrt_om_prev=np.sqrt(1 - ac_prev).astype(np.float32),
    )


def ddim_step(
    plan: DDIMPlan, i: jnp.ndarray, x: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """Deterministic DDIM update (eta=0): x0-project then re-noise at t_prev."""
    sa_t = jnp.asarray(plan.sqrt_ac_t)[i].astype(x.dtype)
    so_t = jnp.asarray(plan.sqrt_om_t)[i].astype(x.dtype)
    sa_p = jnp.asarray(plan.sqrt_ac_prev)[i].astype(x.dtype)
    so_p = jnp.asarray(plan.sqrt_om_prev)[i].astype(x.dtype)
    x0 = (x - so_t * eps) / sa_t
    return sa_p * x0 + so_p * eps


def make_sampler_step(solver: str, schedule: DiffusionSchedule, num_steps: int):
    """Unified sampler-step factory for the pipelines.

    Returns ``(timesteps, step)`` with ``step(i, x, eps, x0_prev) ->
    (x_next, x0)`` — the (x, x0_prev) carry shape the sampling loops use.
    The reference's pipeline runs whatever diffusers scheduler it is
    constructed with (demo: DPM-Solver++ multistep, app.py:14-25; DDIM used
    for train-time noising, trainer.py:188-194); here the choice is a
    compile-time pipeline argument.
    """
    if solver in ("dpm++", "dpm-solver++", "dpmsolver++"):
        plan = plan_dpm_solver(schedule, num_steps)

        def step(i, x, eps, x0_prev):
            return dpm_solver_step(plan, i, x, eps, x0_prev)

        return plan.timesteps, step
    if solver == "ddim":
        plan = plan_ddim(schedule, num_steps)

        def step(i, x, eps, x0_prev):
            return ddim_step(plan, i, x, eps), x0_prev

        return plan.timesteps, step
    raise ValueError(f"unknown solver {solver!r}; use 'dpm++' or 'ddim'")

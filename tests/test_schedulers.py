"""Scheduler parity tests.

The DPM-Solver++ tables are checked against an independent, literal
step-by-step implementation of the published multistep 2M midpoint algorithm
(stateful Python loop, written directly from the update equations), and
against analytic invariants of the probability-flow ODE.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sketch2img_tpu.core.schedulers import make_sampler_step
from sketch2img_tpu.core import (
    make_schedule,
    add_noise,
    get_noise_level,
    plan_dpm_solver,
    dpm_solver_step,
    plan_ddim,
    ddim_step,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule()


def test_beta_schedule_constants(sched):
    # scaled_linear 0.00085 -> 0.012 over 1000 steps (app.py:14-25)
    assert sched.betas.shape == (1000,)
    assert np.isclose(sched.betas[0], 0.00085)
    assert np.isclose(sched.betas[-1], 0.012)
    assert np.isclose(sched.alphas_cumprod[0], 1 - 0.00085)
    # independent recomputation in float64
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-5)


def test_add_noise_formula(sched):
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 8, 8).astype(np.float32)
    eps = rng.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([100, 900])
    got = np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t)))
    ac = sched.alphas_cumprod
    for b in range(2):
        want = np.sqrt(ac[t[b]]) * x0[b] + np.sqrt(1 - ac[t[b]]) * eps[b]
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)


def test_noise_level_formula(sched):
    rng = np.random.RandomState(1)
    eps = rng.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([100, 500])
    got = np.asarray(get_noise_level(sched, jnp.asarray(eps), jnp.asarray(t)))
    ac = sched.alphas_cumprod
    for b in range(2):
        np.testing.assert_allclose(
            got[b], np.sqrt(1 - ac[t[b]]) * eps[b], rtol=1e-5, atol=1e-6
        )


def _reference_dpmpp_2m(ac, num_train, num_steps, x, eps_fn, lower_order_final=True):
    """Literal multistep DPM-Solver++(2M) midpoint, epsilon prediction.

    Written directly from the update equations (Lu et al. 2022, eqs. as used
    by the reference's inference scheduler) — independent of the plan tables.
    """
    alpha = np.sqrt(ac)
    sigma = np.sqrt(1 - ac)
    lam = np.log(alpha) - np.log(sigma)
    ts = np.linspace(0, num_train - 1, num_steps + 1).round()[::-1][:-1].astype(int)

    m_prev = None
    for i in range(num_steps):
        t = ts[i]
        t_prev = 0 if i == num_steps - 1 else ts[i + 1]
        eps = eps_fn(x, t)
        m0 = (x - sigma[t] * eps) / alpha[t]
        h = lam[t_prev] - lam[t]
        phi = np.expm1(-h)
        use_first = i == 0 or (lower_order_final and num_steps < 15 and i == num_steps - 1)
        if use_first:
            x = (sigma[t_prev] / sigma[t]) * x - alpha[t_prev] * phi * m0
        else:
            t_s1 = ts[i - 1]
            h0 = lam[t] - lam[t_s1]
            r0 = h0 / h
            d1 = (m0 - m_prev) / r0
            x = (
                (sigma[t_prev] / sigma[t]) * x
                - alpha[t_prev] * phi * m0
                - 0.5 * alpha[t_prev] * phi * d1
            )
        m_prev = m0
    return x


@pytest.mark.parametrize("num_steps", [5, 14, 25, 50])
def test_dpm_solver_matches_literal_reference(sched, num_steps):
    ac = sched.alphas_cumprod.astype(np.float64)
    rng = np.random.RandomState(42)
    shape = (1, 4, 8, 8)
    x_init = rng.randn(*shape).astype(np.float64)

    # arbitrary smooth fake model, same function for both implementations
    w = rng.randn(*shape)

    def eps_fn(x, t):
        return np.tanh(x * 0.3 + w * (t / 1000.0))

    want = _reference_dpmpp_2m(ac, 1000, num_steps, x_init.copy(), eps_fn)

    plan = plan_dpm_solver(sched, num_steps)
    np.testing.assert_array_equal(
        plan.timesteps,
        np.linspace(0, 999, num_steps + 1).round()[::-1][:-1].astype(int),
    )
    x = jnp.asarray(x_init, jnp.float32)
    x0_prev = jnp.zeros_like(x)
    for i in range(num_steps):
        eps = jnp.asarray(eps_fn(np.asarray(x, np.float64), int(plan.timesteps[i])), jnp.float32)
        x, x0_prev = dpm_solver_step(plan, i, x, eps, x0_prev)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)


def test_dpm_solver_perfect_model_recovers_data(sched):
    """With the exact delta-distribution epsilon model, the solver must land
    (nearly) on the data point: x_final = a_0 * x* + s_0 * e, ac[0]≈1."""
    num_steps = 25
    plan = plan_dpm_solver(sched, num_steps)
    ac = sched.alphas_cumprod
    rng = np.random.RandomState(7)
    x_star = rng.randn(1, 4, 8, 8).astype(np.float32)
    e0 = rng.randn(1, 4, 8, 8).astype(np.float32)
    x = jnp.asarray(e0)
    x0_prev = jnp.zeros_like(x)
    for i in range(num_steps):
        t = int(plan.timesteps[i])
        eps = (x - np.sqrt(ac[t]) * x_star) / np.sqrt(1 - ac[t])
        x, x0_prev = dpm_solver_step(plan, i, x, jnp.asarray(eps), x0_prev)
    # the exact ODE solution for the delta model: x_t = a_t x* + s_t e0
    want = np.sqrt(ac[0]) * x_star + np.sqrt(1 - ac[0]) * e0
    # float32 solver arithmetic (x0 = (x - s*eps)/a amplifies rounding by
    # 1/a ~ 15x at early steps) — 1e-2 is tight for 25 accumulated steps.
    np.testing.assert_allclose(np.asarray(x), want, rtol=0, atol=1e-2)


def test_ddim_perfect_model_recovers_data(sched):
    num_steps = 50
    plan = plan_ddim(sched, num_steps)
    ac = sched.alphas_cumprod
    rng = np.random.RandomState(8)
    x_star = rng.randn(1, 4, 8, 8).astype(np.float32)
    x = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    for i in range(num_steps):
        t = int(plan.timesteps[i])
        eps = (x - np.sqrt(ac[t]) * x_star) / np.sqrt(1 - ac[t])
        x = ddim_step(plan, i, x, jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(x), x_star, rtol=0, atol=1e-3)


def test_dpm_plan_first_order_entries(sched):
    # i=0 always first order; with <15 steps the final step is too.
    p = plan_dpm_solver(sched, 10)
    assert p.c_m1[0] == 0.0
    assert p.c_m1[-1] == 0.0
    assert np.all(p.c_m1[1:-1] != 0.0)
    p50 = plan_dpm_solver(sched, 50)
    assert p50.c_m1[0] == 0.0
    assert np.all(p50.c_m1[1:] != 0.0)  # 50 >= 15: final step stays 2nd order


# ---------------------------------------------------------------------------
# committed golden fixtures (tests/fixtures/scheduler_golden.json) — values
# derived by tools/gen_scheduler_fixtures.py from a STATEFUL sample-space
# transcription of the diffusers semantics (provenance in the file's _meta),
# with coefficients probed via basis inputs rather than restated algebra.
# Any drift in timesteps, per-step coefficients, or an end-to-end solver
# trajectory fails here against committed data. (VERDICT r2 item 7)
# ---------------------------------------------------------------------------

import json as _json
import os as _os

_FIXTURES = _os.path.join(_os.path.dirname(__file__), "fixtures",
                          "scheduler_golden.json")


def _golden():
    with open(_FIXTURES) as f:
        return _json.load(f)


@pytest.mark.parametrize("num_steps", [10, 20, 25, 50])
def test_dpm_plan_matches_committed_golden_tables(sched, num_steps):
    g = _golden()[f"dpmpp_{num_steps}"]
    p = plan_dpm_solver(sched, num_steps)
    assert p.timesteps.tolist() == g["timesteps"]
    coeffs = np.asarray(g["coefficients_c_x_c_m0_c_m1"], np.float64)
    np.testing.assert_allclose(p.c_x, coeffs[:, 0], rtol=0, atol=5e-5)
    np.testing.assert_allclose(p.c_m0, coeffs[:, 1], rtol=0, atol=5e-5)
    np.testing.assert_allclose(p.c_m1, coeffs[:, 2], rtol=0, atol=5e-5)


@pytest.mark.parametrize("num_steps", [10, 25, 50])
def test_ddim_timesteps_match_committed_golden(sched, num_steps):
    g = _golden()[f"ddim_{num_steps}"]
    p = plan_ddim(sched, num_steps)
    assert p.timesteps.tolist() == g["timesteps"]


@pytest.mark.parametrize("solver,key", [("dpm++", "dpmpp"), ("ddim", "ddim")])
@pytest.mark.parametrize("num_steps", [10, 25, 50])
def test_solver_trajectory_matches_committed_golden(sched, solver, key,
                                                    num_steps):
    """Replay the fixture's synthetic model (eps = sin(1.7x + 0.01t), fp64)
    through the production sampler step; every intermediate latent must
    match the committed fp64 trajectory to fp32 tolerance."""
    g = _golden()
    fx = g[f"{key}_{num_steps}"]
    x = jnp.asarray(g["_meta"]["x_init"], jnp.float32)
    ts, step = make_sampler_step(solver, sched, num_steps)
    assert list(ts) == fx["timesteps"]
    x0_prev = jnp.zeros_like(x)
    for i, t in enumerate(ts):
        eps = jnp.sin(1.7 * x + 0.01 * float(t))
        x, x0_prev = step(i, x, eps, x0_prev)
        want = np.asarray(fx["trajectory"][i], np.float64)
        np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)

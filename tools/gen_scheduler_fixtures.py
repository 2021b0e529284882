"""Generate committed golden fixtures for the inference schedulers.

    python tools/gen_scheduler_fixtures.py   # writes tests/fixtures/

Provenance (VERDICT r2 item 7): the repo's production solvers
(core/schedulers.py) precompute per-step coefficient TABLES. To pin them
against something that cannot share their algebra, this generator
re-implements the reference's schedulers in the diffusers STATEFUL,
sample-space form — a literal transcription of the documented update
rules, structured like diffusers' own classes (model-output history list,
``lower_order_nums`` warmup counter, per-call order selection):

* DPM-Solver++ multistep, order 2, midpoint, ``lower_order_final=True``,
  epsilon prediction — the exact config of /root/reference/app.py:14-25 —
  per the DPM-Solver++ paper (Lu et al. 2022, eqs. for the multistep
  second-order update) and the diffusers ``DPMSolverMultistepScheduler``
  semantics of the ``predict_epsilon`` era the reference targets
  (``prev_timestep = 0`` on the terminal step, i.e. tables indexed at
  t=0 — NOT sigma=0).
* DDIM, eta=0, ``set_alpha_to_one=True`` (diffusers default), leading
  spacing — the trainer's noising scheduler (trainer.py:188-194).

The per-step (c_x, c_m0, c_m1) coefficients are NOT copied from the plan
code: they are *probed* out of the stateful updates with basis inputs
(the updates are linear in (x, m0, m1) once the step index is fixed).
A short "perfect-model" trajectory (eps = sin(1.7*x + 0.01*t), fp64) is
recorded as an end-to-end cross-check.
"""

from __future__ import annotations

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def base_tables():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                        dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    alpha_t = np.sqrt(ac)
    sigma_t = np.sqrt(1.0 - ac)
    lambda_t = np.log(alpha_t) - np.log(sigma_t)
    return ac, alpha_t, sigma_t, lambda_t


class StatefulDPMSolverPP:
    """diffusers-shaped DPMSolverMultistepScheduler (2M midpoint, eps)."""

    def __init__(self, num_steps: int, lower_order_final: bool = True):
        self.ac, self.alpha_t, self.sigma_t, self.lambda_t = base_tables()
        self.timesteps = (
            np.linspace(0, 999, num_steps + 1).round()[::-1][:-1].astype(int)
        )
        self.num_steps = num_steps
        self.lower_order_final = lower_order_final
        self.model_outputs = [None, None]   # x0-converted history
        self.lower_order_nums = 0

    # -- the two update rules, literal transcriptions -------------------
    def first_order_update(self, m0, t, prev_t, x):
        lam_t, lam_s = self.lambda_t[prev_t], self.lambda_t[t]
        a_t, s_t, s_s = self.alpha_t[prev_t], self.sigma_t[prev_t], self.sigma_t[t]
        h = lam_t - lam_s
        return (s_t / s_s) * x - (a_t * (np.expm1(-h))) * m0

    def second_order_update(self, m1, m0, t_s1, t_s0, prev_t, x):
        lam_t, lam_s0, lam_s1 = (self.lambda_t[prev_t], self.lambda_t[t_s0],
                                 self.lambda_t[t_s1])
        a_t, s_t, s_s0 = (self.alpha_t[prev_t], self.sigma_t[prev_t],
                          self.sigma_t[t_s0])
        h, h_0 = lam_t - lam_s0, lam_s0 - lam_s1
        r0 = h_0 / h
        D0, D1 = m0, (1.0 / r0) * (m0 - m1)
        # midpoint
        return ((s_t / s_s0) * x - (a_t * np.expm1(-h)) * D0
                - 0.5 * (a_t * np.expm1(-h)) * D1)

    # -- diffusers step() control flow ----------------------------------
    def step(self, eps, t, x):
        idx = int(np.where(self.timesteps == t)[0][0])
        prev_t = 0 if idx == len(self.timesteps) - 1 else self.timesteps[idx + 1]
        m0 = (x - self.sigma_t[t] * eps) / self.alpha_t[t]
        self.model_outputs = [self.model_outputs[-1], m0]
        lof = (self.lower_order_final and idx == len(self.timesteps) - 1
               and len(self.timesteps) < 15)
        if self.lower_order_nums < 1 or lof or len(self.timesteps) == 1:
            out = self.first_order_update(m0, t, prev_t, x)
        else:
            t_s1 = self.timesteps[idx - 1]
            out = self.second_order_update(self.model_outputs[0], m0,
                                           t_s1, t, prev_t, x)
        if self.lower_order_nums < 1:
            self.lower_order_nums += 1
        return out

    # -- coefficient probing (basis inputs through the real control flow)
    def probe_coefficients(self):
        """The update at fixed i is linear: x' = c_x*x + c_m0*m0 + c_m1*m1.
        Probe with unit vectors instead of restating the algebra."""
        rows = []
        for i, t in enumerate(self.timesteps):
            prev_t = (0 if i == len(self.timesteps) - 1
                      else self.timesteps[i + 1])
            lof = (self.lower_order_final and i == len(self.timesteps) - 1
                   and len(self.timesteps) < 15)
            first = (i == 0) or lof or len(self.timesteps) == 1
            if first:
                c_x = self.first_order_update(0.0, t, prev_t, 1.0)
                c_m0 = self.first_order_update(1.0, t, prev_t, 0.0)
                c_m1 = 0.0
            else:
                t_s1 = self.timesteps[i - 1]
                c_x = self.second_order_update(0.0, 0.0, t_s1, t, prev_t, 1.0)
                c_m0 = self.second_order_update(0.0, 1.0, t_s1, t, prev_t, 0.0)
                c_m1 = self.second_order_update(1.0, 0.0, t_s1, t, prev_t, 0.0)
            rows.append((float(c_x), float(c_m0), float(c_m1)))
        return rows


class StatefulDDIM:
    """diffusers DDIMScheduler, eta=0, set_alpha_to_one=True, leading."""

    def __init__(self, num_steps: int):
        self.ac, _, _, _ = base_tables()
        self.step_ratio = 1000 // num_steps
        self.timesteps = (
            (np.arange(num_steps) * self.step_ratio).round()[::-1].astype(int)
        )
        self.final_alpha_cumprod = 1.0  # set_alpha_to_one=True

    def step(self, eps, t, x):
        prev_t = t - self.step_ratio
        ac_t = self.ac[t]
        ac_prev = self.ac[prev_t] if prev_t >= 0 else self.final_alpha_cumprod
        x0 = (x - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t)
        return np.sqrt(ac_prev) * x0 + np.sqrt(1 - ac_prev) * eps


def synthetic_eps(x, t):
    """Deterministic stand-in model (fp64): the same formula is replayed in
    tests against the production plan tables."""
    return np.sin(1.7 * x + 0.01 * float(t))


def trajectory(solver, x0_vals):
    x = np.array(x0_vals, dtype=np.float64)
    out = []
    for t in solver.timesteps:
        x = solver.step(synthetic_eps(x, t), int(t), x)
        out.append(x.tolist())
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    x_init = [1.25, -0.5, 0.03125, 2.0, -1.0]
    doc = {
        "_meta": {
            "generator": "tools/gen_scheduler_fixtures.py",
            "provenance": "stateful sample-space re-implementation of the "
                          "diffusers DPMSolverMultistepScheduler (2M "
                          "midpoint, eps, lower_order_final, linspace "
                          "spacing, predict_epsilon-era terminal "
                          "prev_timestep=0) and DDIMScheduler (eta=0, "
                          "set_alpha_to_one, leading spacing); "
                          "coefficients probed with basis inputs, fp64",
            "reference_config": "app.py:14-25 / trainer.py:188-194",
            "synthetic_model": "eps(x, t) = sin(1.7*x + 0.01*t)",
            "x_init": x_init,
        }
    }
    for steps in (10, 25, 50):
        s = StatefulDPMSolverPP(steps)
        doc[f"dpmpp_{steps}"] = {
            "timesteps": s.timesteps.tolist(),
            "coefficients_c_x_c_m0_c_m1": s.probe_coefficients(),
            "trajectory": trajectory(StatefulDPMSolverPP(steps), x_init),
        }
        d = StatefulDDIM(steps)
        doc[f"ddim_{steps}"] = {
            "timesteps": d.timesteps.tolist(),
            "trajectory": trajectory(StatefulDDIM(steps), x_init),
        }
    # a >=15-step case where lower_order_final must NOT kick in
    s = StatefulDPMSolverPP(20)
    doc["dpmpp_20"] = {
        "timesteps": s.timesteps.tolist(),
        "coefficients_c_x_c_m0_c_m1": s.probe_coefficients(),
        "trajectory": trajectory(StatefulDPMSolverPP(20), x_init),
    }
    path = os.path.join(OUT, "scheduler_golden.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""HBM budgeting: pick ``UNetConfig.remat`` automatically per request.

The reference exposes 64-1024px generation from one UI slider
(/root/reference/app.py:188-193) and simply OOMs on CUDA when the guided
backward (modules/pipeline.py:159 ``torch.autograd.grad``) outgrows the
card. Here the runtime estimates the guided program's HBM need per
(batch, height, width) from XLA's own ahead-of-time memory accounting and
flips rematerialization on only when the plain program wouldn't fit —
callers never pass a --remat flag (VERDICT r2 item 10).

Calibration: ``python tools/calibrate_remat.py`` AOT-compiles the full
sketch-guided sampling fn per case on the attached TPU and prints
``compiled.memory_analysis()`` totals; the measured rows live in
``CALIBRATION`` below. The estimator fits ``total = base + slope * (batch
* latent_pixels)`` per remat setting as an **upper envelope**: steepest
per-case slope AND the base lifted so every calibration row sits on or
under the fitted line (pinned by tests/test_memory.py). Interpolation
therefore errs toward flipping remat early (a few % throughput lost,
never an OOM); ``choose_remat``'s headroom then covers what the fit
can't — programs resident alongside the sampler and allocator
fragmentation, not residual fit error.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

# (size_px, batch, remat, total_gib) — XLA memory_analysis() totals
# (argument + output + temp bytes) for the jit'd guided sampling fn,
# bf16 compute, fp32 params, measured on v5e via tools/calibrate_remat.py
# (2026-08-19 run; args ≈ 3.23 GiB of those totals is the fp32 param
# tree). Regenerate after any UNet/pipeline structural change.
CALIBRATION: List[Tuple[int, int, bool, float]] = [
    (512, 1, False, 5.477),
    (512, 8, False, 8.509),
    (768, 4, False, 8.893),
    (1024, 1, False, 6.748),
    (1024, 2, False, 8.298),
    (768, 4, True, 6.189),
    (1024, 2, True, 6.117),
    (1024, 4, True, 7.224),
]

# Fitted coefficients: total_gib ≈ BASE_GIB[remat] + SLOPE[remat] * mpix
# where mpix = batch * (H/8) * (W/8) / 2**20 (latent megapixels).
# Output of ``tools/calibrate_remat.py --fit`` over CALIBRATION.
_BASE_GIB = {False: 5.12, True: 4.934}
_SLOPE_GIB_PER_MPIX = {False: 108.5, True: 37.9}

_DEFAULT_HBM_GIB = 15.7  # v5e bytes_limit (16G chip minus runtime reserve)


def device_hbm_gib(default: float = _DEFAULT_HBM_GIB) -> float:
    """Queryable HBM budget of device 0 in GiB.

    Honors ``SKETCH2IMG_HBM_GIB`` (tests / heterogeneous fleets), then the
    PJRT ``memory_stats()['bytes_limit']`` when the backend reports one
    (the axon tunnel does), else ``default``.
    """
    env = os.environ.get("SKETCH2IMG_HBM_GIB")
    if env:
        return float(env)
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return stats["bytes_limit"] / 2**30
    except Exception:
        pass
    return default


def estimate_guided_gib(
    batch: int, height: int, width: int, remat: bool, *, vae_scale: int = 8
) -> float:
    """Predicted peak HBM (GiB) of the jit'd guided sampling program."""
    mpix = batch * (height // vae_scale) * (width // vae_scale) / 2**20
    return _BASE_GIB[remat] + _SLOPE_GIB_PER_MPIX[remat] * mpix


def choose_remat(
    batch: int,
    height: int,
    width: int,
    *,
    budget_gib: Optional[float] = None,
    headroom: float = 0.92,
) -> bool:
    """True iff the non-remat guided program is predicted NOT to fit.

    ``headroom`` keeps a margin under the budget for the VAE decode /
    safety programs resident alongside the sampler and for allocator
    fragmentation.
    """
    budget = (budget_gib if budget_gib is not None else device_hbm_gib())
    return estimate_guided_gib(batch, height, width, False) > headroom * budget


def fit_from_calibration(
    rows: List[Tuple[int, int, bool, float]], *, vae_scale: int = 8
):
    """(size, batch, remat, total_gib) rows -> ({remat: base}, {remat: slope}).

    Upper envelope: slope = max per-case incremental slope between rows,
    base = max over rows of (total - slope * pixel_term), so every
    calibration point sits on or UNDER the fitted line — the estimator
    never under-predicts a measured case (ADVICE r3: a min-base fit left
    the 512px/bs8 row ~0.2 GiB above the line, leaning on choose_remat's
    headroom to absorb it). Used offline by tools/calibrate_remat.py
    --fit to print the constants pasted above.
    """
    bases, slopes = {}, {}
    for flag in (False, True):
        pts = sorted(
            (b * (s // vae_scale) ** 2 / 2**20, t)
            for s, b, r, t in rows
            if r == flag
        )
        if len(pts) < 2:
            continue
        slope = max(
            (t2 - t1) / (m2 - m1)
            for (m1, t1), (m2, t2) in zip(pts, pts[1:])
            if m2 > m1
        )
        base = max(t - slope * m for m, t in pts)
        bases[flag], slopes[flag] = base, slope
    return bases, slopes

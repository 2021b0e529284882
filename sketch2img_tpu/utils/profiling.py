"""Tracing / profiling (SURVEY.md §5 — the reference has only wall-clock
prints; here: jax.profiler traces + a sound device timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timeit(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Mean seconds per call. Syncs by fetching a scalar REDUCTION of the
    output — on tunneled TPU platforms ``block_until_ready`` can return
    before execution finishes, so a dependent host fetch is the only
    reliable barrier. The (network) fetch latency is amortized by running
    ``iters`` calls inside the timed region and subtracting a measured
    no-op fetch baseline.
    """
    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    tiny = jnp.ones((8, 8))
    noop = jax.jit(jnp.sum)
    fetch(noop(tiny))
    t0 = time.perf_counter()
    fetch(noop(tiny))
    baseline = time.perf_counter() - t0

    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    # fetch the last output: earlier iterations are serialized behind it on
    # the single device stream, so this forces completion of all of them
    fetch(out)
    total = time.perf_counter() - t0
    return max(0.0, (total - baseline) / iters)

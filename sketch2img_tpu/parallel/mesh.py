"""Device mesh / sharding utilities — the reference's distributed backend
(HF Accelerate -> torch DDP -> NCCL, trainer.py:91-98,144-146) redesigned as
XLA-native SPMD.

Design (SURVEY.md §2.3): the reference's only parallelism is data parallel.
Here DP is a first-class mesh axis (``data``); a ``model`` axis exists in the
mesh API for tensor-parallel growth (the §7 hard-parts escape hatch for
vjp-through-UNet HBM pressure) but SD1.x fits one chip, so its size defaults
to 1. Gradient all-reduce is the implicit psum jit inserts for params
replicated over ``data``; no explicit collectives needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (single-controller): call once per process before any
    jax op on multi-host pods. Replaces the reference's LOCAL_RANK plumbing
    (trainer.py:79) — afterwards jax.process_index()/process_count() give
    rank identity and `make_mesh()` spans all global devices. No-op when
    already initialized or single-process."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # benign in single-process runs: already initialized, no coordinator
        # configured, or the backend was already brought up (no distributed
        # setup needed then)
        msg = str(e).lower()
        if not any(t in msg for t in ("already", "coordinator",
                                      "must be called before")):
            raise


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier — replaces accelerator.wait_for_everyone
    (trainer.py:271)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """(data, model) mesh over the given (default: all) devices.

    The data axis rides DCN/outer ICI, the model axis inner ICI — callers
    that grow ``model_parallel`` keep tensor collectives on the fastest
    links, matching the scaling-book recipe.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Replicate a param pytree across the mesh (DP: weights everywhere)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)


def shard_batch(mesh: Mesh, batch):
    """Shard every array in a batch pytree along its leading axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def shard_batch_array(mesh: Mesh, x):
    """Shard ONE array's leading axis over ``data`` — multihost-safe: on a
    process-spanning mesh the value goes through the host first (it is
    identical on every process — request-level inputs every process sees),
    making the split across processes' devices unambiguous. Shared by both
    serving pipelines (runtime.SketchGuidedPipeline and the injection
    route) so the multihost contract can't drift between them."""
    if jax.process_count() > 1:
        x = np.asarray(x)
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))


def fetch_global(mesh: Optional[Mesh], x) -> np.ndarray:
    """Device -> host fetch that also works when ``mesh`` spans processes:
    a multihost global array isn't locally addressable, so gather it —
    every process returns the SAME full batch (docs/SCALING.md serving
    recipe)."""
    if mesh is None or jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

"""Persistent XLA compilation cache for serving.

The jit'd guided sampling loop takes 3-5 minutes to compile on a v5e; with
the persistent cache a warm process start replays the compilation from disk
in seconds.  The reference has no equivalent (torch eager); for a
jit-compiled framework this is part of the serving surface, so the pipeline
enables it by default on TPU backends.

Opt out with SKETCH2IMG_NO_COMPILE_CACHE=1; override the location with
SKETCH2IMG_COMPILE_CACHE=<dir> (default: ~/.cache/sketch2img_tpu/jax).
"""

from __future__ import annotations

import os

_ENABLED_DIR = None


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently point JAX's persistent compilation cache at
    ``cache_dir``. Returns True if the cache is active AT THE REQUESTED
    location; False if disabled, or if an earlier caller already pointed
    it at a different explicit directory (it cannot be re-pointed
    mid-process without invalidating in-flight writes)."""
    global _ENABLED_DIR
    if _ENABLED_DIR is not None:
        return cache_dir is None or cache_dir == _ENABLED_DIR
    if os.environ.get("SKETCH2IMG_NO_COMPILE_CACHE"):
        return False

    import jax

    explicit = cache_dir is not None or "SKETCH2IMG_COMPILE_CACHE" in os.environ
    if not explicit and jax.default_backend() not in ("tpu", "axon"):
        return False  # CPU runs (tests) compile fast; don't write a cache
    cache_dir = (cache_dir
                 or os.environ.get("SKETCH2IMG_COMPILE_CACHE")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "sketch2img_tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return False
    _ENABLED_DIR = cache_dir
    return True

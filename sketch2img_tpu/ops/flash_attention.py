"""Pallas flash-attention for TPU (placeholder gate in round-1 skeleton).

The real kernel lands behind ``supported()``; until then every call routes to
the fused-XLA path, which is already competitive at SD1.x sequence lengths
(<= 16k image tokens). Keeping the gate here lets the models bind to a stable
API while the kernel is iterated on TPU hardware.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def supported(q, k, v, mask) -> bool:
    return False


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    raise NotImplementedError

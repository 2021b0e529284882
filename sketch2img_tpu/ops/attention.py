"""Multi-head attention with pluggable TPU backends.

This is the native-for-native replacement for the reference's xformers
memory-efficient attention CUDA kernels (enabled at /root/reference/app.py:43,
trainer.py:107, clip_guided_trainer.py:100, evaluation.py:48,
clip_guided_inf.py:44). Backends:

  * ``"xla"``    — einsum + fp32 softmax; XLA fuses this well on TPU and it
                   runs everywhere (CPU test meshes included).
  * ``"pallas"`` — hand-written flash-attention kernel (ops/flash_attention.py)
                   tiled for the MXU; used on TPU for the large image-token
                   self-attentions where HBM traffic dominates.
  * ``"auto"``   — pallas on TPU when shapes qualify, else xla.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"


def set_default_attention_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    assert backend in ("auto", "xla", "pallas")
    _DEFAULT_BACKEND = backend


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    # (B, H, Nq, D) x (B, H, Nk, D) — softmax statistics in fp32 for bf16
    # inputs (parity with xformers' fp32 accumulation).
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Attention over already-projected q/k/v of shape (B, N, H*D).

    Returns (B, Nq, H*D). `mask` is an additive bias broadcastable to
    (B, H, Nq, Nk).
    """
    backend = backend or _DEFAULT_BACKEND
    d = q.shape[-1] // num_heads
    scale = d**-0.5
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))

    if backend in ("pallas", "auto"):
        from sketch2img_tpu.ops import flash_attention as fa

        if fa.supported(qh, kh, vh, mask):
            return _merge_heads(fa.flash_attention(qh, kh, vh, scale, mask))
        if backend == "pallas":
            raise ValueError(
                f"pallas flash attention unsupported for shapes q={q.shape} k={k.shape}"
            )
    return _merge_heads(_xla_attention(qh, kh, vh, scale, mask))

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

# Tensor-parallel serving context: (mesh, model_axis_name) or None. When set,
# the flash path runs inside a shard_map over the model axis so the Pallas
# kernel (a custom call without a GSPMD partitioning rule) executes on each
# shard's LOCAL heads — TP shards whole heads (parallel/tp.py), so the
# per-shard attention is exact with zero collectives.
_TP_CONTEXT = None


def set_tensor_parallel_context(mesh=None, axis_name: str = "model") -> None:
    """Enable (or clear, with mesh=None) head-sharded flash attention for
    tensor-parallel serving. ``mesh`` must carry ``axis_name``; attention
    sites whose head count doesn't divide by the axis size fall back to the
    replicated path unchanged."""
    global _TP_CONTEXT
    _TP_CONTEXT = None if mesh is None else (mesh, axis_name)


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


def _tp_flash(qh, kh, vh, scale, mesh, axis, kv_len=None):
    """Flash attention over (B, H, N, D) with H sharded on ``axis``: each
    device runs the Pallas kernel on its local head slice. Differentiable
    (shard_map carries the custom_vjp through), so the TP guided path keeps
    the flash backward too."""
    from jax.sharding import PartitionSpec as P

    from sketch2img_tpu.ops import flash_attention as fa

    spec = P(None, axis, None, None)
    f = jax.shard_map(
        lambda q, k, v: fa.flash_attention(q, k, v, scale, None, kv_len),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # pallas_call's out ShapeDtypeStructs carry no vma annotation; the
        # kernel is per-shard elementwise-in-heads so the check adds nothing
        check_vma=False,
    )
    return f(qh, kh, vh)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Attention over already-projected q/k/v of shape (B, N, H*D).

    Returns (B, Nq, H*D). `mask` is an additive bias broadcastable to
    (B, H, Nq, Nk). ``kv_len``: true key count when k/v carry a padded
    tail (pre-padding keys to a block multiple lets the flash path skip
    its HBM pad copies; tail keys are masked out exactly).
    """
    backend = backend or _DEFAULT_BACKEND
    d = q.shape[-1] // num_heads
    scale = d**-0.5
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    if kv_len is not None and kv_len >= k.shape[1]:
        kv_len = None  # no padded tail

    if backend in ("pallas", "auto"):
        from sketch2img_tpu.ops import flash_attention as fa

        use_flash = (
            fa.supported(qh, kh, vh, mask)
            if backend == "pallas"
            else fa.preferred(qh, kh, vh, mask)
        )
        if use_flash:
            tp = _TP_CONTEXT
            if tp is not None:
                mesh, axis = tp
                size = mesh.shape[axis]
                if size > 1 and num_heads % size == 0:
                    return _merge_heads(
                        _tp_flash(qh, kh, vh, scale, mesh, axis, kv_len))
            return _merge_heads(
                fa.flash_attention(qh, kh, vh, scale, mask, kv_len))
        if backend == "pallas" and not fa.supported(qh, kh, vh, mask):
            raise ValueError(
                f"pallas flash attention unsupported for shapes q={q.shape} k={k.shape}"
            )
    if kv_len is not None:
        tail = jnp.where(
            jnp.arange(k.shape[1]) < kv_len, 0.0, -1e30
        ).reshape(1, 1, 1, k.shape[1])
        mask = tail if mask is None else mask + tail
    return _merge_heads(_xla_attention(qh, kh, vh, scale, mask))

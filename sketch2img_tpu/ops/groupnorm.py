"""Fused GroupNorm(+SiLU) Pallas kernel — the second native-kernel
obligation (SURVEY.md §2.2: fused GroupNorm/elementwise kernels replacing
cuDNN fusion in the reference's dependency stack).

Two-phase sequential grid per sample: grid = (B, 2, HW_tiles).
  phase 0: accumulate per-channel sum / sum-of-squares over HW tiles into
           VMEM scratch (lane-parallel reductions).
  phase 1: finalize group statistics once (channel sums -> group sums via a
           tiny MXU matmul with a constant group-membership matrix — no
           cross-lane reshapes), then normalize + affine (+ SiLU) each tile.

Statistics are fp32 regardless of input dtype (parity with the fp32-stat
GroupNorm module). Backward is exact-math XLA recomputation via custom_vjp
— GN is bandwidth-bound and its backward shares the forward's traffic.

Measured on v5e: both this kernel and XLA's fused GN+SiLU run at
noise-level cost (<25 us at (1,64,64,1280); ~1 ms per UNet forward in
total), so the models keep the XLA path by default and this kernel is an
opt-in building block — the perf-critical native kernel is
ops/flash_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_INTERPRET = False


def set_interpret_mode(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def supported(x, num_groups: int) -> bool:
    if not _INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    b, h, w, c = x.shape
    if c % 128 != 0 or c % num_groups != 0:
        return False
    hw = h * w
    return hw % 8 == 0 and hw * c * x.dtype.itemsize <= (1 << 22) * 8  # <=32MB


def _kernel(x_ref, scale_ref, bias_ref, gmat_ref, o_ref,
            sum_scr, sq_scr, mul_scr, add_scr, *,
            eps: float, silu: bool, inv_count: float):
    phase = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((phase == 0) & (t == 0))
    def _init():
        sum_scr[:] = jnp.zeros_like(sum_scr)
        sq_scr[:] = jnp.zeros_like(sq_scr)

    @pl.when(phase == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (HWT, C)
        sum_scr[0, :] += jnp.sum(x, axis=0)
        sq_scr[0, :] += jnp.sum(x * x, axis=0)

    @pl.when((phase == 1) & (t == 0))
    def _finalize_stats():
        # per-channel sums -> per-group sums broadcast back per channel:
        # (1, C) @ (C, C) group-membership matrix (MXU, no lane reshapes)
        g = gmat_ref[:]  # (C, C), fp32: g[i,j] = 1 if group(i)==group(j)
        s = jax.lax.dot_general(sum_scr[:1, :], g, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q = jax.lax.dot_general(sq_scr[:1, :], g, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mean = s * inv_count
        var = q * inv_count - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        scale = scale_ref[:].astype(jnp.float32)
        bias = bias_ref[:].astype(jnp.float32)
        mul_scr[:1, :] = inv * scale
        add_scr[:1, :] = bias - mean * inv * scale

    @pl.when(phase == 1)
    def _normalize():
        x = x_ref[0].astype(jnp.float32)
        y = x * mul_scr[:1, :] + add_scr[:1, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


def _fused_forward(x, scale, bias, num_groups, eps, silu):
    b, h, w, c = x.shape
    hw = h * w
    # tile HW so a block stays well under VMEM
    tile = hw
    while tile * c * 4 > (1 << 21):  # 2MB fp32 working set per tile
        tile //= 2
    tile = max(tile, 8)
    assert hw % tile == 0, (hw, tile)

    xr = x.reshape(b, hw, c)
    cg = c // num_groups
    gids = jnp.arange(c) // cg
    gmat = (gids[:, None] == gids[None, :]).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, silu=silu,
                          inv_count=1.0 / (hw * cg)),
        grid=(b, 2, hw // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, p, t: (i, t, 0)),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, t: (0, 0)),
            pl.BlockSpec((c, c), lambda i, p, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, p, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, c), jnp.float32),  # channel sums
            pltpu.VMEM((8, c), jnp.float32),  # channel sumsq
            pltpu.VMEM((8, c), jnp.float32),  # fused multiplier
            pltpu.VMEM((8, c), jnp.float32),  # fused offset
        ],
        interpret=_INTERPRET,
    )(xr, scale.reshape(1, c), bias.reshape(1, c), gmat)
    return out.reshape(b, h, w, c)


def _xla_reference(x, scale, bias, num_groups, eps, silu):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, scale, bias, num_groups, eps, silu):
    return _fused_forward(x, scale, bias, num_groups, eps, silu)


def _fused_fwd(x, scale, bias, num_groups, eps, silu):
    return _fused_forward(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


def _fused_bwd(num_groups, eps, silu, res, g):
    x, scale, bias = res

    def f(x, scale, bias):
        return _xla_reference(x, scale, bias, num_groups, eps, silu)

    _, vjp = jax.vjp(f, x, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_groupnorm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
) -> jnp.ndarray:
    """GroupNorm + affine (+ SiLU) on NHWC input; Pallas kernel when
    supported, XLA otherwise."""
    if supported(x, num_groups):
        return _fused(x, scale, bias, num_groups, eps, silu)
    return _xla_reference(x, scale, bias, num_groups, eps, silu)

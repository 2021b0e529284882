"""Shared Stable-Diffusion building blocks (Flax, NHWC, bf16-ready).

These re-implement — TPU-first, not as a port — the diffusers modules the
reference borrows for its entire model runtime (SURVEY.md §2.2 D1/D2):
resnet blocks, spatial transformers, up/downsampling, timestep embeddings.
Conv layout is NHWC (TPU-native); GroupNorm reductions and softmax run in
fp32 regardless of compute dtype.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.ops.attention import multi_head_attention
from sketch2img_tpu.ops.conv2d import Conv3x3


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, SD1.x convention (flip_sin_to_cos=True,
    freq_shift=0). timesteps: (B,) -> (B, dim). Computed in fp32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# materialize the norm input once instead of letting XLA fuse (and
# recompute) expensive producers into each of the norm's reduce/normalize
# consumer passes. Isolated norms are fast (<=8us) but in the full UNet XLA
# was duplicating big producer fusions into all three passes; the barrier
# cut the bs1 512px forward 11.3 -> 9.5 ms on v5e. Off-switch for A/B.
_NORM_INPUT_BARRIER = True


def set_norm_input_barrier(on: bool) -> None:
    global _NORM_INPUT_BARRIER
    _NORM_INPUT_BARRIER = on


class _NormParams(nn.Module):
    """scale/bias parameter pair registered under a fixed child name so the
    manual-math norms below keep the exact param tree the nn.GroupNorm /
    nn.LayerNorm wrappers had (checkpoint converters untouched)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics (params fp32, output in input dtype).

    Written as two fp32 reductions plus ONE fused `x * mul + add` elementwise
    pass emitting the input dtype directly (no materialized fp32 copy of the
    activation). The per-CHANNEL-sums-first structure keeps the big-tensor
    reduction over the major (spatial) axes with the minor dim left at c —
    never reshape the activation to (..., g, c/g), whose c/g-lane minor dim
    pads 10->128 on 320-channel tensors. Fast-variance (E[x^2]-E[x]^2 in
    fp32) matches flax's default.

    A profiler trace showed the UNet's norms costing ~3 ms of an 11.5 ms bs1
    forward; isolated norms are fast, the cost was XLA re-fusing expensive
    producers into each consumer pass — fixed by the module-level norm-input
    optimization barrier above, not by the formulation (measured neutral vs
    nn.GroupNorm, kept for the barrier hook + no-copy property).
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _NORM_INPUT_BARRIER:
            x = jax.lax.optimization_barrier(x)
        b, h, w, c = x.shape
        g = self.num_groups
        cg = c // g
        scale, bias = _NormParams(c, name="GroupNorm_0")()
        # per-CHANNEL sums first: the big-tensor reduction runs over the
        # major (spatial) axes with the minor dim left at c — never reshape
        # the activation to (..., g, c/g), whose c/g-lane minor dim pads
        # 10->128 on 320-channel tensors and wastes ~13x the bandwidth
        s1 = jnp.sum(x.astype(jnp.float32), axis=(1, 2))            # (b, c)
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
        # channel sums -> group stats on the tiny (b, c) array only
        n = h * w * cg
        m = s1.reshape(b, g, cg).sum(-1, keepdims=True) / n         # (b, g, 1)
        m2 = s2.reshape(b, g, cg).sum(-1, keepdims=True) / n
        inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + self.epsilon)
        sr = scale.astype(jnp.float32).reshape(1, g, cg)
        br = bias.astype(jnp.float32).reshape(1, g, cg)
        mul = (inv * sr).reshape(b, 1, 1, c)
        add = (br - m * inv * sr).reshape(b, 1, 1, c)
        return (x.astype(jnp.float32) * mul + add).astype(x.dtype)


class Conv1x1(nn.Module):
    """1x1 conv lowered as one channel-contraction dot_general.

    XLA's conv lowering picked a {3,0,2,1:T(2,128)} output layout for the
    up-block 1x1 shortcut convs and ran ~4.7x off the FLOP bound (118 us
    for 960->320 at 64^2, ~25 us bound — bs2 profiler trace); a plain
    (B*H*W, Cin) x (Cin, Cout) dot keeps the row-major tiling. Parameter
    tree matches nn.Conv ("kernel" (1,1,Cin,Cout), "bias") so torch
    converters and checkpoints are untouched.
    """

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.compute_dtype)
        y = jax.lax.dot_general(
            x, kernel[0, 0].astype(self.compute_dtype),
            (((3,), (0,)), ((), ())), preferred_element_type=self.compute_dtype,
        )
        return y + bias.astype(y.dtype)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3x3 [-> +time_emb] -> GN -> SiLU -> conv3x3 -> +skip.

    Matches diffusers ResnetBlock2D as configured by SD1.x (eps 1e-5 in the
    UNet, 1e-6 in the VAE; conv shortcut 1x1 when channels change).
    """

    out_channels: int
    use_temb: bool = True
    epsilon: float = 1e-5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm(32, self.epsilon, name="norm1")(x)
        h = nn.silu(h)
        h = Conv3x3(
            self.out_channels, compute_dtype=self.compute_dtype, name="conv1"
        )(h)
        if self.use_temb:
            assert temb is not None
            t = nn.Dense(self.out_channels, dtype=self.compute_dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm(32, self.epsilon, name="norm2")(h)
        h = nn.silu(h)
        h = Conv3x3(
            self.out_channels, compute_dtype=self.compute_dtype, name="conv2"
        )(h)
        if in_ch != self.out_channels:
            x = Conv1x1(
                self.out_channels, compute_dtype=self.compute_dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class Downsample(nn.Module):
    """conv3x3 stride 2. UNet uses symmetric pad 1; the VAE encoder uses
    asymmetric (0,1) padding (diffusers Downsample2D padding=0 + manual pad)."""

    out_channels: int
    asymmetric: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((0, 1), (0, 1)) if self.asymmetric else ((1, 1), (1, 1))
        return Conv3x3(
            self.out_channels, stride=2, padding=pad,
            compute_dtype=self.compute_dtype, name="conv",
        )(x)


class _UpsampleConv(nn.Module):
    """Param holder for Upsample's conv (keeps the ``conv/kernel`` checkpoint
    path of the old repeat+Conv3x3 formulation)."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sketch2img_tpu.ops.subpixel import upsample2x_conv3x3

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.compute_dtype)
        return upsample2x_conv3x3(x, kernel.astype(self.compute_dtype), bias)


class Upsample(nn.Module):
    """Nearest 2x then conv3x3 (diffusers Upsample2D use_conv=True), lowered
    as four subpixel phase convs (ops/subpixel.py) — algebraically exact."""

    out_channels: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _UpsampleConv(
            self.out_channels, compute_dtype=self.compute_dtype, name="conv"
        )(x)


class CrossAttention(nn.Module):
    """q from hidden states, k/v from context (or hidden states if None).

    Projection layout parity with diffusers CrossAttention (to_q/k/v no bias,
    to_out with bias); attention math runs through ops.attention (fp32
    softmax, pluggable TPU backend).
    """

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # defaults to query_dim
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        kv_len: Optional[int] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_v")(ctx)
        out = multi_head_attention(q, k, v, self.heads, mask=mask, kv_len=kv_len)
        return nn.Dense(self.query_dim, dtype=self.compute_dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """Transformer feed-forward with GEGLU gate: Dense(8d) -> x*gelu(gate) -> Dense(d)."""

    dim: int
    mult: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.compute_dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact-erf gelu (torch F.gelu default) in fp32; under bf16 compute
        # the tanh approximation's error (<3e-3 abs, peak near |x|=2) is
        # below bf16 roundoff and the erf lowering costs 3-6x on the VPU
        # (tools/bench_gelu.py: 574us vs 93us at the SD 64x64 FFN shape)
        approx = jnp.dtype(self.compute_dtype) == jnp.dtype(jnp.bfloat16)
        h = h * nn.gelu(gate, approximate=approx)
        return nn.Dense(self.dim, dtype=self.compute_dtype, name="proj_out")(h)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics — same fusion-friendly formulation as
    GroupNorm above (fp32 reductions, one fused elementwise pass out)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _NORM_INPUT_BARRIER:
            x = jax.lax.optimization_barrier(x)
        c = x.shape[-1]
        scale, bias = _NormParams(c, name="LayerNorm_0")()
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + self.epsilon)
        sf = scale.astype(jnp.float32)
        mul = inv * sf
        add = bias.astype(jnp.float32) - m * inv * sf
        return (x.astype(jnp.float32) * mul + add).astype(x.dtype)

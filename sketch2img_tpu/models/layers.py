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


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics (params fp32, output in input dtype)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32
        )(x.astype(jnp.float32))
        return y.astype(dtype)


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
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.compute_dtype, name="conv_shortcut"
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


class Upsample(nn.Module):
    """Nearest 2x then conv3x3 (diffusers Upsample2D use_conv=True)."""

    out_channels: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv3x3(
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
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.compute_dtype, name="to_v")(ctx)
        out = multi_head_attention(q, k, v, self.heads, mask=mask)
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
    """LayerNorm with fp32 statistics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        return nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(dtype)

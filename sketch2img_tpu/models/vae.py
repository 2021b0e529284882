"""AutoencoderKL — the SD1.x VAE (encode x0.18215 / decode /0.18215).

Reference usage: /root/reference/app.py:29-31,109 (sketch target encode),
modules/pipeline.py:163-174 (decode), trainer.py:219-220 (training encodes).
The architecture re-implements the SD1.x KL autoencoder TPU-first (NHWC,
fp32 GroupNorm statistics, attention through ops.attention).

SD1.x config: block_out (128,256,512,512), 2 resnets per encoder block,
3 per decoder block, single mid attention (one head over all channels),
GroupNorm eps 1e-6, latent 4ch, scaling 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.models.layers import GroupNorm, ResnetBlock, Downsample, Upsample
from sketch2img_tpu.ops.attention import multi_head_attention

SCALING_FACTOR = 0.18215


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (diffusers
    AttentionBlock with num_head_channels=None)."""

    channels: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(32, 1e-6, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.compute_dtype, name="query")(y)
        k = nn.Dense(c, dtype=self.compute_dtype, name="key")(y)
        v = nn.Dense(c, dtype=self.compute_dtype, name="value")(y)
        attn = multi_head_attention(q, k, v, num_heads=1)
        y = nn.Dense(c, dtype=self.compute_dtype, name="proj_attn")(attn)
        return residual + y.reshape(b, h, w, c)


class MidBlock(nn.Module):
    channels: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.compute_dtype
        x = ResnetBlock(self.channels, use_temb=False, epsilon=1e-6,
                        compute_dtype=dt, name="resnet_0")(x)
        x = VAEAttention(self.channels, compute_dtype=dt, name="attn")(x)
        x = ResnetBlock(self.channels, use_temb=False, epsilon=1e-6,
                        compute_dtype=dt, name="resnet_1")(x)
        return x


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2


SD15_VAE_CONFIG = VAEConfig()


class Encoder(nn.Module):
    config: VAEConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg, dt = self.config, self.compute_dtype
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dt, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, use_temb=False, epsilon=1e-6, compute_dtype=dt,
                                name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, asymmetric=True, compute_dtype=dt,
                               name=f"down_{i}_downsample")(h)
        h = MidBlock(cfg.block_out_channels[-1], compute_dtype=dt, name="mid")(h)
        h = GroupNorm(32, 1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=dt, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg, dt = self.config, self.compute_dtype
        rev = tuple(reversed(cfg.block_out_channels))  # (512,512,256,128)
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_in")(z)
        h = MidBlock(rev[0], compute_dtype=dt, name="mid")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, use_temb=False, epsilon=1e-6, compute_dtype=dt,
                                name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(ch, compute_dtype=dt, name=f"up_{i}_upsample")(h)
        h = GroupNorm(32, 1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=dt, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) diagonal Gaussian; decode from scaled latents.

    ``encode``/``decode`` are exposed via method= in apply; the pipeline-side
    scaling (x0.18215 on encode, /0.18215 before decode) lives with the
    callers for explicit parity with app.py:109 / pipeline.py:166.
    """

    config: VAEConfig = SD15_VAE_CONFIG
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.compute_dtype)
        self.decoder = Decoder(self.config, self.compute_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.compute_dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.compute_dtype)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B,H,W,3) in [-1,1] -> (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (B,h,w,4) UNSCALED latents -> (B,8h,8w,3) in [-1,1]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * noise
        return self.decode(z)


def sample_latent(mean: jnp.ndarray, logvar: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """latent_dist.sample() * 0.18215 (app.py:109, trainer.py:219)."""
    return (mean + jnp.exp(0.5 * logvar) * noise) * SCALING_FACTOR

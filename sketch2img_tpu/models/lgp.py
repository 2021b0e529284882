"""Latent Edge Predictor (LGP) — the trainable MLP of the sketch-guided path.

Reference: /root/reference/modules/latent_predictor.py:9-45. A per-pixel MLP
(9320 -> 512 -> 256 -> 128 -> 64 -> 4, ReLU + BatchNorm1d between layers,
kaiming-uniform init, zero bias) that predicts the 4-channel edge latent of
the final image from concatenated UNet activations + the noise-level map +
a 9-level sinusoidal positional encoding of the noise level.

TPU-first notes:
  * The reference flattens ``b c h w -> (b w h) c`` (w-major,
    latent_predictor.py:43) purely so BatchNorm1d sees a 2D batch, then
    inverts with the matching rearrange (pipeline.py:156). The map is
    *per-pixel*: flatten order is mathematically irrelevant both to the
    Linear stack and to BatchNorm statistics (reductions over all positions).
    We therefore keep NHWC maps intact and apply the MLP on the channel axis
    — zero transposes, XLA fuses the whole stack into a few MXU matmuls.
  * BatchNorm uses running statistics in inference mode exactly like
    torch (momentum 0.1, eps 1e-5) so the published ``edge_predictor.pt``
    weights reproduce reference outputs bit-for-bit (modulo dtype).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

# torch nn.init.kaiming_uniform_(w) == variance_scaling(2.0, fan_in, uniform)
_kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class _SplitDense(nn.Module):
    """Dense over a channel-concatenation, WITHOUT building the concat.

    ``concat(parts, -1) @ W == sum_i parts_i @ W[rows_i]`` — exact math, but
    the (B, H, W, 9320) fp32 concat the reference materializes every step
    (pipeline.py:151) never hits HBM (~300 MB of traffic saved at 512^2).
    Param tree matches nn.Dense (kernel (total_in, features), bias) so
    ``convert_torch_lgp`` and existing checkpoints are untouched.
    """

    features: int
    total_in: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        kernel = self.param(
            "kernel", _kaiming_uniform, (self.total_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.compute_dtype)
        acc = None
        offset = 0
        for p in parts:
            c = p.shape[-1]
            y = p.astype(self.compute_dtype) @ kernel[offset : offset + c]
            acc = y if acc is None else acc + y
            offset += c
        assert offset == self.total_in, (offset, self.total_in)
        return acc + bias.astype(self.compute_dtype)


class LatentEdgePredictor(nn.Module):
    """Per-pixel edge-latent MLP with BatchNorm (train/eval running stats)."""

    input_dim: int = 9320
    output_dim: int = 4
    num_layers: int = 9  # number of sinusoidal pos-enc octaves, NOT MLP depth
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        """x: (..., 9280) concatenated UNet activations (NHWC maps or flat),
        t: (..., 4) noise-level map. Returns (..., output_dim).

        Mirrors latent_predictor.py:37-45: pos-enc = [sin(2π t 2^-l)]_l,
        concat (x, t, pos) on channels, cast to compute dtype, MLP.
        """
        pos = [jnp.sin(2.0 * math.pi * t * (2.0 ** -l)) for l in range(self.num_layers)]

        widths = (512, 256, 128, 64)
        # first layer: split-matmul over the concat pieces (no 9320-ch concat)
        h = _SplitDense(
            widths[0], self.input_dim, compute_dtype=self.compute_dtype,
            name="dense_0",
        )([x, t] + pos)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
            name="bn_0",
        )(h)
        for i, w in enumerate(widths[1:], start=1):
            h = nn.Dense(
                w,
                kernel_init=_kaiming_uniform,
                bias_init=nn.initializers.zeros,
                dtype=self.compute_dtype,
                name=f"dense_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum=0.1 -> flax momentum=0.9
                epsilon=1e-5,
                dtype=self.compute_dtype,
                name=f"bn_{i}",
            )(h)
        h = nn.Dense(
            self.output_dim,
            kernel_init=_kaiming_uniform,
            bias_init=nn.initializers.zeros,
            dtype=self.compute_dtype,
            name=f"dense_{len(widths)}",
        )(h)
        return h


def lgp_fused_apply(
    variables: dict,
    taps: dict,
    noise_level: jnp.ndarray,
    height: int,
    width: int,
    *,
    num_layers: int = 9,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Inference-mode LGP with the first Dense fused into the taps at their
    NATIVE resolutions — exact math, far less HBM traffic.

    Bilinear resize is linear over space and the first Dense mixes only
    channels, so  Dense1(resize(concat(taps)))  ==  sum_i resize(tap_i @ W_i)
    with W_i the kernel row-slice for tap i. The reference materializes a
    (B, 64, 64, 9280) fp32 feature map every guided step
    (pipeline.py:145-151, ~152 MB at 512^2); this computes the 512-wide
    projection at 8/16/32 px for six of the nine taps and never builds the
    concat. BatchNorm uses running stats (eval mode). Parity with the naive
    path is tested to fp32 tolerance.
    """
    from sketch2img_tpu.models.unet import TAP_NAMES
    from sketch2img_tpu.ops.resize import resize_bilinear

    params = variables["params"]
    stats = variables["batch_stats"]
    w1 = jnp.asarray(params["dense_0"]["kernel"], compute_dtype)  # (9320, 512)
    b1 = jnp.asarray(params["dense_0"]["bias"], compute_dtype)

    # channel row offsets in the concat order: taps, noise, pos-enc
    acc = None
    offset = 0
    for name in TAP_NAMES:
        t = taps[name].astype(compute_dtype)
        c = t.shape[-1]
        proj = t @ w1[offset : offset + c]  # (B, h_i, w_i, 512)
        offset += c
        if proj.shape[1] != height or proj.shape[2] != width:
            proj = resize_bilinear(proj, height, width)
        acc = proj if acc is None else acc + proj

    nl = noise_level.astype(compute_dtype)
    acc = acc + nl @ w1[offset : offset + nl.shape[-1]]
    offset += nl.shape[-1]
    pos = jnp.concatenate(
        [jnp.sin(2.0 * math.pi * nl * (2.0 ** -l)) for l in range(num_layers)],
        axis=-1,
    )
    h = acc + pos @ w1[offset : offset + pos.shape[-1]] + b1

    def bn(x, name):
        p, s = params[name], stats[name]
        x32 = x.astype(jnp.float32)
        y = (x32 - s["mean"]) / jnp.sqrt(s["var"] + 1e-5)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)

    for i in range(1, 5):
        h = bn(nn.relu(h), f"bn_{i - 1}")
        wk = jnp.asarray(params[f"dense_{i}"]["kernel"], compute_dtype)
        bk = jnp.asarray(params[f"dense_{i}"]["bias"], compute_dtype)
        h = h @ wk + bk
    return h


def convert_torch_lgp(state_dict) -> Tuple[dict, dict]:
    """torch ``edge_predictor.pt`` state dict -> (params, batch_stats).

    Layout parity: torch Sequential indices (latent_predictor.py:15-28) are
    Linear at 0,3,6,9,12 and BatchNorm1d at 2,5,8,11.
    """
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = {}
    stats = {}
    linear_idx = [0, 3, 6, 9, 12]
    bn_idx = [2, 5, 8, 11]
    for i, li in enumerate(linear_idx):
        params[f"dense_{i}"] = {
            "kernel": arr(f"layers.{li}.weight").T,  # (out,in) -> (in,out)
            "bias": arr(f"layers.{li}.bias"),
        }
    for i, bi in enumerate(bn_idx):
        params[f"bn_{i}"] = {
            "scale": arr(f"layers.{bi}.weight"),
            "bias": arr(f"layers.{bi}.bias"),
        }
        stats[f"bn_{i}"] = {
            "mean": arr(f"layers.{bi}.running_mean"),
            "var": arr(f"layers.{bi}.running_var"),
        }
    return params, stats

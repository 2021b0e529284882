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
        h = jnp.concatenate([x, t] + pos, axis=-1)
        h = h.astype(self.compute_dtype)

        widths = (512, 256, 128, 64)
        for i, w in enumerate(widths):
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

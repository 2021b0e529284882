"""Bilinear resize with torch ``F.interpolate(align_corners=False)`` parity.

The sketch-guided path resizes the nine UNet activation taps to the latent
resolution before the LGP (reference: modules/pipeline.py:147,
trainer.py:239, evaluation.py:99). Those are all upsamples (taps are at 8/16/
32/64 px, target 64 at 512^2), where half-pixel linear interpolation without
antialiasing matches torch exactly. ``antialias=False`` also keeps parity on
any downsampling call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """x: (B, H, W, C) NHWC -> (B, height, width, C)."""
    b, _, _, c = x.shape
    return jax.image.resize(
        x, (b, height, width, c), method="linear", antialias=False
    )

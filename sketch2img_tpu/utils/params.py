"""Parameter dtype utilities.

The reference's demos load fp16 weights onto the GPU once
(`app.py:43` `.half()` context); the analogous TPU move is casting the
float params to the compute dtype ONCE, outside jit. Without it, every
`kernel.astype(bf16)` inside the modules re-converts fp32 weights per
forward — a profiler trace of the bs1 512px UNet showed ~1.8 ms/forward of
standalone `convert_element_type` HBM traffic from exactly this.

Training keeps fp32 master params (the trainers never call this); it is an
inference-serving transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves of a param pytree to ``dtype``; integer
    and non-array leaves pass through untouched."""

    def leaf(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(leaf, tree)

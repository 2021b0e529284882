"""Injection-state construction for the sketch (residual-KV) variant.

Re-states SatMixin.set_res_samples (/root/reference/modules/
sketch_guided_attn.py:29-44): the SketchEncoder's per-down-block residual
tuples are distributed to the UNet's TransformerBlocks in named_modules
order (down, mid, up).

Reference mapping (literal):
    down = (r0, r1) per 3-entry block;  up += (r0, r1, r1) per block
    total = down + reversed(up) + (last residual of last block,)
    blocks[i] <- total[i]
As written this mis-aligns two sites for SD1.5 — the mid block's
TransformerBlock receives an up-list feature and the final 320-dim block
receives the 1280-dim mid feature, which would crash the reference at
runtime (the sketch variant has no trainer/demo wiring in the repo; it is
WIP there). ``build_sketch_injection_states`` therefore aligns features to
blocks BY CHANNEL DIMENSION at each traversal position — the unique
type-correct completion of the reference's evident intent (each block
attends over encoder features of its own width).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from sketch2img_tpu.models.unet import UNetConfig, transformer_block_dims


def _tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W, C)  ("b c h w -> b (h w) c" in the reference,
    sketch_guided_attn.py:82)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def build_sketch_injection_states(
    config: UNetConfig,
    res_samples: Sequence[Tuple[jnp.ndarray, ...]],
) -> List[jnp.ndarray]:
    """res_samples: output of UNet2DCondition.down_residuals on the sketch
    (one tuple per down block; cross-attn blocks have (r0, r1, downsample)).

    Returns one (B, N_i, C_i) tensor per TransformerBlock in
    injection_states order, channel-aligned per the module docstring.
    """
    L = config.layers_per_block
    down: List[jnp.ndarray] = []
    up: List[jnp.ndarray] = []
    for block in res_samples:
        # reference filters on len==3 == layers_per_block(2)+downsample
        # (sketch_guided_attn.py:34-36); generalized to L resnet outputs +
        # a downsampler entry, duplicating the last residual for the up
        # side's extra resnet exactly as (r0, r1, r1) does for L=2
        if len(block) == L + 1:
            down += list(block[:L])
            up += list(block[:L]) + [block[L - 1]]
    mid = res_samples[-1][-1]  # sketch_guided_attn.py:32

    ordered = down + up[::-1] + [mid]
    dims = transformer_block_dims(config)
    states: List[jnp.ndarray] = []
    pool = list(ordered)
    for want in dims:
        # first unused feature whose channel width matches this block
        for j, cand in enumerate(pool):
            if cand.shape[-1] == want:
                states.append(_tokens(cand))
                del pool[j]
                break
        else:
            # reuse allowed (the reference itself reuses r1 twice per block)
            match = next(p for p in ordered if p.shape[-1] == want)
            states.append(_tokens(match))
    return states

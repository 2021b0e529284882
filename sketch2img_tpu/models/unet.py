"""UNet2DConditionModel — TPU-native Flax re-design with functional
activation taps and static attention-injection variants.

This owns what the reference borrows from diffusers (SURVEY.md §2.2 D1) and
replaces all three of the reference's graft mechanisms:

  * forward hooks (latent_predictor.py:47-80)  ->  ``capture_taps=True``
    returns the nine tapped activations as outputs (TAP_NAMES order is the
    reference's feature_blocks order: down 0-2, mid attn, mid resnets 0-1,
    up 0-2 — the exact channel-concat order the LGP expects, 9280 channels).
  * forward monkey-patching (sketch_guided_attn.py:75-79,
    clip_guided_attn.py:66-70)  ->  compile-time ``injection`` config flag;
    the base graph carries zero dead injection ops.
  * mutable set_state/set_scale/set_res_samples  ->  explicit
    ``injection_states`` / ``injection_scale`` arguments threaded through
    apply.

Layout: NHWC, bf16 matmuls via ``compute_dtype``, fp32 norms/softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from sketch2img_tpu.models.layers import (
    Conv1x1,
    CrossAttention,
    GEGLUFeedForward,
    GroupNorm,
    LayerNorm,
    ResnetBlock,
    Downsample,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which down blocks carry cross-attention transformers (up side mirrors)
    cross_attn: Tuple[bool, ...] = (True, True, True, False)
    num_heads: int = 8
    cross_attention_dim: int = 768
    freq_shift: float = 0.0
    # "none" | "sketch" (residual-KV, sketch_guided_attn.py)
    #        | "clip"   (CLIP-token concat self-attn, clip_guided_attn.py)
    injection: str = "none"
    injection_context_dim: int = 1024  # CLIP ViT-L/14 hidden (clip variant)
    # rematerialize resnet/transformer activations in the backward pass —
    # trades FLOPs for HBM (SURVEY.md §7 hard-part 1: vjp through the UNet
    # inside the sampling loop / large-batch training)
    remat: bool = False


SD15_CONFIG = UNetConfig()

# Reference feature_blocks order (latent_predictor.py:64-79): channel-concat
# order for the LGP input. mid_res_0 runs *before* mid_attn in the forward
# pass but is concatenated after it — list order, not execution order.
TAP_NAMES = (
    "down_0", "down_1", "down_2",
    "mid_attn", "mid_res_0", "mid_res_1",
    "up_0", "up_1", "up_2",
)


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: LN->self-attn->[injection]->LN->cross-attn->LN->FF.

    Injection sits between self- and cross-attention, exactly where the
    reference's patched forward adds it (sketch_guided_attn.py:120-132,
    clip_guided_attn.py:111-125).
    """

    dim: int
    heads: int
    context_dim: int
    injection: str = "none"
    injection_context_dim: int = 1024
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        inj_state: Optional[jnp.ndarray] = None,
        inj_scale: Any = 1.0,
    ) -> jnp.ndarray:
        dim, heads, dt = self.dim, self.heads, self.compute_dtype
        dim_head = dim // heads

        h = LayerNorm(name="norm1")(x)
        x = x + CrossAttention(dim, heads, dim_head, compute_dtype=dt, name="attn1")(h)

        if self.injection == "sketch" and inj_state is not None:
            # KV from sketch-UNet residual tokens (sketch_guided_attn.py:126-132)
            h = LayerNorm(name="sketch_norm")(x)
            s = CrossAttention(dim, heads, dim_head, compute_dtype=dt, name="sketch_attn")(
                h, context=inj_state.astype(x.dtype)
            )
            s = nn.Dense(dim, dtype=dt, name="sketch_conv")(s)  # Conv1d(C,C,1) == channel Dense
            # inj_scale: python scalar (reference UI slider) or a broadcast-
            # able array — (2B,1,1) carries per-image strengths so serving
            # can merge requests with different sliders into one program
            x = x + jnp.asarray(inj_scale, s.dtype) * s
        elif self.injection == "clip" and inj_state is not None:
            # self-attn over [hidden; projected CLIP tokens], keep first N
            # (clip_guided_attn.py:113-125). The reference attends with all
            # N+257 queries then slices; attention rows are independent, so
            # querying only the N kept rows (kv still over the full concat)
            # is the same math minus the discarded rows' work. LayerNorm is
            # per-row, so normalizing the two parts separately (same module,
            # shared params) equals slicing the normalized concat — this
            # avoids materializing + re-slicing the concat for the queries,
            # and the CLIP part is zero-padded to a 128 multiple so the
            # flash kernel skips its HBM pad copies (kv_len masks the tail;
            # device trace: the pads + query-slice copies cost ~10 ms/step
            # at batch-8 CFG-doubled serving).
            proj = nn.Dense(dim, dtype=dt, name="sketch_proj")(inj_state.astype(x.dtype))
            ln = LayerNorm(name="sketch_norm")
            hx = ln(x)
            hp = ln(proj)
            true_len = x.shape[1] + proj.shape[1]
            pad = -proj.shape[1] % 128
            if pad:
                hp = jnp.pad(hp, ((0, 0), (0, pad), (0, 0)))
            cat = jnp.concatenate([hx, hp], axis=1)
            s = CrossAttention(dim, heads, dim_head, compute_dtype=dt, name="sketch_attn")(
                hx, context=cat, kv_len=true_len
            )
            s = nn.Dense(dim, dtype=dt, name="sketch_conv")(s)
            x = x + jnp.asarray(inj_scale, s.dtype) * s  # scalar or (2B,1,1)

        h = LayerNorm(name="norm2")(x)
        x = x + CrossAttention(
            dim, heads, dim_head, context_dim=self.context_dim, compute_dtype=dt, name="attn2"
        )(h, context=context.astype(x.dtype))
        h = LayerNorm(name="norm3")(x)
        x = x + GEGLUFeedForward(dim, compute_dtype=dt, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN(eps 1e-6) -> 1x1 conv in -> blocks -> 1x1 out -> +res."""

    dim: int
    heads: int
    context_dim: int
    depth: int = 1
    injection: str = "none"
    injection_context_dim: int = 1024
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        inj_states: Sequence[Optional[jnp.ndarray]] = (None,),
        inj_scale: Any = 1.0,
    ) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(32, 1e-6, name="norm")(x)
        h = Conv1x1(self.dim, compute_dtype=self.compute_dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, self.dim)
        for d in range(self.depth):
            h = TransformerBlock(
                self.dim,
                self.heads,
                self.context_dim,
                injection=self.injection,
                injection_context_dim=self.injection_context_dim,
                compute_dtype=self.compute_dtype,
                name=f"block_{d}",
            )(h, context, inj_states[d] if d < len(inj_states) else None, inj_scale)
        h = h.reshape(b, hh, ww, self.dim)
        h = Conv1x1(c, compute_dtype=self.compute_dtype, name="proj_out")(h)
        return h + residual


class UNet2DCondition(nn.Module):
    """SD1.x conditional UNet with taps, down-only encoding, and injection.

    apply methods:
      * ``__call__(sample, timesteps, context, ...)`` -> eps or (eps, taps)
      * ``down_residuals(sample, timesteps, context)`` -> list of per-block
        residual tuples (the SketchEncoder of sketch_encoder.py:13-98 —
        same params as the down half of a full UNet).
    """

    config: UNetConfig = SD15_CONFIG
    compute_dtype: jnp.dtype = jnp.float32

    def _time_embed(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        cfg, dt = self.config, self.compute_dtype
        temb_ch = cfg.block_out_channels[0] * 4
        t = timestep_embedding(
            timesteps, cfg.block_out_channels[0], downscale_freq_shift=cfg.freq_shift
        ).astype(dt)
        t = nn.Dense(temb_ch, dtype=dt, name="time_linear_1")(t)
        t = nn.silu(t)
        return nn.Dense(temb_ch, dtype=dt, name="time_linear_2")(t)

    def _n_tblocks_down(self) -> List[int]:
        cfg = self.config
        return [cfg.layers_per_block if ca else 0 for ca in cfg.cross_attn]

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        *,
        capture_taps: bool = False,
        injection_states: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        injection_scale: Any = 1.0,
    ):
        cfg, dt = self.config, self.compute_dtype
        sample = sample.astype(dt)
        temb = self._time_embed(timesteps)
        taps: Dict[str, jnp.ndarray] = {}
        n_blocks = len(cfg.block_out_channels)
        inj = cfg.injection
        inj_idx = 0  # global TransformerBlock counter, torch named_modules order
        Resnet = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        Transformer = nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer

        def take_inj(count: int):
            nonlocal inj_idx
            if injection_states is None or inj == "none":
                out = [None] * count
            else:
                out = list(injection_states[inj_idx : inj_idx + count])
            inj_idx += count
            return out

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, name="conv_in",
        )(sample)
        res_stack: List[jnp.ndarray] = [h]

        # --- down ---
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = Resnet(ch, compute_dtype=dt, name=f"down_{i}_resnet_{j}")(h, temb)
                if cfg.cross_attn[i]:
                    h = Transformer(
                        ch, cfg.num_heads, cfg.cross_attention_dim,
                        injection=inj, injection_context_dim=cfg.injection_context_dim,
                        compute_dtype=dt, name=f"down_{i}_attn_{j}",
                    )(h, context, take_inj(1), injection_scale)
                res_stack.append(h)
            if i < n_blocks - 1:
                h = Downsample(ch, compute_dtype=dt, name=f"down_{i}_downsample")(h)
                res_stack.append(h)
            if capture_taps and i < 3:
                taps[f"down_{i}"] = h.astype(jnp.float32)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        h = Resnet(mid_ch, compute_dtype=dt, name="mid_resnet_0")(h, temb)
        if capture_taps:
            taps["mid_res_0"] = h.astype(jnp.float32)
        h = Transformer(
            mid_ch, cfg.num_heads, cfg.cross_attention_dim,
            injection=inj, injection_context_dim=cfg.injection_context_dim,
            compute_dtype=dt, name="mid_attn",
        )(h, context, take_inj(1), injection_scale)
        if capture_taps:
            taps["mid_attn"] = h.astype(jnp.float32)
        h = Resnet(mid_ch, compute_dtype=dt, name="mid_resnet_1")(h, temb)
        if capture_taps:
            taps["mid_res_1"] = h.astype(jnp.float32)

        # --- up ---
        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_ca = tuple(reversed(cfg.cross_attn))
        for i, ch in enumerate(rev_ch):
            for j in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = Resnet(ch, compute_dtype=dt, name=f"up_{i}_resnet_{j}")(h, temb)
                if rev_ca[i]:
                    h = Transformer(
                        ch, cfg.num_heads, cfg.cross_attention_dim,
                        injection=inj, injection_context_dim=cfg.injection_context_dim,
                        compute_dtype=dt, name=f"up_{i}_attn_{j}",
                    )(h, context, take_inj(1), injection_scale)
            if i < n_blocks - 1:
                h = Upsample(ch, compute_dtype=dt, name=f"up_{i}_upsample")(h)
            if capture_taps and i < 3:
                taps[f"up_{i}"] = h.astype(jnp.float32)

        h = GroupNorm(32, 1e-5, name="norm_out")(h)
        h = nn.silu(h)
        eps = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, name="conv_out",
        )(h)
        eps = eps.astype(jnp.float32)
        if capture_taps:
            return eps, taps
        return eps

    @nn.compact
    def down_residuals(
        self, sample: jnp.ndarray, timesteps: jnp.ndarray, context: jnp.ndarray
    ) -> List[Tuple[jnp.ndarray, ...]]:
        """Down-half-only forward returning per-block residual tuples —
        functional SketchEncoder (sketch_encoder.py:89-98). Parameter names
        match the down half of ``__call__`` so a UNet checkpoint loads."""
        cfg, dt = self.config, self.compute_dtype
        sample = sample.astype(dt)
        temb = self._time_embed(timesteps)
        n_blocks = len(cfg.block_out_channels)

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, name="conv_in",
        )(sample)
        out: List[Tuple[jnp.ndarray, ...]] = []
        for i, ch in enumerate(cfg.block_out_channels):
            res: Tuple[jnp.ndarray, ...] = ()
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, compute_dtype=dt, name=f"down_{i}_resnet_{j}")(h, temb)
                if cfg.cross_attn[i]:
                    h = SpatialTransformer(
                        ch, cfg.num_heads, cfg.cross_attention_dim,
                        compute_dtype=dt, name=f"down_{i}_attn_{j}",
                    )(h, context)
                res += (h,)
            if i < n_blocks - 1:
                h = Downsample(ch, compute_dtype=dt, name=f"down_{i}_downsample")(h)
                res += (h,)
            out.append(res)
        return out


def concat_taps(taps: Dict[str, jnp.ndarray], height: int, width: int) -> jnp.ndarray:
    """Bilinear-resize the nine taps to (height, width) and concat channels in
    the reference's feature_blocks order — pipeline.py:145-151 (9280 ch for SD1.5)."""
    from sketch2img_tpu.ops.resize import resize_bilinear

    pieces = []
    for name in TAP_NAMES:
        t = taps[name]
        if t.shape[1] != height or t.shape[2] != width:
            t = resize_bilinear(t, height, width)
        pieces.append(t)
    return jnp.concatenate(pieces, axis=-1)


def num_transformer_blocks(config: UNetConfig) -> int:
    """Count of TransformerBlocks in torch named_modules order (down, mid, up)."""
    down = sum(config.layers_per_block for ca in config.cross_attn if ca)
    up = sum(config.layers_per_block + 1 for ca in config.cross_attn if ca)
    return down + 1 + up


def transformer_block_dims(config: UNetConfig) -> List[int]:
    """Per-TransformerBlock channel dims in injection_states order
    (down blocks, mid, up blocks) — matches torch named_modules traversal of
    the reference's SatMixin (sketch_guided_attn.py:15-21)."""
    dims: List[int] = []
    for ch, ca in zip(config.block_out_channels, config.cross_attn):
        if ca:
            dims += [ch] * config.layers_per_block
    dims.append(config.block_out_channels[-1])
    for ch, ca in zip(reversed(config.block_out_channels), reversed(config.cross_attn)):
        if ca:
            dims += [ch] * (config.layers_per_block + 1)
    return dims

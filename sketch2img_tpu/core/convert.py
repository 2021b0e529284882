"""torch -> Flax checkpoint converters (diffusers/transformers key layouts).

Parity requirement (SURVEY.md §5 checkpoint row): the framework must load the
reference's published torch checkpoints — SD1.x UNet/VAE/CLIP weights,
``edge_predictor.pt`` (README.md:20, app.py:68), ``netG.pth``
(trainer.py:114) — into the Flax NHWC module trees defined in
``sketch2img_tpu.models``.

Tensor layout rules:
  conv:            torch (O,I,kh,kw)   -> flax (kh,kw,I,O)
  conv_transpose:  torch (I,O,kh,kw)   -> flax transpose_kernel (kh,kw,O,I)
  linear:          torch (O,I)         -> flax (I,O)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sketch2img_tpu.models.unet import UNetConfig, SD15_CONFIG
from sketch2img_tpu.models.vae import VAEConfig, SD15_VAE_CONFIG

# re-exports: model-specific converters live beside their models
from sketch2img_tpu.models.lgp import convert_torch_lgp  # noqa: F401
from sketch2img_tpu.models.anime2sketch import convert_torch_anime2sketch  # noqa: F401
from sketch2img_tpu.models.clip_text import convert_torch_clip_text  # noqa: F401
from sketch2img_tpu.models.clip_vision import convert_torch_clip_vision  # noqa: F401


def _arr(state_dict, k):
    v = state_dict[k]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _conv(state_dict, prefix) -> Dict[str, np.ndarray]:
    return {
        "kernel": _arr(state_dict, prefix + ".weight").transpose(2, 3, 1, 0),
        "bias": _arr(state_dict, prefix + ".bias"),
    }


def _dense(state_dict, prefix) -> Dict[str, np.ndarray]:
    return {
        "kernel": _arr(state_dict, prefix + ".weight").T,
        "bias": _arr(state_dict, prefix + ".bias"),
    }


def _dense_nobias(state_dict, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _arr(state_dict, prefix + ".weight").T}


def _groupnorm(state_dict, prefix) -> Dict[str, dict]:
    return {
        "GroupNorm_0": {
            "scale": _arr(state_dict, prefix + ".weight"),
            "bias": _arr(state_dict, prefix + ".bias"),
        }
    }


def _layernorm(state_dict, prefix) -> Dict[str, dict]:
    return {
        "LayerNorm_0": {
            "scale": _arr(state_dict, prefix + ".weight"),
            "bias": _arr(state_dict, prefix + ".bias"),
        }
    }


def _resnet(sd, p, has_shortcut: bool) -> dict:
    out = {
        "norm1": _groupnorm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _groupnorm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, p + ".time_emb_proj")
    if has_shortcut:
        # diffusers names it conv_shortcut (UNet) / nin_shortcut in old ldm
        key = (
            p + ".conv_shortcut"
            if p + ".conv_shortcut.weight" in sd
            else p + ".nin_shortcut"
        )
        out["conv_shortcut"] = _conv(sd, key)
    return out


def _transformer_block(sd, p) -> dict:
    out = {
        "norm1": _layernorm(sd, p + ".norm1"),
        "norm2": _layernorm(sd, p + ".norm2"),
        "norm3": _layernorm(sd, p + ".norm3"),
        "attn1": {
            "to_q": _dense_nobias(sd, p + ".attn1.to_q"),
            "to_k": _dense_nobias(sd, p + ".attn1.to_k"),
            "to_v": _dense_nobias(sd, p + ".attn1.to_v"),
            "to_out": _dense(sd, p + ".attn1.to_out.0"),
        },
        "attn2": {
            "to_q": _dense_nobias(sd, p + ".attn2.to_q"),
            "to_k": _dense_nobias(sd, p + ".attn2.to_k"),
            "to_v": _dense_nobias(sd, p + ".attn2.to_v"),
            "to_out": _dense(sd, p + ".attn2.to_out.0"),
        },
        "ff": {
            "proj_in": _dense(sd, p + ".ff.net.0.proj"),
            "proj_out": _dense(sd, p + ".ff.net.2"),
        },
    }
    return out


def _spatial_transformer(sd, p, depth: int = 1) -> dict:
    out = {
        "norm": _groupnorm(sd, p + ".norm"),
        "proj_in": _conv(sd, p + ".proj_in"),
        "proj_out": _conv(sd, p + ".proj_out"),
    }
    for d in range(depth):
        out[f"block_{d}"] = _transformer_block(sd, p + f".transformer_blocks.{d}")
    return out


def convert_torch_unet(sd, config: UNetConfig = SD15_CONFIG) -> dict:
    """diffusers UNet2DConditionModel state dict -> UNet2DCondition params."""
    params: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_linear_1": _dense(sd, "time_embedding.linear_1"),
        "time_linear_2": _dense(sd, "time_embedding.linear_2"),
        "norm_out": _groupnorm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    n = len(config.block_out_channels)
    # down
    in_ch = config.block_out_channels[0]
    for i, ch in enumerate(config.block_out_channels):
        for j in range(config.layers_per_block):
            p = f"down_blocks.{i}.resnets.{j}"
            params[f"down_{i}_resnet_{j}"] = _resnet(sd, p, has_shortcut=(in_ch != ch))
            in_ch = ch
            if config.cross_attn[i]:
                params[f"down_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    # mid
    params["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0", has_shortcut=False)
    params["mid_attn"] = _spatial_transformer(sd, "mid_block.attentions.0")
    params["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1", has_shortcut=False)
    # up (skip-concat always changes channels -> shortcut always present)
    rev_ca = tuple(reversed(config.cross_attn))
    for i in range(n):
        for j in range(config.layers_per_block + 1):
            params[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}", has_shortcut=True
            )
            if rev_ca[i]:
                params[f"up_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            params[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return params


def _vae_attention(sd, p) -> dict:
    # old diffusers AttentionBlock: group_norm/query/key/value/proj_attn;
    # newer Attention: group_norm/to_q/to_k/to_v/to_out.0
    if p + ".query.weight" in sd:
        q, k, v, o = "query", "key", "value", "proj_attn"
    else:
        q, k, v, o = "to_q", "to_k", "to_v", "to_out.0"
    return {
        "group_norm": _groupnorm(sd, p + ".group_norm"),
        "query": _dense(sd, f"{p}.{q}"),
        "key": _dense(sd, f"{p}.{k}"),
        "value": _dense(sd, f"{p}.{v}"),
        "proj_attn": _dense(sd, f"{p}.{o}"),
    }


def convert_torch_vae(sd, config: VAEConfig = SD15_VAE_CONFIG) -> dict:
    """diffusers AutoencoderKL state dict -> AutoencoderKL params."""
    n = len(config.block_out_channels)
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "norm_out": _groupnorm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0", False),
            "attn": _vae_attention(sd, "encoder.mid_block.attentions.0"),
            "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1", False),
        },
    }
    in_ch = config.block_out_channels[0]
    for i, ch in enumerate(config.block_out_channels):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", has_shortcut=(in_ch != ch)
            )
            in_ch = ch
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }

    rev = tuple(reversed(config.block_out_channels))
    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "norm_out": _groupnorm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0", False),
            "attn": _vae_attention(sd, "decoder.mid_block.attentions.0"),
            "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1", False),
        },
    }
    in_ch = rev[0]
    for i, ch in enumerate(rev):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", has_shortcut=(in_ch != ch)
            )
            in_ch = ch
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }

"""Flax -> torch state-dict exporters (and the SAT torch -> Flax loader).

The reference's trainers publish torch artifacts that its inference apps —
and anyone in its ecosystem — consume directly:

  * the LGP state dict (``torch.save(edge_predictor.state_dict())``,
    /root/reference/trainer.py:279; loaded by app.py:67-68 as
    ``edge_predictor.pt``),
  * the CLIP-variant pair ``sketch_encoder_model.pt`` (a transformers
    ``CLIPVisionModel`` state dict) and ``sketch_attn_model.pt`` (the
    ``SatMixin`` module tree), /root/reference/modules/
    clip_guided_trainer.py:263-264, loaded by clip_guided_inf.py:47-51.

Ingestion of those families is manifest-pinned (core/manifest.py). This
module closes the OTHER direction: weights trained HERE export to the
reference's exact key layouts, so a reference user can train on TPU and
keep serving with their existing torch stack — and reference-trained
``sketch_attn_model.pt`` files load here (``convert_torch_sat``), which no
ingestion path covered before (the injection variants only read our npz).

Every exporter is the measured inverse of its converter: tests round-trip
random Flax trees through export -> convert and require bitwise equality,
and pin exported key inventories against the committed manifests
(tests/test_export.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

from sketch2img_tpu.models.unet import UNetConfig


def _np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


# ---------------------------------------------------------------------------
# LGP (edge_predictor.pt layout: latent_predictor.py:15-28)
# ---------------------------------------------------------------------------

_LGP_LINEAR_IDX = (0, 3, 6, 9, 12)
_LGP_BN_IDX = (2, 5, 8, 11)


def lgp_to_torch_state(variables: dict) -> Dict[str, np.ndarray]:
    """LGP Flax variables ({"params", "batch_stats"}) -> the torch
    ``nn.Sequential`` state dict of the reference's edge predictor.

    Exact inverse of ``models.lgp.convert_torch_lgp``: Linear weights
    transpose back to (out, in), BatchNorm running stats come from
    ``batch_stats``, and the bookkeeping ``num_batches_tracked`` buffers
    torch always serializes are emitted as int64 zeros (they do not affect
    eval-mode math and the loaders on both sides ignore them)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    for i, li in enumerate(_LGP_LINEAR_IDX):
        out[f"layers.{li}.weight"] = _np(params[f"dense_{i}"]["kernel"]).T
        out[f"layers.{li}.bias"] = _np(params[f"dense_{i}"]["bias"])
    for i, bi in enumerate(_LGP_BN_IDX):
        out[f"layers.{bi}.weight"] = _np(params[f"bn_{i}"]["scale"])
        out[f"layers.{bi}.bias"] = _np(params[f"bn_{i}"]["bias"])
        out[f"layers.{bi}.running_mean"] = _np(stats[f"bn_{i}"]["mean"])
        out[f"layers.{bi}.running_var"] = _np(stats[f"bn_{i}"]["var"])
        out[f"layers.{bi}.num_batches_tracked"] = np.zeros((), np.int64)
    return out


# ---------------------------------------------------------------------------
# CLIP vision tower (sketch_encoder_model.pt: a CLIPVisionModel state dict)
# ---------------------------------------------------------------------------


def clip_vision_to_torch_state(params: dict, num_layers: int = 24
                               ) -> Dict[str, np.ndarray]:
    """CLIPVisionEncoder Flax params -> transformers ``CLIPVisionModel``
    state dict (``vision_model.``-prefixed), the format the reference's
    clip trainer saves (clip_guided_trainer.py:263).

    Inverse of ``models.clip_vision.convert_torch_clip_vision`` for every
    key the Flax model owns. ``post_layernorm`` exists in the torch class
    but only feeds the pooled output, which neither the reference's
    consumer (clip_guided_inf.py uses ``last_hidden_state``) nor ours
    touches — it receives no gradient in the reference trainer either. It
    is emitted as the identity (scale 1, bias 0) so the artifact satisfies
    ``load_state_dict(strict=True)``."""
    p = "vision_model."
    out: Dict[str, np.ndarray] = {
        p + "embeddings.patch_embedding.weight":
            _np(params["patch_embedding"]["kernel"]).transpose(3, 2, 0, 1),
        p + "embeddings.class_embedding": _np(params["class_embedding"]),
        p + "embeddings.position_embedding.weight":
            _np(params["position_embedding"]),
        p + "pre_layrnorm.weight":
            _np(params["pre_layrnorm"]["LayerNorm_0"]["scale"]),
        p + "pre_layrnorm.bias":
            _np(params["pre_layrnorm"]["LayerNorm_0"]["bias"]),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}."
        layer = params[f"layer_{i}"]
        for ours, theirs in (("layer_norm1", "layer_norm1"),
                             ("layer_norm2", "layer_norm2")):
            out[lp + theirs + ".weight"] = _np(
                layer[ours]["LayerNorm_0"]["scale"])
            out[lp + theirs + ".bias"] = _np(layer[ours]["LayerNorm_0"]["bias"])
        for ours, theirs in (("fc1", "mlp.fc1"), ("fc2", "mlp.fc2"),
                             ("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("out_proj", "self_attn.out_proj")):
            out[lp + theirs + ".weight"] = _np(layer[ours]["kernel"]).T
            out[lp + theirs + ".bias"] = _np(layer[ours]["bias"])
    hidden = out[p + "pre_layrnorm.weight"].shape[0]
    dt = out[p + "pre_layrnorm.weight"].dtype
    out[p + "post_layernorm.weight"] = np.ones((hidden,), dt)
    out[p + "post_layernorm.bias"] = np.zeros((hidden,), dt)
    return out


# ---------------------------------------------------------------------------
# SAT injection blocks (sketch_attn_model.pt: SatMixin state dict)
# ---------------------------------------------------------------------------


def sat_block_names(config: UNetConfig) -> Iterator[Tuple[str, str, str, int]]:
    """Yield (our outer module, our inner block, torch SAT module name, dim)
    per TransformerBlock, in the torch ``named_modules`` traversal order
    (down, mid, up) the reference's SatMixin enumerates
    (clip_guided_attn.py:15-27: ``"sketch_attn." + unet_path`` with dots
    replaced by underscores)."""
    def name(path: str) -> str:
        return ("sketch_attn." + path).replace(".", "_")

    L = config.layers_per_block
    for i, (ch, ca) in enumerate(
            zip(config.block_out_channels, config.cross_attn)):
        if ca:
            for j in range(L):
                yield (f"down_{i}_attn_{j}", "block_0",
                       name(f"down_blocks.{i}.attentions.{j}"
                            ".transformer_blocks.0"), ch)
    mid_ch = config.block_out_channels[-1]
    yield ("mid_attn", "block_0",
           name("mid_block.attentions.0.transformer_blocks.0"), mid_ch)
    rev_ch = tuple(reversed(config.block_out_channels))
    rev_ca = tuple(reversed(config.cross_attn))
    for i, (ch, ca) in enumerate(zip(rev_ch, rev_ca)):
        if ca:
            for j in range(L + 1):
                yield (f"up_{i}_attn_{j}", "block_0",
                       name(f"up_blocks.{i}.attentions.{j}"
                            ".transformer_blocks.0"), ch)


def sat_to_torch_state(inj_params: dict, config: UNetConfig
                       ) -> Dict[str, np.ndarray]:
    """Injection param tree (``split_injection_params``'s second output, or
    the matching subtree of full UNet params) -> the reference's
    ``sketch_attn_model.pt`` layout.

    Per block: ``sketch_proj`` Linear (clip variant only — the sketch
    variant's modules have none, sketch_guided_attn.py:61-64 vs
    clip_guided_attn.py:52-62), ``sketch_norm`` LayerNorm, ``sketch_attn``
    a diffusers CrossAttention (bias-free to_q/k/v + ``to_out.0``), and
    ``sketch_conv`` a 1x1 Conv1d (== our channel Dense: torch (O, I, 1)
    <-> Flax kernel (I, O))."""
    out: Dict[str, np.ndarray] = {}
    for outer, inner, tname, _dim in sat_block_names(config):
        b = inj_params[outer][inner]
        if "sketch_proj" in b:
            out[f"{tname}.sketch_proj.weight"] = _np(
                b["sketch_proj"]["kernel"]).T
            out[f"{tname}.sketch_proj.bias"] = _np(b["sketch_proj"]["bias"])
        out[f"{tname}.sketch_norm.weight"] = _np(
            b["sketch_norm"]["LayerNorm_0"]["scale"])
        out[f"{tname}.sketch_norm.bias"] = _np(
            b["sketch_norm"]["LayerNorm_0"]["bias"])
        for proj in ("to_q", "to_k", "to_v"):
            out[f"{tname}.sketch_attn.{proj}.weight"] = _np(
                b["sketch_attn"][proj]["kernel"]).T
        out[f"{tname}.sketch_attn.to_out.0.weight"] = _np(
            b["sketch_attn"]["to_out"]["kernel"]).T
        out[f"{tname}.sketch_attn.to_out.0.bias"] = _np(
            b["sketch_attn"]["to_out"]["bias"])
        out[f"{tname}.sketch_conv.weight"] = _np(
            b["sketch_conv"]["kernel"]).T[:, :, None]
        out[f"{tname}.sketch_conv.bias"] = _np(b["sketch_conv"]["bias"])
    return out


def convert_torch_sat(state_dict, config: UNetConfig) -> dict:
    """``sketch_attn_model.pt`` state dict -> injection param tree, ready
    for ``train.train_attn_inject.merge_injection_params`` into the base
    UNet params. Detects the variant by the presence of ``sketch_proj``
    keys (clip) vs none (sketch). Run under ``core.manifest.strict_convert``
    by the loaders so renamed/missing keys fail loudly."""
    tree: Dict[str, dict] = {}
    for outer, inner, tname, _dim in sat_block_names(config):
        b: Dict[str, dict] = {}
        if f"{tname}.sketch_proj.weight" in state_dict:
            b["sketch_proj"] = {
                "kernel": _np(state_dict[f"{tname}.sketch_proj.weight"]).T,
                "bias": _np(state_dict[f"{tname}.sketch_proj.bias"]),
            }
        b["sketch_norm"] = {"LayerNorm_0": {
            "scale": _np(state_dict[f"{tname}.sketch_norm.weight"]),
            "bias": _np(state_dict[f"{tname}.sketch_norm.bias"]),
        }}
        attn = {
            proj: {"kernel": _np(
                state_dict[f"{tname}.sketch_attn.{proj}.weight"]).T}
            for proj in ("to_q", "to_k", "to_v")
        }
        attn["to_out"] = {
            "kernel": _np(
                state_dict[f"{tname}.sketch_attn.to_out.0.weight"]).T,
            "bias": _np(state_dict[f"{tname}.sketch_attn.to_out.0.bias"]),
        }
        b["sketch_attn"] = attn
        b["sketch_conv"] = {
            "kernel": _np(state_dict[f"{tname}.sketch_conv.weight"])[:, :, 0].T,
            "bias": _np(state_dict[f"{tname}.sketch_conv.bias"]),
        }
        tree.setdefault(outer, {})[inner] = b
    return tree


# ---------------------------------------------------------------------------
# torch .pt IO (lazy torch import — torch is a [convert] extra)
# ---------------------------------------------------------------------------


def save_torch_state(path: str, state: Dict[str, np.ndarray]) -> None:
    """Write a ``torch.save``-format .pt the reference stack loads as-is."""
    import torch

    def t(v: np.ndarray):
        v = np.ascontiguousarray(v)
        if not v.flags.writeable:  # jax-backed buffers: torch wants writable
            v = v.copy()
        return torch.from_numpy(v)

    torch.save({k: t(v) for k, v in state.items()}, path)


def load_torch_state(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd) if isinstance(sd, dict) else sd

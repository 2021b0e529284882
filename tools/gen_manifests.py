"""Generate the committed checkpoint key-inventory manifests.

Run once (and re-run only when a checkpoint family is added):

    python tools/gen_manifests.py

Writes ``sketch2img_tpu/assets/manifests/*.json`` — the authoritative
{torch key: shape} inventories of every checkpoint the framework ingests
(VERDICT r2 item 1). Sources, in decreasing order of independence:

* ``text_encoder_sd15`` / the safety checker's vision tower: state dicts of
  REAL ``transformers`` models (`CLIPTextModel` / `CLIPVisionModel` at the
  SD1.5 / ViT-L-14 configs) — the very library the reference loads through
  (`trainer.py:103` via diffusers), so this naming is ground truth.
* ``unet_sd15`` / ``vae_sd15``: meta-device instantiations of the torch
  mirrors in ``tests/torch_sd_mirror.py`` (diffusers module naming at full
  SD1.5 scale, zero memory). The mirror's naming is pinned against
  transformers' conventions where they overlap and against the converter's
  independent key loops — two separately-written sources must agree here.
* ``edge_predictor``: the Linear/ReLU/BatchNorm1d stack of
  /root/reference/modules/latent_predictor.py:15-28 built as a real torch
  ``nn.Sequential`` (state-dict naming straight from torch itself).
* ``netG``: the pix2pix UnetSkipConnectionBlock recursion of
  /root/reference/anime2sketch/model.py:35-116 built in torch
  (tests/test_anime2sketch.py's golden model) at the published
  (3, 1, num_downs=8, ngf=64) size, with the DataParallel ``module.``
  prefix the published file carries (model.py:110-115 strips it).
"""

from __future__ import annotations

import json
import os
import sys

import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "sketch2img_tpu", "assets", "manifests")


def state_shapes(module: nn.Module, prefix: str = "") -> dict:
    return {
        prefix + k: list(v.shape)
        for k, v in module.state_dict().items()
    }


def write(name: str, shapes: dict, meta: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name + ".json")
    doc = {"_meta": meta}
    doc.update(dict(sorted(shapes.items())))
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"{name}: {len(shapes)} keys -> {path}")


def gen_unet():
    from torch_sd_mirror import TorchMiniUNet

    with torch.device("meta"):
        m = TorchMiniUNet(in_ch=4, out_ch=4,
                          block_out=(320, 640, 1280, 1280), layers=2,
                          cross=(True, True, True, False),
                          context_dim=768, heads=8)
    write("unet_sd15", state_shapes(m), {
        "checkpoint": "unet/diffusion_pytorch_model.(safetensors|bin)",
        "architecture": "diffusers UNet2DConditionModel, SD1.5 "
                        "(block_out 320/640/1280/1280, layers 2, heads 8, "
                        "cross-attn dim 768)",
        "source": "tests/torch_sd_mirror.TorchMiniUNet at full scale "
                  "(meta device); naming cross-checked by the independent "
                  "key loops in core/convert.convert_torch_unet",
        "consumer": "core/convert.convert_torch_unet",
    })


def gen_vae():
    from torch_sd_mirror import TorchMiniVAE

    with torch.device("meta"):
        m = TorchMiniVAE(block_out=(128, 256, 512, 512), layers=2, latent=4)
    write("vae_sd15", state_shapes(m), {
        "checkpoint": "vae/diffusion_pytorch_model.(safetensors|bin)",
        "architecture": "diffusers AutoencoderKL, SD1.5 "
                        "(block_out 128/256/512/512, layers 2, latent 4)",
        "source": "tests/torch_sd_mirror.TorchMiniVAE at full scale "
                  "(meta device)",
        "attention_naming": "query/key/value/proj_attn (the original "
                            "runwayml export); newer re-exports use "
                            "to_q/to_k/to_v/to_out.0 — the converter "
                            "accepts both (core/convert._vae_attention)",
        "consumer": "core/convert.convert_torch_vae",
    })


def gen_text():
    import transformers

    cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, projection_dim=768,
    )
    m = transformers.CLIPTextModel(cfg)
    shapes = state_shapes(m)
    # transformers <4.31 serialized the position_ids buffer; the published
    # SD1.5 text_encoder carries it. Optional: ignored on load.
    shapes["text_model.embeddings.position_ids"] = [1, 77]
    write("text_encoder_sd15", shapes, {
        "checkpoint": "text_encoder/model.(safetensors|bin)",
        "architecture": "transformers CLIPTextModel, ViT-L/14 text tower "
                        "(hidden 768, 12 layers, 12 heads)",
        "source": "REAL transformers.CLIPTextModel state dict "
                  f"(transformers {transformers.__version__})",
        "optional_keys": ["text_model.embeddings.position_ids"],
        "consumer": "models/clip_text.convert_torch_clip_text",
    })


def gen_safety():
    import transformers

    cfg = transformers.CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, patch_size=14, image_size=224,
        projection_dim=768,
    )
    tower = transformers.CLIPVisionModel(cfg)
    shapes = state_shapes(tower, prefix="vision_model.")
    shapes["vision_model.vision_model.embeddings.position_ids"] = [1, 257]
    # StableDiffusionSafetyChecker head (diffusers
    # safety_checker.py: visual_projection + concept/special-care banks)
    shapes.update({
        "visual_projection.weight": [768, 1024],
        "concept_embeds": [17, 768],
        "concept_embeds_weights": [17],
        "special_care_embeds": [3, 768],
        "special_care_embeds_weights": [3],
    })
    write("safety_checker_sd15", shapes, {
        "checkpoint": "safety_checker/(model|pytorch_model).(safetensors|bin)",
        "architecture": "diffusers StableDiffusionSafetyChecker: "
                        "CLIPVisionModel ViT-L/14 tower + visual_projection "
                        "(768x1024, no bias) + 17 concept / 3 special-care "
                        "embedding banks with per-bank thresholds",
        "source": "REAL transformers.CLIPVisionModel state dict for the "
                  "tower; head tensor shapes per the diffusers class "
                  "definition",
        "optional_keys": ["vision_model.vision_model.embeddings.position_ids"],
        "consumer": "models/safety_checker.convert_torch_safety_checker",
    })


def gen_lgp():
    # /root/reference/modules/latent_predictor.py:15-28 — Sequential of
    # Linear(9320,512) ReLU BN(512) ... Linear(64,4); attribute name `layers`
    class LGP(nn.Module):
        def __init__(self):
            super().__init__()
            widths = [9320, 512, 256, 128, 64]
            mods = []
            for i in range(4):
                mods += [nn.Linear(widths[i], widths[i + 1]), nn.ReLU(),
                         nn.BatchNorm1d(widths[i + 1])]
            mods.append(nn.Linear(widths[-1], 4))
            self.layers = nn.Sequential(*mods)

    with torch.device("meta"):
        m = LGP()
    write("edge_predictor", state_shapes(m), {
        "checkpoint": "edge_predictor.pt (README.md:20, app.py:67-68)",
        "architecture": "9320->512->256->128->64->4 Linear/ReLU/BatchNorm1d "
                        "stack (latent_predictor.py:15-28)",
        "source": "real torch nn.Sequential state-dict naming (meta device)",
        "optional_keys": [f"layers.{i}.num_batches_tracked"
                         for i in (2, 5, 8, 11)],
        "consumer": "models/lgp.convert_torch_lgp",
    })


def gen_netg():
    from test_anime2sketch import TorchUnetGenerator

    with torch.device("meta"):
        m = TorchUnetGenerator(3, 1, num_downs=8, ngf=64)
    # the published file is DataParallel-saved: every key module.-prefixed
    write("netG", state_shapes(m, prefix="module."), {
        "checkpoint": "netG.pth (trainer.py:114, HF hub)",
        "architecture": "pix2pix UnetGenerator(3, 1, num_downs=8, ngf=64), "
                        "InstanceNorm (no norm params), DataParallel "
                        "module. prefix (anime2sketch/model.py:104-116)",
        "source": "tests/test_anime2sketch.TorchUnetGenerator at the "
                  "published size (meta device)",
        "consumer": "models/anime2sketch.convert_torch_anime2sketch "
                    "(accepts prefixed and bare keys)",
    })


def gen_clip_vision():
    # the clip trainer's OTHER artifact: the trainable vision tower saved
    # whole (clip_guided_trainer.py:105,263 — CLIPVisionModel ViT-L/14)
    import transformers

    cfg = transformers.CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, patch_size=14, image_size=224,
        projection_dim=768,
    )
    m = transformers.CLIPVisionModel(cfg)
    shapes = state_shapes(m)
    shapes["vision_model.embeddings.position_ids"] = [1, 257]
    write("clip_vision_l14", shapes, {
        "checkpoint": "sketch_encoder_model.pt "
                      "(clip_guided_trainer.py:263, clip_guided_inf.py:51)",
        "architecture": "transformers CLIPVisionModel ViT-L/14 "
                        "(hidden 1024, 24 layers, 16 heads, patch 14)",
        "source": "REAL transformers.CLIPVisionModel state dict "
                  f"(transformers {transformers.__version__})",
        "optional_keys": ["vision_model.embeddings.position_ids",
                          "vision_model.post_layernorm.weight",
                          "vision_model.post_layernorm.bias"],
        "notes": "post_layernorm feeds only the pooled output, which "
                 "neither consumer touches (clip_guided_inf.py uses "
                 "last_hidden_state); the exporter emits it as identity",
        "consumer": "models/clip_vision.convert_torch_clip_vision / "
                    "core/export.clip_vision_to_torch_state",
    })


def gen_sat():
    # SatMixin module tree (clip_guided_attn.py:8-27): per BasicTransformer-
    # Block a module named "sketch_attn_<unet path, dots->underscores>"
    # holding sketch_proj / sketch_norm / sketch_attn (diffusers
    # CrossAttention: bias-free to_q/k/v + to_out Sequential(Linear,
    # Dropout)) / sketch_conv (1x1 Conv1d). Built here from plain torch
    # modules so the state-dict naming comes from torch itself.
    from sketch2img_tpu.core.export import sat_block_names
    from sketch2img_tpu.models.unet import SD15_CONFIG

    class SatAttn(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.to_q = nn.Linear(dim, dim, bias=False)
            self.to_k = nn.Linear(dim, dim, bias=False)
            self.to_v = nn.Linear(dim, dim, bias=False)
            self.to_out = nn.Sequential(nn.Linear(dim, dim), nn.Dropout(0.0))

    class SatBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.sketch_proj = nn.Linear(1024, dim)
            self.sketch_norm = nn.LayerNorm(dim)
            self.sketch_attn = SatAttn(dim)
            self.sketch_conv = nn.Conv1d(dim, dim, 1)

    class SatMirror(nn.Module):
        def __init__(self):
            super().__init__()
            for _o, _i, tname, dim in sat_block_names(SD15_CONFIG):
                self.add_module(tname, SatBlock(dim))

    with torch.device("meta"):
        m = SatMirror()
    write("sat_sd15", state_shapes(m), {
        "checkpoint": "sketch_attn_model.pt "
                      "(clip_guided_trainer.py:264, clip_guided_inf.py:47)",
        "architecture": "SatMixin over the SD1.5 UNet: one "
                        "proj/norm/cross-attn/conv1x1 module per "
                        "TransformerBlock (16 sites), clip variant "
                        "(clip_guided_attn.py:37-64)",
        "source": "plain-torch mirror of the SatMixin module tree at SD1.5 "
                  "scale (meta device); site names enumerated by "
                  "core/export.sat_block_names",
        "consumer": "core/export.convert_torch_sat",
    })


if __name__ == "__main__":
    gen_unet()
    gen_vae()
    gen_text()
    gen_safety()
    gen_lgp()
    gen_netg()
    gen_clip_vision()
    gen_sat()

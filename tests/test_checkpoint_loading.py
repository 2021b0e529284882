"""Integration: load a synthetic diffusers-format model directory (torch
.bin and .safetensors) through SDComponents.from_diffusers_dir and generate
an image — exercises the full reference-checkpoint ingestion path."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.models.clip_text import CLIPTextConfig  # noqa: E402
from sketch2img_tpu.models.unet import UNetConfig  # noqa: E402
from sketch2img_tpu.models.vae import VAEConfig  # noqa: E402
from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline  # noqa: E402

from torch_sd_mirror import TorchMiniUNet, TorchMiniVAE  # noqa: E402
from fakes import FakeTokenizer  # noqa: E402


UNET_CFG = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, False),
                      num_heads=2, cross_attention_dim=32)
VAE_CFG = VAEConfig(block_out_channels=(32, 64))
TEXT_CFG = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                          num_layers=2, num_heads=4)


def _make_dir(tmp_path, fmt: str) -> str:
    torch.manual_seed(0)
    tunet = TorchMiniUNet(in_ch=4, out_ch=4, block_out=(32, 64), layers=2,
                          cross=(True, False), context_dim=32, heads=2)
    tvae = TorchMiniVAE(block_out=(32, 64), layers=2, latent=4)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77,
    )
    ttext = transformers.CLIPTextModel(hf_cfg)

    root = tmp_path / fmt
    for sub, model, base in [
        ("unet", tunet, "diffusion_pytorch_model"),
        ("vae", tvae, "diffusion_pytorch_model"),
        ("text_encoder", ttext, "model"),
    ]:
        d = root / sub
        d.mkdir(parents=True)
        sd = model.state_dict()
        if fmt == "bin":
            torch.save(sd, d / f"{base}.bin")
        else:
            from safetensors.numpy import save_file

            save_file({k: v.numpy() for k, v in sd.items()},
                      str(d / f"{base}.safetensors"))
    return str(root)


@pytest.mark.parametrize("fmt", ["bin", "safetensors"])
def test_load_and_generate(tmp_path, fmt):
    path = _make_dir(tmp_path, fmt)
    c = SDComponents.from_diffusers_dir(
        path, compute_dtype=jnp.float32,
        unet_config=UNET_CFG, vae_config=VAE_CFG, text_config=TEXT_CFG,
    )
    assert c.tokenizer is None  # no tokenizer dir in the synthetic model
    c.tokenizer = FakeTokenizer()
    pipe = SketchGuidedPipeline(c)
    img = pipe("hello", num_inference_steps=2, width=64, height=64, seed=3)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_bin_and_safetensors_agree(tmp_path):
    a = SDComponents.from_diffusers_dir(
        _make_dir(tmp_path, "bin"), compute_dtype=jnp.float32,
        unet_config=UNET_CFG, vae_config=VAE_CFG, text_config=TEXT_CFG)
    b = SDComponents.from_diffusers_dir(
        _make_dir(tmp_path, "safetensors"), compute_dtype=jnp.float32,
        unet_config=UNET_CFG, vae_config=VAE_CFG, text_config=TEXT_CFG)
    la = np.asarray(jnp.ravel(a.unet_params["conv_in"]["kernel"]))
    lb = np.asarray(jnp.ravel(b.unet_params["conv_in"]["kernel"]))
    np.testing.assert_array_equal(la, lb)


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        SDComponents.from_diffusers_dir(str(tmp_path / "nope"))


def test_native_format_roundtrip(tmp_path):
    src = SDComponents.from_diffusers_dir(
        _make_dir(tmp_path, "bin"), compute_dtype=jnp.float32,
        unet_config=UNET_CFG, vae_config=VAE_CFG, text_config=TEXT_CFG)
    native = str(tmp_path / "native")
    src.save_native(native)
    back = SDComponents.from_native(
        native, compute_dtype=jnp.float32,
        unet_config=UNET_CFG, vae_config=VAE_CFG, text_config=TEXT_CFG)
    a = np.asarray(src.unet_params["conv_in"]["kernel"])
    b = np.asarray(back.unet_params["conv_in"]["kernel"])
    np.testing.assert_array_equal(a, b)
    back.tokenizer = FakeTokenizer()
    img = SketchGuidedPipeline(back)("x", num_inference_steps=1,
                                     width=64, height=64, seed=1)
    assert img.shape == (64, 64, 3)

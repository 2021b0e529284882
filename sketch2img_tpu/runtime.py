"""High-level runtime: assemble the SD stack, load reference checkpoints,
expose the user-facing pipeline API of the reference apps.

Mirrors the entry surface of /root/reference/app.py (AntiGradientPipeline +
LGP weights + VAE sketch encode) and clip_guided_inf.py (injected UNet +
CLIP vision conditioning), with jit caches keyed on (height, width, steps)
— the UI exposes 64-1024px in steps of 8 (app.py:188-193), each size is a
separate XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sketch2img_tpu.core.convert import (
    convert_torch_clip_text,
    convert_torch_lgp,
    convert_torch_unet,
    convert_torch_vae,
)
from sketch2img_tpu.core.schedulers import DiffusionSchedule, make_schedule
from sketch2img_tpu.models.clip_text import CLIPTextEncoder, SD15_TEXT_CONFIG
from sketch2img_tpu.models.lgp import LatentEdgePredictor
from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition, UNetConfig
from sketch2img_tpu.models.vae import SD15_VAE_CONFIG, AutoencoderKL, sample_latent
from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn
from sketch2img_tpu.pipelines.text2img import make_text2img_fn, latents_to_image


def _load_state_dict(path_base: str):
    """Load <base>.safetensors or <base>.bin (torch pickle)."""
    st = path_base + ".safetensors"
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    bin_path = path_base + ".bin"
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(f"no checkpoint at {path_base}.(safetensors|bin)")


@dataclasses.dataclass
class SDComponents:
    """Model modules + parameter trees + schedule for SD1.x."""

    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    unet_params: Any
    vae_params: Any
    text_params: Any
    schedule: DiffusionSchedule
    tokenizer: Any = None
    lgp: Optional[LatentEdgePredictor] = None
    lgp_vars: Any = None

    @classmethod
    def from_diffusers_dir(
        cls,
        model_path: str,
        *,
        compute_dtype=jnp.bfloat16,
        unet_config: UNetConfig = SD15_CONFIG,
        vae_config=SD15_VAE_CONFIG,
        text_config=SD15_TEXT_CONFIG,
    ) -> "SDComponents":
        """Load a diffusers-format SD1.x model directory (the reference's
        ``StableDiffusionPipeline.from_pretrained(config.model_path)``,
        trainer.py:102). Accepts .safetensors or torch .bin weights."""
        unet_sd = _load_state_dict(
            os.path.join(model_path, "unet", "diffusion_pytorch_model")
        )
        vae_sd = _load_state_dict(
            os.path.join(model_path, "vae", "diffusion_pytorch_model")
        )
        text_sd = _load_state_dict(os.path.join(model_path, "text_encoder", "model"))

        tokenizer = None
        tok_dir = os.path.join(model_path, "tokenizer")
        if os.path.isdir(tok_dir):
            from transformers import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

        return cls(
            unet=UNet2DCondition(unet_config, compute_dtype=compute_dtype),
            vae=AutoencoderKL(vae_config, compute_dtype=compute_dtype),
            text_encoder=CLIPTextEncoder(text_config, compute_dtype=compute_dtype),
            unet_params=convert_torch_unet(unet_sd, unet_config),
            vae_params=convert_torch_vae(vae_sd, vae_config),
            text_params=convert_torch_clip_text(text_sd, num_layers=text_config.num_layers),
            schedule=make_schedule(),
            tokenizer=tokenizer,
        )

    @classmethod
    def random_init(
        cls,
        *,
        seed: int = 0,
        compute_dtype=jnp.bfloat16,
        unet_config: UNetConfig = SD15_CONFIG,
        vae_config=SD15_VAE_CONFIG,
        text_config=SD15_TEXT_CONFIG,
        random_weights: bool = False,
    ) -> "SDComponents":
        """Zero (or random) weights at the given architecture — benchmarking
        and tests."""
        unet = UNet2DCondition(unet_config, compute_dtype=compute_dtype)
        vae = AutoencoderKL(vae_config, compute_dtype=compute_dtype)
        text = CLIPTextEncoder(text_config, compute_dtype=compute_dtype)
        ctx_dim = unet_config.cross_attention_dim

        def make_init(module, *a, **kw):
            if random_weights:
                return module.init(jax.random.PRNGKey(seed), *a, **kw)
            shapes = jax.eval_shape(
                lambda: module.init(jax.random.PRNGKey(seed), *a, **kw)
            )
            return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        unet_params = make_init(
            unet, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, ctx_dim)),
        )["params"]
        vae_latent = 64 >> (len(vae_config.block_out_channels) - 1)
        vae_params = make_init(
            vae, jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, vae_latent, vae_latent, vae_config.latent_channels)),
        )["params"]
        text_params = make_init(text, jnp.zeros((1, 77), jnp.int32))["params"]
        return cls(
            unet=unet, vae=vae, text_encoder=text,
            unet_params=unet_params, vae_params=vae_params, text_params=text_params,
            schedule=make_schedule(),
        )

    def load_lgp_torch(self, path: str, compute_dtype=jnp.float32) -> None:
        """Load the published ``edge_predictor.pt`` (app.py:67-68,
        README.md:20) into the Flax LGP."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        params, stats = convert_torch_lgp(sd)
        self.lgp = LatentEdgePredictor(compute_dtype=compute_dtype)
        self.lgp_vars = {"params": params, "batch_stats": stats}

    def save_native(self, directory: str) -> None:
        """One-time conversion target: save all parameter trees as npz so
        production serving never touches torch pickles again."""
        from sketch2img_tpu.train.checkpoint import export_params_npz

        os.makedirs(directory, exist_ok=True)
        export_params_npz(os.path.join(directory, "unet.npz"), self.unet_params)
        export_params_npz(os.path.join(directory, "vae.npz"), self.vae_params)
        export_params_npz(os.path.join(directory, "text.npz"), self.text_params)
        if self.lgp_vars is not None:
            export_params_npz(os.path.join(directory, "lgp.npz"), self.lgp_vars)

    @classmethod
    def from_native(
        cls,
        directory: str,
        *,
        compute_dtype=jnp.bfloat16,
        unet_config: UNetConfig = SD15_CONFIG,
        vae_config=SD15_VAE_CONFIG,
        text_config=SD15_TEXT_CONFIG,
        tokenizer=None,
    ) -> "SDComponents":
        from sketch2img_tpu.train.checkpoint import load_params_npz

        c = cls(
            unet=UNet2DCondition(unet_config, compute_dtype=compute_dtype),
            vae=AutoencoderKL(vae_config, compute_dtype=compute_dtype),
            text_encoder=CLIPTextEncoder(text_config, compute_dtype=compute_dtype),
            unet_params=load_params_npz(os.path.join(directory, "unet.npz")),
            vae_params=load_params_npz(os.path.join(directory, "vae.npz")),
            text_params=load_params_npz(os.path.join(directory, "text.npz")),
            schedule=make_schedule(),
            tokenizer=tokenizer,
        )
        lgp_path = os.path.join(directory, "lgp.npz")
        if os.path.exists(lgp_path):
            c.lgp = LatentEdgePredictor()
            c.lgp_vars = load_params_npz(lgp_path)
        return c

    @property
    def vae_scale_factor(self) -> int:
        """Pixel-to-latent downscale (8 for SD1.x)."""
        return 2 ** (len(self.vae.config.block_out_channels) - 1)

    # ---- functional apply handles (pipeline building blocks) ----

    def unet_apply(self, p, x, t, ctx):
        return self.unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(self, p, x, t, ctx):
        return self.unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def vae_decode(self, p, z):
        return self.vae.apply({"params": p}, z, method=AutoencoderKL.decode)

    def vae_encode_moments(self, p, img):
        return self.vae.apply({"params": p}, img, method=AutoencoderKL.encode)

    def text_apply(self, p, ids):
        return self.text_encoder.apply({"params": p}, ids)

    def lgp_apply(self, v, feats, nl):
        assert self.lgp is not None, "call load_lgp_torch / set lgp first"
        return self.lgp.apply(v, feats, nl, train=False)


class SketchGuidedPipeline:
    """User-facing pipeline with the reference demo's call signature
    (app.py:84-123): prompt, negative prompt, steps, guidance, size, seed,
    optional sketchpad image."""

    def __init__(self, components: SDComponents):
        self.c = components
        self._fns: Dict[Tuple, Any] = {}

    # -- text encoding (pipeline.py:55-57: CFG pair, 77-token padded) --

    def encode_prompt(self, prompt: str, negative_prompt: str = "") -> Tuple[jnp.ndarray, jnp.ndarray]:
        tok = self.c.tokenizer
        assert tok is not None, "tokenizer not loaded"

        def ids(text):
            return np.asarray(
                tok(text, padding="max_length", truncation=True, max_length=77).input_ids,
                np.int32,
            )[None]

        text_fn = jax.jit(self.c.text_apply)
        cond = text_fn(self.c.text_params, jnp.asarray(ids(prompt)))
        uncond = text_fn(self.c.text_params, jnp.asarray(ids(negative_prompt)))
        return uncond, cond

    def encode_sketch(self, sketch01: np.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Grayscale sketchpad [0,1] (H,W) or (H,W,1) -> VAE latent target
        x0.18215 (app.py:106-109: normalize to [-1,1], tile to 3ch, encode)."""
        arr = np.asarray(sketch01, np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        arr = (arr - 0.5) / 0.5
        arr = np.tile(arr, (1, 1, 3))[None]
        mean, logvar = self.c.vae_encode_moments(self.c.vae_params, jnp.asarray(arr))
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        return sample_latent(mean, logvar, noise)

    def _get_fn(self, kind: str, steps: int):
        key = (kind, steps)
        if key not in self._fns:
            if kind == "sketch":
                from sketch2img_tpu.models.lgp import lgp_fused_apply

                def lgp_fused(v, taps, nl, hh, ww):
                    return lgp_fused_apply(
                        v, taps, nl, hh, ww,
                        compute_dtype=self.c.lgp.compute_dtype,
                    )

                fn = make_sketch_guided_fn(
                    self.c.unet_apply, self.c.unet_apply_taps, self.c.lgp_apply,
                    self.c.schedule, steps, lgp_apply_fused=lgp_fused,
                )
            else:
                fn = make_text2img_fn(self.c.unet_apply, self.c.schedule, steps)
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def __call__(
        self,
        prompt: str,
        *,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        width: int = 512,
        height: int = 512,
        seed: int = 0,
        sketch_image: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """-> (H, W, 3) float image in [0, 1]."""
        key = jax.random.PRNGKey(seed if seed != 0 else np.random.randint(2**31 - 1))
        k_lat, k_sketch = jax.random.split(key)
        f = self.c.vae_scale_factor
        h, w = height // f, width // f
        latents0 = jax.random.normal(k_lat, (1, h, w, 4), jnp.float32)
        uncond, cond = self.encode_prompt(prompt, negative_prompt)

        if sketch_image is not None:
            target = self.encode_sketch(sketch_image, k_sketch)
            fn = self._get_fn("sketch", num_inference_steps)
            latents = fn(self.c.unet_params, self.c.lgp_vars, latents0,
                         uncond, cond, target, guidance_scale)
        else:
            fn = self._get_fn("text", num_inference_steps)
            latents = fn(self.c.unet_params, latents0,
                         jnp.concatenate([uncond, cond], axis=0), guidance_scale)

        img = latents_to_image(
            functools.partial(self.c.vae_decode), self.c.vae_params, latents
        )
        return np.asarray(img[0], np.float32)

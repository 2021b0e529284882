"""CLIP-based NSFW safety checker — parity with the checker the reference
pipeline runs on every generation.

The reference's AntiGradientPipeline inherits StableDiffusionPipeline and
calls ``self.run_safety_checker(image, ...)`` after decode
(/root/reference/modules/pipeline.py:121): CLIP-preprocess the decoded
image, embed it with the checker's vision tower, project to the shared
space, compare against fixed "concept" and "special care" embeddings by
cosine similarity with per-concept thresholds, and black out flagged
images. This module re-implements that contract TPU-natively (NHWC, one
jit-able function) on top of models.clip_vision.CLIPVisionEncoder.

Checker math (the shipped CompVis checker's forward semantics):
  image_embeds   = post_layernorm(h[:, 0]) @ W_proj            (B, 768)
  special_scores = cos(image_embeds, special_embeds) - special_thresholds
  special_care   = any(special_scores > 0)       # lowers all thresholds
  concept_scores = cos(image_embeds, concept_embeds) - thresholds
                   + 0.01 * special_care
  nsfw           = any(concept_scores > 0)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from sketch2img_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    VIT_L14_CONFIG,
    convert_torch_clip_vision,
)

# CLIP image normalization (the checker's feature extractor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class SafetyCheckerParams:
    """Parameter bundle: vision tower + projection head + concept banks."""

    vision: Any                    # CLIPVisionEncoder params
    post_ln_scale: jnp.ndarray     # (hidden,)
    post_ln_bias: jnp.ndarray      # (hidden,)
    projection: jnp.ndarray        # (hidden, proj_dim), applied as x @ W
    concept_embeds: jnp.ndarray            # (n_concepts, proj_dim)
    concept_thresholds: jnp.ndarray        # (n_concepts,)
    special_care_embeds: jnp.ndarray       # (n_special, proj_dim)
    special_care_thresholds: jnp.ndarray   # (n_special,)


jax.tree_util.register_dataclass(
    SafetyCheckerParams,
    data_fields=["vision", "post_ln_scale", "post_ln_bias", "projection",
                 "concept_embeds", "concept_thresholds",
                 "special_care_embeds", "special_care_thresholds"],
    meta_fields=[],
)


def preprocess(images01: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """Decoded images [0,1] (B, H, W, 3) -> CLIP pixel values: bicubic
    resize (shortest edge), center crop, normalize — the checker's feature
    extractor contract."""
    b, h, w, _ = images01.shape
    if h <= w:
        nh, nw = image_size, max(int(round(w * image_size / h)), image_size)
    else:
        nh, nw = max(int(round(h * image_size / w)), image_size), image_size
    x = jax.image.resize(images01, (b, nh, nw, 3), method="bicubic")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, image_size, image_size, 3)
    )
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    return (jnp.clip(x, 0.0, 1.0) - mean) / std


def _cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return an @ bn.T


def check_images(
    vision_apply,
    p: SafetyCheckerParams,
    images01: jnp.ndarray,
    *,
    image_size: int = 224,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (images with flagged entries blacked out, (B,) bool nsfw flags).

    jit-able; ``vision_apply(params, pixel_values) -> last_hidden_state``
    (pre-post_layernorm, the CLIPVisionEncoder contract).
    """
    pixels = preprocess(images01.astype(jnp.float32), image_size)
    hidden = vision_apply(p.vision, pixels)
    cls = hidden[:, 0, :].astype(jnp.float32)
    mean = jnp.mean(cls, axis=-1, keepdims=True)
    var = jnp.var(cls, axis=-1, keepdims=True)
    pooled = (cls - mean) * jax.lax.rsqrt(var + 1e-5)
    pooled = pooled * p.post_ln_scale + p.post_ln_bias
    image_embeds = pooled @ p.projection.astype(jnp.float32)

    special_scores = (
        _cosine(image_embeds, p.special_care_embeds.astype(jnp.float32))
        - p.special_care_thresholds
    )
    special_care = jnp.any(special_scores > 0.0, axis=-1)
    concept_scores = (
        _cosine(image_embeds, p.concept_embeds.astype(jnp.float32))
        - p.concept_thresholds
        + 0.01 * special_care[:, None].astype(jnp.float32)
    )
    nsfw = jnp.any(concept_scores > 0.0, axis=-1)
    blacked = jnp.where(nsfw[:, None, None, None], 0.0, images01)
    return blacked.astype(images01.dtype), nsfw


def convert_torch_safety_checker(state_dict, num_layers: int = 24) -> SafetyCheckerParams:
    """Convert the published ``safety_checker/`` torch weights (the checker
    the diffusers SD1.x directory ships) into SafetyCheckerParams."""
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    # the checker nests a CLIPVisionModel at `vision_model.` — strip one
    # level (read-through view: keeps strict-mode consumption tracking,
    # core/manifest.py) and reuse the CLIP vision converter
    from sketch2img_tpu.core.manifest import PrefixStripView

    inner = PrefixStripView(state_dict, "vision_model.")
    vision = convert_torch_clip_vision(inner, num_layers=num_layers)
    p = "vision_model." if any(k.startswith("vision_model.vision_model.")
                               for k in state_dict) else ""
    return SafetyCheckerParams(
        vision=vision,
        post_ln_scale=jnp.asarray(arr(f"vision_model.{p}post_layernorm.weight")),
        post_ln_bias=jnp.asarray(arr(f"vision_model.{p}post_layernorm.bias")),
        projection=jnp.asarray(arr("visual_projection.weight").T),
        concept_embeds=jnp.asarray(arr("concept_embeds")),
        concept_thresholds=jnp.asarray(arr("concept_embeds_weights")),
        special_care_embeds=jnp.asarray(arr("special_care_embeds")),
        special_care_thresholds=jnp.asarray(arr("special_care_embeds_weights")),
    )


def make_safety_checker(
    config: CLIPVisionConfig = VIT_L14_CONFIG,
    compute_dtype=jnp.float32,
):
    """-> (CLIPVisionEncoder, jit-able check fn(params, images01))."""
    vision = CLIPVisionEncoder(config, compute_dtype=compute_dtype)

    def run(p: SafetyCheckerParams, images01: jnp.ndarray):
        return check_images(
            lambda vp, px: vision.apply({"params": vp}, px), p, images01,
            image_size=config.image_size,
        )

    return vision, run

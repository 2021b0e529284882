"""Single-image LGP evaluation — parity port of /root/reference/evaluation.py.

Loads the SD stack + LGP weights, noises a real image to t=100, runs ONE
UNet pass, predicts the edge map from the activation taps, decodes and
binarizes to ``output.png``. This is the parity fixture: same image + same
weights must reproduce the reference's edge map (BASELINE.md "edge parity").
"""

from __future__ import annotations

import argparse

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True,
                        help="diffusers-format SD1.x model dir")
    parser.add_argument("--weights", type=str, default="edge_predictor.pt")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="output.png")
    parser.add_argument("--prompt", type=str, default="1girl, masterpiece")
    parser.add_argument("--negative_prompt", type=str,
                        default="bad quality, worst quality, low quality")
    parser.add_argument("--timestep", type=int, default=100)  # evaluation.py:52
    parser.add_argument("--seed", type=int, default=0)
    return parser


def evaluate(components, prompt: str, negative_prompt: str, image01: np.ndarray,
             timestep: int, seed: int = 0, noise: np.ndarray = None,
             deterministic_latent: bool = False) -> np.ndarray:
    """Core fixture (evaluation.py:52-106). image01: (H,W,3) float in [0,1].
    Returns the binarized uint8 edge image (H,W,3).

    ``noise`` (optional, (1,h,w,4)) injects the diffusion noise explicitly
    and ``deterministic_latent=True`` uses the VAE posterior mean instead of
    sampling — together they make the fixture RNG-free so the same inputs
    can be replayed through the reference torch code for pixel-level parity
    (tools/edge_parity.py)."""
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.schedulers import add_noise, get_noise_level
    from sketch2img_tpu.models.unet import concat_taps
    from sketch2img_tpu.models.vae import sample_latent
    from sketch2img_tpu.pipelines.text2img import latents_to_image
    from sketch2img_tpu.runtime import SketchGuidedPipeline

    c = components
    pipe = SketchGuidedPipeline(c)
    uncond, cond = pipe.encode_prompt(prompt, negative_prompt)

    px = jnp.asarray((image01.astype(np.float32) - 0.5) / 0.5)[None]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    mean, logvar = c.vae_encode_moments(c.vae_params, px)
    if deterministic_latent:
        latents = mean
    else:
        latents = sample_latent(
            mean, logvar, jax.random.normal(k1, mean.shape, mean.dtype)
        )
    if noise is not None:
        noise = jnp.asarray(noise, latents.dtype)
    else:
        noise = jax.random.normal(k2, latents.shape, latents.dtype)

    t = jnp.full((1,), timestep, jnp.int32)
    noisy = add_noise(c.schedule, latents, noise, t)
    noise_level = get_noise_level(c.schedule, noise, t)

    # evaluation.py:92-102: CFG-doubled pass, cond-half activations only.
    # Per-sample modules make the cond half independent of the uncond half,
    # so a single cond-context pass is exact (see sketch_guided.py notes).
    _, taps = c.unet_apply_taps(c.unet_params, noisy, t, cond)
    feats = concat_taps(taps, latents.shape[1], latents.shape[2])
    edge_latent = c.lgp_apply(c.lgp_vars, feats, noise_level)

    img = latents_to_image(c.vae_decode, c.vae_params, edge_latent)
    img = np.array(img[0], np.float32)  # writable copy off-device
    img[img < 0.5] = 0  # evaluation.py:70 threshold
    return (img * 255).astype(np.uint8)


def main():
    from PIL import Image

    from sketch2img_tpu.runtime import SDComponents

    args = get_parser().parse_args()
    c = SDComponents.from_diffusers_dir(args.model_path)
    c.load_lgp_torch(args.weights)

    img = Image.open(args.input).convert("RGB")
    # transforms parity (evaluation.py:75-81): shorter side -> 512, LANCZOS
    w, h = img.size
    scale = 512 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
    # center-crop to a /64-divisible canvas for the UNet
    w, h = img.size
    w, h = (w // 64) * 64, (h // 64) * 64
    img = img.crop((0, 0, w, h))
    arr = np.asarray(img, np.float32) / 255.0

    out = evaluate(c, args.prompt, args.negative_prompt, arr, args.timestep, args.seed)
    Image.fromarray(out).convert("L").save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

"""Training-step throughput at the reference config (train.yaml:3-5):
batch 4, 512px, on-device anime2sketch, frozen UNet, 8-bit AdamW — one
jit'd step, random full-size weights.

  python tools/bench_train.py [--batch 4] [--size 512] [--reps 10]
      [--cached]        # cached-latents variant (dataset.cache_latents)
      [--inject]        # attention-injection trainer instead of LGP
                        # (clip_guided_trainer.py:68-267: injected blocks +
                        # CLIP ViT-L/14 vision tower trainable)
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _random_init(module, *a, seed=0, scale=0.02, **kw):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *a, **kw))
    rng = np.random.RandomState(seed)

    def leaf(s):
        return jnp.asarray(rng.normal(0.0, scale, s.shape).astype(np.float32), s.dtype)

    return jax.tree_util.tree_map(leaf, shapes)


def bench_inject(args):
    """Attention-injection train step at full SD1.5 scale: injected blocks
    + CLIP ViT-L/14 vision trainable, base UNet/VAE/text/GAN frozen
    (clip_guided_trainer.py:68-267)."""
    import dataclasses

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.anime2sketch import create_anime2sketch
    from sketch2img_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from sketch2img_tpu.models.clip_vision import (
        VIT_L14_CONFIG,
        CLIPVisionEncoder,
    )
    from sketch2img_tpu.models.unet import (
        SD15_CONFIG,
        UNet2DCondition,
        num_transformer_blocks,
    )
    from sketch2img_tpu.models.vae import AutoencoderKL, VAEConfig
    from sketch2img_tpu.train.optim import make_optimizer
    from sketch2img_tpu.train.train_attn_inject import (
        init_inject_train_state,
        make_inject_train_step,
        merge_injection_params,
    )

    dt = jnp.bfloat16
    b, size = args.batch, args.size
    hw = size // 8

    cfg = dataclasses.replace(SD15_CONFIG, injection="clip")
    unet = UNet2DCondition(cfg, compute_dtype=dt)
    vae = AutoencoderKL(VAEConfig(), compute_dtype=dt)
    text = CLIPTextEncoder(CLIPTextConfig())
    gan = create_anime2sketch(compute_dtype=dt)
    vision = CLIPVisionEncoder(VIT_L14_CONFIG, compute_dtype=dt)
    n_sites = num_transformer_blocks(cfg)

    print("initializing weights...", flush=True)
    states0 = [jnp.zeros((1, 257, 1024))] * n_sites
    up = _random_init(unet, jnp.zeros((1, hw, hw, 4)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
                      injection_states=states0, injection_scale=1.0)["params"]
    vp = _random_init(vae, jnp.zeros((1, 64, 64, 3)),
                      seed=1, method=AutoencoderKL.encode)["params"]
    tp = _random_init(text, jnp.zeros((1, 77), jnp.int32), seed=2)["params"]
    gp = _random_init(gan, jnp.zeros((1, 256, 256, 3)), seed=3)["params"]
    cp = _random_init(vision, jnp.zeros((1, 224, 224, 3)), seed=4)["params"]

    tx = make_optimizer("bitsandbytes.optim.AdamW8bit", 5e-5,
                        weight_decay=1e-2)
    step = make_inject_train_step(
        lambda p, x, t, c, s, sc: unet.apply({"params": p}, x, t, c,
                                             injection_states=s,
                                             injection_scale=sc),
        lambda p, px: vision.apply({"params": p}, px),
        lambda p, img: vae.apply({"params": p}, img,
                                 method=AutoencoderKL.encode),
        lambda p, ids: text.apply({"params": p}, ids),
        lambda p, img: gan.apply({"params": p}, img),
        make_schedule(), tx, n_sites,
        cached_latents=args.cached,
    )
    step = jax.jit(step, donate_argnums=(0,))

    state, base = init_inject_train_state(up, cp, tx)
    frozen = {"unet_base": base, "vae": vp, "text": tp, "gan": gp}
    if args.cached:
        batch = {
            "input_ids": jnp.full((b, 77), 42, jnp.int32),
            "latent_dist": jax.random.normal(
                jax.random.PRNGKey(9), (b, hw, hw, 8), jnp.float32) * 0.3,
            "sketch_clip_pixels": jax.random.normal(
                jax.random.PRNGKey(10), (b, 224, 224, 3), jnp.float32),
        }
    else:
        batch = {
            "input_ids": jnp.full((b, 77), 42, jnp.int32),
            "pixels": jax.random.normal(jax.random.PRNGKey(9),
                                        (b, size, size, 3),
                                        jnp.float32) * 0.3,
        }

    print("compiling...", flush=True)
    state, m = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(m["loss"])), "non-finite loss"
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.reps):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(i + 1))
    float(m["loss"])  # dependent fetch = sync through the tunnel
    dt_step = (time.perf_counter() - t0) / args.reps
    tag = " (cached latents)" if args.cached else ""
    print(f"inject bs{b} {size}px{tag}: {dt_step*1e3:.1f} ms/step, "
          f"{b/dt_step:.1f} images/sec/chip", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cached", action="store_true",
                   help="cached-latent step (dataset.cache_latents path: "
                        "no GAN, no VAE encodes in the step)")
    p.add_argument("--inject", action="store_true",
                   help="bench the attention-injection trainer "
                        "(train/train_attn_inject.py) instead of the LGP one")
    args = p.parse_args()

    if args.inject:
        return bench_inject(args)

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.anime2sketch import create_anime2sketch
    from sketch2img_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition
    from sketch2img_tpu.models.vae import AutoencoderKL, VAEConfig
    from sketch2img_tpu.train.optim import make_optimizer
    from sketch2img_tpu.train.train_lgp import (
        init_lgp_train_state,
        make_lgp_train_step,
    )

    dt = jnp.bfloat16
    b, size = args.batch, args.size
    hw = size // 8

    unet = UNet2DCondition(SD15_CONFIG, compute_dtype=dt)
    vae = AutoencoderKL(VAEConfig(), compute_dtype=dt)
    text = CLIPTextEncoder(CLIPTextConfig())
    gan = create_anime2sketch(compute_dtype=dt)
    lgp = LatentEdgePredictor(compute_dtype=dt)

    print("initializing weights...", flush=True)
    up = _random_init(unet, jnp.zeros((1, hw, hw, 4)), jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 77, 768)))["params"]
    vp = _random_init(vae, jnp.zeros((1, 64, 64, 3)),
                      seed=1, method=AutoencoderKL.encode)["params"]
    tp = _random_init(text, jnp.zeros((1, 77), jnp.int32), seed=2)["params"]
    gp = _random_init(gan, jnp.zeros((1, 256, 256, 3)), seed=3)["params"]
    lv = _random_init(lgp, jnp.zeros((1, hw, hw, 9280)), jnp.zeros((1, hw, hw, 4)),
                      seed=4)
    lv["batch_stats"] = jax.tree_util.tree_map(lambda x: jnp.abs(x) + 0.5,
                                               lv["batch_stats"])

    tx = make_optimizer("bitsandbytes.optim.AdamW8bit", 2e-4, weight_decay=1e-2)
    step = make_lgp_train_step(
        lambda v, f, n, train: lgp.apply(v, f, n, train=train,
                                         mutable=["batch_stats"]),
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c, capture_taps=True),
        lambda p, img: vae.apply({"params": p}, img, method=AutoencoderKL.encode),
        lambda p, ids: text.apply({"params": p}, ids),
        lambda p, img: gan.apply({"params": p}, img),
        make_schedule(), tx,
        cached_latents=args.cached,
    )
    step = jax.jit(step, donate_argnums=(0,))

    state = init_lgp_train_state(lv, tx)
    frozen = {"unet": up, "vae": vp, "text": tp, "gan": gp}
    if args.cached:
        batch = {
            "input_ids": jnp.full((b, 77), 42, jnp.int32),
            "latent_dist": jax.random.normal(
                jax.random.PRNGKey(9), (b, hw, hw, 8), jnp.float32) * 0.3,
            "sketch_latent_dist": jax.random.normal(
                jax.random.PRNGKey(10), (b, hw, hw, 8), jnp.float32) * 0.3,
        }
    else:
        batch = {
            "input_ids": jnp.full((b, 77), 42, jnp.int32),
            "pixels": jax.random.normal(jax.random.PRNGKey(9), (b, size, size, 3),
                                        jnp.float32) * 0.3,
        }

    print("compiling...", flush=True)
    state, m = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(m["loss"])), "non-finite loss"
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.reps):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(i + 1))
    float(m["loss"])  # dependent fetch = sync through the tunnel
    dt_step = (time.perf_counter() - t0) / args.reps
    tag = " (cached latents)" if args.cached else ""
    print(f"bs{b} {size}px{tag}: {dt_step*1e3:.1f} ms/step, "
          f"{b/dt_step:.1f} images/sec/chip", flush=True)


if __name__ == "__main__":
    main()

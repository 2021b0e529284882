"""Mid-training sample generation — implements the reference's ``sampling:``
config block (train.yaml:42-58), which is DEAD CODE there (neither trainer
reads it, SURVEY.md §2.4). Here it works: every N steps/epochs, render the
configured prompts with the current frozen SD stack and save PNGs (and
optionally log to wandb)."""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import numpy as np


class TrainingSampler:
    def __init__(
        self,
        sampling_cfg: Dict[str, Any],
        unet_apply: Callable,
        vae_decode: Callable,
        encode_prompt: Callable,  # (prompt, negative) -> (uncond, cond)
        schedule,
    ):
        self.cfg = dict(sampling_cfg or {})
        self.enabled = bool(self.cfg.get("enabled", False))
        self.unet_apply = unet_apply
        self.vae_decode = vae_decode
        self.encode_prompt = encode_prompt
        self.schedule = schedule
        self._fn = None

    def should_sample(self, *, step: Optional[int] = None,
                      epoch: Optional[int] = None) -> bool:
        if not self.enabled:
            return False
        if step is not None:
            n = int(self.cfg.get("every_n_steps", -1))
            return n > 0 and step % n == 0
        if epoch is not None:
            n = int(self.cfg.get("every_n_epochs", -1))
            return n > 0 and (epoch + 1) % n == 0
        return False

    def __call__(self, unet_params, vae_params, tag: str) -> list:
        import jax
        import jax.numpy as jnp

        from sketch2img_tpu.pipelines.text2img import (
            latents_to_image,
            make_text2img_fn,
        )

        cfg = self.cfg
        steps = int(cfg.get("steps", 20))
        if self._fn is None:
            self._fn = jax.jit(make_text2img_fn(self.unet_apply, self.schedule, steps))

        h = int(cfg.get("height", 512)) // 8
        w = int(cfg.get("width", 512)) // 8
        seed = int(cfg.get("seed", 0))
        cfg_scale = float(cfg.get("cfg_scale", 9))
        prompts = list(cfg.get("prompts", []))
        negatives = list(cfg.get("negative_prompts", []))
        save_dir = cfg.get("save_dir", "samples")
        os.makedirs(save_dir, exist_ok=True)

        paths = []
        for i, prompt in enumerate(prompts):
            neg = negatives[i % len(negatives)] if negatives else ""
            uncond, cond = self.encode_prompt(prompt, neg)
            key = jax.random.PRNGKey(seed + i)
            lat0 = jax.random.normal(key, (1, h, w, 4), jnp.float32)
            latents = self._fn(unet_params, lat0,
                               jnp.concatenate([uncond, cond], axis=0), cfg_scale)
            img = latents_to_image(self.vae_decode, vae_params, latents)
            arr = (np.asarray(img[0], np.float32) * 255).astype(np.uint8)
            path = os.path.join(save_dir, f"{tag}_{i}.png")
            try:
                from PIL import Image

                Image.fromarray(arr).save(path)
                paths.append(path)
            except Exception:
                np.save(path + ".npy", arr)
                paths.append(path + ".npy")
            if cfg.get("use_wandb"):
                try:
                    import wandb

                    wandb.log({f"samples/{i}": wandb.Image(arr)})
                except Exception:
                    pass
        return paths

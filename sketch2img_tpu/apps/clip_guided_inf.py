"""CLIP-variant (attention-injection) demo — parity port of
/root/reference/modules/clip_guided_inf.py.

Loads the SD stack with the clip-injection UNet variant, trained injection
weights + CLIP vision encoder, encodes the sketchpad through CLIP-ViT and
samples with the [zeros; hidden] CFG state pair and UI-strength scale
(clip_guided_inf.py:100-118)."""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time

import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_attn_weights(path: str, config) -> dict:
    """Injection params from our npz OR the reference's
    ``sketch_attn_model.pt`` (clip_guided_trainer.py:264) — torch files go
    through the manifest-pinned strict SAT converter."""
    if path.endswith((".pt", ".pth", ".bin")):
        from sketch2img_tpu.core.export import convert_torch_sat, load_torch_state
        from sketch2img_tpu.core.manifest import strict_convert

        return strict_convert(convert_torch_sat, load_torch_state(path),
                              config, what=f"sketch_attn_model ({path})")
    from sketch2img_tpu.train.checkpoint import load_params_npz

    return load_params_npz(path)


def load_clip_weights(path: str, num_layers: int) -> dict:
    """CLIP vision params from our npz OR the reference's
    ``sketch_encoder_model.pt`` (a CLIPVisionModel state dict,
    clip_guided_trainer.py:263). ``post_layernorm`` only feeds the pooled
    output neither stack uses — ignored like the position_ids buffer."""
    if path.endswith((".pt", ".pth", ".bin")):
        from sketch2img_tpu.core.export import load_torch_state
        from sketch2img_tpu.core.manifest import DEFAULT_IGNORE, strict_convert
        from sketch2img_tpu.models.clip_vision import convert_torch_clip_vision

        return strict_convert(
            convert_torch_clip_vision, load_torch_state(path), num_layers,
            ignore=DEFAULT_IGNORE + ("*post_layernorm*",),
            what=f"sketch_encoder_model ({path})")
    from sketch2img_tpu.train.checkpoint import load_params_npz

    return load_params_npz(path)


@functools.lru_cache(maxsize=None)
def _init_latents_fn(h: int, w: int):
    """jit'd per-image initial-noise draws: (B,) int32 seeds ->
    (B, h, w, 4). Image i's noise is a function of seed[i] alone — the
    batch-invariance that lets serving merge unrelated requests. A scalar
    seed at B=1 draws bit-identically to the historical single-image path
    (``normal(PRNGKey(s), (1,h,w,4))`` — same key, same flattened draw
    count)."""
    import jax
    import jax.numpy as jnp

    return jax.jit(jax.vmap(lambda s: jax.random.normal(
        jax.random.PRNGKey(s), (h, w, 4), jnp.float32)))


@functools.lru_cache(maxsize=None)
def _init_latents_one_fn(batch: int, h: int, w: int):
    """Scalar seed -> (batch, h, w, 4): ONE key draws the whole batch with
    DISTINCT per-image noise — the same one-generator surface as the main
    pipeline (runtime._init_one_seed semantics; a replicated per-seed draw
    would give duplicate prompts duplicate images). Bitwise equal to the
    per-image path at batch 1."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda s: jax.random.normal(
        jax.random.PRNGKey(s), (batch, h, w, 4), jnp.float32))


class ClipGuidedPipeline:
    def __init__(self, model_path: str = None, attn_weights: str = None,
                 clip_weights: str = None, *, components=None,
                 clip_config=None, cast_bf16: bool = True, mesh=None):
        """Build from a diffusers dir (``model_path``) or share an
        already-loaded ``SDComponents`` (``components`` — how apps/serve.py
        adds the injection route without loading the SD stack twice).
        ``clip_config``/``cast_bf16`` exist for tiny CPU tests.

        ``mesh`` (optional, a ``parallel.make_mesh()`` mesh with a data
        axis) turns the sampling/decode programs SPMD with the batch
        sharded over ``data`` — the same serving scale-out surface as
        ``SketchGuidedPipeline(mesh=...)``. The injection route shards
        over data ONLY: a model axis > 1 is refused loudly here (the
        injected ``sketch_attn`` modules are replicated and would merge
        a replicated tree into Megatron-sharded base params — an
        unvalidated program; apps/serve.py surfaces this refusal at
        startup when ``--inject_attn_weights`` meets ``--model_parallel``)."""
        import jax
        import jax.numpy as jnp

        from sketch2img_tpu.models.clip_vision import (
            VIT_L14_CONFIG,
            CLIPVisionEncoder,
        )
        from sketch2img_tpu.models.unet import (
            UNet2DCondition,
            num_transformer_blocks,
        )
        from sketch2img_tpu.runtime import SDComponents
        from sketch2img_tpu.train.train_attn_inject import (
            merge_injection_params,
            split_injection_params,
        )

        if components is not None:
            self.c = components
        else:
            self.c = SDComponents.from_diffusers_dir(model_path)
        ccfg = clip_config if clip_config is not None else VIT_L14_CONFIG
        self.n_tokens = (ccfg.image_size // ccfg.patch_size) ** 2 + 1
        self.state_dim = ccfg.hidden_size
        compute_dtype = jnp.bfloat16 if cast_bf16 else self.c.unet.compute_dtype
        inj_config = dataclasses.replace(
            self.c.unet.config, injection="clip",
            injection_context_dim=self.state_dim)
        self.unet = UNet2DCondition(inj_config, compute_dtype=compute_dtype)
        self.n_sites = num_transformer_blocks(inj_config)

        states = [jnp.zeros((1, self.n_tokens, self.state_dim))] * self.n_sites
        init_params = self.unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, inj_config.cross_attention_dim)),
            injection_states=states,
        )["params"]
        _, inj = split_injection_params(init_params)
        if attn_weights:  # sketch_attn_model.(npz|pt) (clip_guided_inf.py:47)
            inj = load_attn_weights(attn_weights, inj_config)
        self.unet_params = merge_injection_params(self.c.unet_params, inj)
        from sketch2img_tpu.utils.params import cast_float_params

        self.clip = CLIPVisionEncoder(config=ccfg, compute_dtype=compute_dtype)
        if clip_weights:  # sketch_encoder_model.(npz|pt) (clip_guided_inf.py:51)
            self.clip_params = load_clip_weights(clip_weights, ccfg.num_layers)
        else:
            self.clip_params = self.clip.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3))
            )["params"]
        if cast_bf16:
            # serving: bf16 weights once (reference loads fp16,
            # clip_guided_inf.py:44)
            self.c.cast_params()
            self.unet_params = cast_float_params(self.unet_params, jnp.bfloat16)
            self.clip_params = cast_float_params(self.clip_params, jnp.bfloat16)
        self.mesh = mesh
        self._dp = 1
        if mesh is not None:
            from sketch2img_tpu.parallel.mesh import (
                DATA_AXIS,
                MODEL_AXIS,
                replicated,
            )

            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                raise ValueError(
                    "the injection route supports data-parallel meshes only: "
                    "a model axis > 1 would merge the replicated sketch_* "
                    "injection params into Megatron-sharded base UNet params "
                    "(untested program). Use model_parallel=1, or serve the "
                    "injection route on its own data mesh.")
            self._dp = mesh.shape[DATA_AXIS]
            rep = replicated(mesh)
            multihost = jax.process_count() > 1

            def put(tree):
                # multihost: route through host values (identical on every
                # process — same deterministic load/init), like
                # runtime.SketchGuidedPipeline._setup_mesh
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        np.asarray(x) if multihost else x, rep), tree)

            # replicate everything this route touches (no-op re-placement
            # for components a meshed SketchGuidedPipeline already put)
            self.unet_params = put(self.unet_params)
            self.clip_params = put(self.clip_params)
            self.c.unet_params = put(self.c.unet_params)
            self.c.vae_params = put(self.c.vae_params)
            self.c.text_params = put(self.c.text_params)
        self._fns = {}
        # text-encode helper built ONCE: it caches the jitted text encoder
        # (rebuilding per call would retrace it every generation)
        from sketch2img_tpu.runtime import SketchGuidedPipeline

        self._helper = SketchGuidedPipeline(self.c)

    def _preprocess_sketch(self, spimg01: np.ndarray) -> np.ndarray:
        """CLIPImageProcessor parity: [0,1] -> resize 224 bicubic -> CLIP
        mean/std normalize (clip_guided_inf.py:100-105). Host-side; one
        (side, side, 3) float32 array per sketch."""
        from PIL import Image

        arr = np.asarray(spimg01, np.float32)
        if arr.ndim == 2:
            arr = np.tile(arr[:, :, None], (1, 1, 3))
        elif arr.shape[-1] == 4:  # sketchpad RGBA -> drop alpha
            arr = arr[..., :3]
        side = self.clip.config.image_size
        img = Image.fromarray((arr * 255).astype(np.uint8)).resize(
            (side, side), Image.BICUBIC
        )
        px = np.asarray(img, np.float32) / 255.0
        return (px - CLIP_MEAN) / CLIP_STD

    def encode_sketch(self, spimg01):
        """Sketch(es) -> ViT last_hidden_state. One array -> (1, S, D); a
        list of per-image sketches -> (B, S, D), encoded in ONE ViT call
        (different capture resolutions are fine — everything resizes to the
        CLIP input size, so merged requests never gate on sketch shape)."""
        import jax.numpy as jnp

        if isinstance(spimg01, (list, tuple)):
            px = np.stack([self._preprocess_sketch(s) for s in spimg01])
        else:
            px = self._preprocess_sketch(spimg01)[None]
        if "clip" not in self._fns:  # jit: one dispatch, not one per ViT op
            import jax

            self._fns["clip"] = jax.jit(
                lambda p, x: self.clip.apply({"params": p}, x))
        return self._fns["clip"](self.clip_params, jnp.asarray(px))

    def _shard_batch(self, x):
        """Shard an array's leading (batch) axis over the mesh's data axis
        (no-op without a mesh); multihost-safe via the helper SHARED with
        runtime.SketchGuidedPipeline (parallel.shard_batch_array) so the
        two serving routes can't drift."""
        if self.mesh is None:
            return x
        from sketch2img_tpu.parallel.mesh import shard_batch_array

        return shard_batch_array(self.mesh, x)

    def __call__(self, prompt, *, negative_prompt="", num_inference_steps=25,
                 guidance_scale=7.5, width=512, height=512, seed=0,
                 strength=0.5, spimg=None) -> np.ndarray:
        """-> (H, W, 3) float image in [0, 1] for a single string prompt,
        else (B, H, W, 3) for a prompt list (serving extension beyond the
        reference's single-image demo, clip_guided_inf.py:78-118).

        ``seed`` may be a list of one seed per image: image i's initial
        noise depends only on seed[i], so batched requests reproduce
        single-image results (the micro-batcher merge contract).
        ``spimg`` is one array (conditioning every image), a list of B
        per-image sketches, or None (plain CFG through the injected UNet —
        zero state, zero scale). ``strength`` is one float or a list of B
        per-image floats (each request keeps its own UI slider).
        """
        import jax
        import jax.numpy as jnp

        from sketch2img_tpu.pipelines.attn_injected import make_attn_injected_fn
        from sketch2img_tpu.pipelines.text2img import latents_to_image
        from sketch2img_tpu.runtime import canon_seed

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch = len(prompts)
        single = isinstance(prompt, str)

        # data-mesh padding: SPMD programs need batch % data-axis == 0.
        # Padding rides the per-image-seed mode (bitwise independent per
        # image), so the first ``batch`` images follow exactly the unpadded
        # trajectories; pad rows are computed and discarded.
        pad = (-batch) % self._dp
        if pad:
            if isinstance(seed, (list, tuple)):
                if len(seed) != batch:
                    raise ValueError(
                        f"got {len(seed)} seeds for a batch of {batch}")
            elif batch == 1:
                seed = [seed]  # scalar seed at B=1 == per-image bitwise
            else:
                raise ValueError(
                    f"batch {batch} doesn't divide the mesh data axis "
                    f"({self._dp}): pass per-image seeds (seed=[...]) so "
                    "padded results stay exact, or use a divisible batch")
            seed = list(seed) + [1] * pad
            if isinstance(spimg, (list, tuple)):
                spimg = list(spimg) + [spimg[-1]] * pad
        batch_p = batch + pad

        if isinstance(seed, (list, tuple)):
            if len(seed) != batch_p:
                raise ValueError(
                    f"got {len(seed)} seeds for a batch of {batch}")
            seeds = [canon_seed(s) if s != 0 else np.random.randint(2**31 - 1)
                     for s in seed]
        else:
            seeds = canon_seed(seed) if seed != 0 else np.random.randint(
                2**31 - 1)  # scalar: one generator, distinct per-image draws
        if isinstance(spimg, (list, tuple)) and len(spimg) != batch_p:
            raise ValueError(
                f"got {len(spimg)} sketches for a batch of {batch}")

        uncond, cond = self._helper.encode_prompt(
            prompts if not single else prompt, negative_prompt)
        if pad:  # pad the CFG pair by repeating the last row
            uncond = jnp.concatenate(
                [uncond, jnp.repeat(uncond[-1:], pad, axis=0)])
            cond = jnp.concatenate(
                [cond, jnp.repeat(cond[-1:], pad, axis=0)])
        ctx_pair = jnp.concatenate([uncond, cond], axis=0)

        f = self.c.vae_scale_factor
        h, w = height // f, width // f
        if isinstance(seeds, list):
            latents0 = _init_latents_fn(h, w)(
                jnp.asarray(np.asarray(seeds, np.int32)))
        else:
            latents0 = _init_latents_one_fn(batch_p, h, w)(np.int32(seeds))

        if spimg is not None:
            hidden = self.encode_sketch(spimg)  # (1 or B_p, S, D)
            if hidden.shape[0] == 1 and batch_p > 1:
                hidden = jnp.broadcast_to(
                    hidden, (batch_p,) + hidden.shape[1:])
            # [zeros; h] over the CFG pair (clip_guided_inf.py:107)
            from sketch2img_tpu.pipelines.attn_injected import (
                cfg_injection_state,
            )

            state = cfg_injection_state(hidden)
            scale = strength  # set_scale(strength), clip_guided_inf.py:108
        else:
            state = jnp.zeros((2 * batch_p, self.n_tokens, self.state_dim))
            scale = 0.0
        # per-image strengths: one float broadcasts; a list rides each
        # request's own slider through the merged program
        if isinstance(scale, (list, tuple)):
            if len(scale) != batch:
                raise ValueError(
                    f"got {len(scale)} strengths for a batch of {batch}")
            scale = np.asarray(list(scale) + [0.0] * pad, np.float32)
        else:
            scale = np.full((batch_p,), scale, np.float32)

        latents0 = self._shard_batch(latents0)
        ctx_pair = self._shard_batch(ctx_pair)
        state = self._shard_batch(state)
        scale = self._shard_batch(jnp.asarray(scale))

        steps = int(num_inference_steps)
        if steps not in self._fns:
            def apply_inj(p, x, t, ctx, s, sc):
                return self.unet.apply({"params": p}, x, t, ctx,
                                       injection_states=s, injection_scale=sc)

            self._fns[steps] = jax.jit(make_attn_injected_fn(
                apply_inj, self.c.schedule, steps, self.n_sites))
        latents = self._fns[steps](self.unet_params, latents0, ctx_pair,
                                   state, scale, guidance_scale)
        if "decode" not in self._fns:  # jit: not one dispatch per VAE op
            self._fns["decode"] = jax.jit(
                functools.partial(latents_to_image, self.c.vae_decode))
        img = self._fns["decode"](self.c.vae_params, latents)
        from sketch2img_tpu.parallel.mesh import fetch_global

        # multihost-safe fetch; drop mesh pad rows
        img = fetch_global(self.mesh, img).astype(np.float32)[:batch]
        return img[0] if single else img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--attn_weights", type=str, default=None)
    parser.add_argument("--clip_weights", type=str, default=None)
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--negative_prompt", type=str, default="")
    parser.add_argument("--sketch", type=str, default=None)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--guidance", type=float, default=7.5)
    parser.add_argument("--strength", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", type=str, default="output.png")
    args = parser.parse_args()

    start = time.time()
    pipe = ClipGuidedPipeline(args.model_path, args.attn_weights, args.clip_weights)
    print(f"pipeline built in {time.time() - start:.2f} seconds")

    spimg = None
    if args.sketch:
        from PIL import Image

        spimg = np.asarray(Image.open(args.sketch).convert("L"), np.float32) / 255.0

    img = pipe(args.prompt, negative_prompt=args.negative_prompt,
               num_inference_steps=args.steps, guidance_scale=args.guidance,
               strength=args.strength, seed=args.seed, spimg=spimg)
    from PIL import Image

    Image.fromarray((img * 255).astype(np.uint8)).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

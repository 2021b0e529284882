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


# -- jit'd per-request prologue ops -----------------------------------------
# Everything a request runs BESIDES the sampling loop (initial-noise RNG,
# sketch-target sampling, VAE encode/decode) used to execute eagerly —
# dozens to hundreds of single-op dispatches per request. Through the axon
# tunnel each eager dispatch is ~ms-scale, so a served 50-step request spent
# several times longer in eager VAE/RNG ops than in the jit'd sampling loop
# itself (tools/bench_serve.py measured 6.9 s/request against 0.93 s of
# device sampling). jit'ing collapses each phase to one dispatch; the draws
# are bit-identical (JAX's counter-based PRNG doesn't change under jit/vmap).


def canon_seed(seed) -> int:
    """Fold an arbitrary int seed into the non-negative int32 key domain.

    The jit'd init paths take int32 seeds; eager ``jax.random.PRNGKey``
    used to accept full uint32/64 seeds, and a raw ``np.int32(2**31)``
    raises OverflowError (ADVICE r3). Masking keeps every historical seed
    accepted and deterministic (seeds equal mod 2**31 collide, which is
    fine for a noise seed)."""
    return int(seed) & 0x7FFFFFFF


@functools.partial(jax.jit, static_argnums=(1, 2))
def _init_per_seed(seeds: jnp.ndarray, h: int, w: int):
    """(B,) int32 seeds -> ((B,h,w,4) f32 initial latents, (B,2) sketch
    keys), one independent PRNGKey->split->normal chain per image — the
    per-image-seed serving contract (image i depends on seed[i] alone)."""

    def one(s):
        k_lat, k_sketch = jax.random.split(jax.random.PRNGKey(s))
        return jax.random.normal(k_lat, (h, w, 4), jnp.float32), k_sketch

    return jax.vmap(one)(seeds)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _init_one_seed(seed, batch: int, h: int, w: int):
    """Scalar seed -> ((batch,h,w,4) f32 initial latents, sketch key) —
    the reference demo's one-generator surface (app.py:110-113)."""
    k_lat, k_sketch = jax.random.split(jax.random.PRNGKey(seed))
    return jax.random.normal(k_lat, (batch, h, w, 4), jnp.float32), k_sketch


@jax.jit
def _noise_per(sketch_keys, mean):
    """(B, 2) keys -> (B, *mean.shape[1:]) unit normals, one per key."""
    return jax.vmap(
        lambda k: jax.random.normal(k, mean.shape[1:], mean.dtype)
    )(sketch_keys)


_sample_latent_jit = jax.jit(sample_latent)


def _sample_target_per(sketch_keys, mean, logvar):
    """Per-image sketch-latent targets: image i's noise comes from its own
    key, so batch composition can't change its result.

    TWO jit dispatches on purpose. Fusing the threefry draw with the
    mean+exp(logvar)*noise math in one jit lets XLA vectorize the fused
    elementwise loop differently per batch size (FMA/tail effects, ~1e-7),
    and the guided vjp loop amplifies that ~5e5x into a visible per-image
    drift — measured bs2-vs-bs1 0.065 in latents, 3e-4 in the image.
    Separately jit'd, both pieces are bitwise batch-invariant (pinned by
    test_per_image_seeds_are_batch_invariant)."""
    noise = _noise_per(sketch_keys, mean)
    return _sample_latent_jit(mean, logvar, noise)


@functools.partial(jax.jit, static_argnums=(3,))
def _sample_target_one(k_sketch, mean, logvar, batch: int):
    """One sketch conditions the whole batch (app.py:104-109)."""
    noise = jax.random.normal(k_sketch, mean.shape, mean.dtype)
    target = sample_latent(mean, logvar, noise)
    return jnp.broadcast_to(target, (batch,) + target.shape[1:])


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


def _load_tokenizer(tok_dir: str):
    """Native CLIP BPE tokenizer from the checkpoint's tokenizer/ assets
    (vocab.json + merges.txt) — id-parity with HF's CLIPTokenizer is pinned
    by tests/test_tokenizer.py; serving needs no transformers install."""
    from sketch2img_tpu.data.tokenizer import CLIPBPETokenizer

    return CLIPBPETokenizer.from_pretrained(tok_dir)


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
    safety_run: Any = None     # jit-able (params, images01) -> (images, flags)
    safety_params: Any = None
    _unet_remat: Optional[UNet2DCondition] = None  # lazy (see unet_remat)

    @classmethod
    def from_diffusers_dir(
        cls,
        model_path: str,
        *,
        compute_dtype=jnp.bfloat16,
        unet_config: UNetConfig = SD15_CONFIG,
        vae_config=SD15_VAE_CONFIG,
        text_config=SD15_TEXT_CONFIG,
        safety_checker: bool = True,
        strict: bool = True,
    ) -> "SDComponents":
        """Load a diffusers-format SD1.x model directory (the reference's
        ``StableDiffusionPipeline.from_pretrained(config.model_path)``,
        trainer.py:102). Accepts .safetensors or torch .bin weights.

        ``safety_checker=True`` (default, reference parity: the stock
        pipeline runs one per generation, modules/pipeline.py:121) loads
        ``<model_path>/safety_checker`` when present; pass False to skip.

        ``strict=True`` (default) requires each converter to consume every
        checkpoint key and errors on missing/unknown keys (the committed
        key inventories live in assets/manifests/); ``strict=False`` loads
        whatever matches."""
        from sketch2img_tpu.core.manifest import strict_convert

        def _convert(fn, sd, what, *a, **kw):
            if strict:
                return strict_convert(fn, sd, *a, what=what, **kw)
            return fn(sd, *a, **kw)

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
            tokenizer = _load_tokenizer(tok_dir)

        c = cls(
            unet=UNet2DCondition(unet_config, compute_dtype=compute_dtype),
            vae=AutoencoderKL(vae_config, compute_dtype=compute_dtype),
            text_encoder=CLIPTextEncoder(text_config, compute_dtype=compute_dtype),
            unet_params=_convert(convert_torch_unet, unet_sd, "unet",
                                 unet_config),
            vae_params=_convert(convert_torch_vae, vae_sd, "vae", vae_config),
            text_params=_convert(convert_torch_clip_text, text_sd,
                                 "text_encoder",
                                 num_layers=text_config.num_layers),
            schedule=make_schedule(),
            tokenizer=tokenizer,
        )
        if safety_checker and os.path.isdir(os.path.join(model_path, "safety_checker")):
            c.load_safety_checker(
                os.path.join(model_path, "safety_checker"),
                compute_dtype=compute_dtype,
                strict=strict,
            )
        return c

    def load_safety_checker(self, path: str, *, compute_dtype=jnp.bfloat16,
                            vision_config=None, strict: bool = True) -> None:
        """Load the diffusers ``safety_checker/`` weights (dir or file) and
        enable per-generation NSFW checking (modules/pipeline.py:121).
        ``vision_config`` defaults to the shipped checker's ViT-L/14 tower."""
        from sketch2img_tpu.models.clip_vision import VIT_L14_CONFIG
        from sketch2img_tpu.models.safety_checker import (
            convert_torch_safety_checker,
            make_safety_checker,
        )

        cfg = vision_config or VIT_L14_CONFIG
        base = (os.path.join(path, "model") if os.path.isdir(path) else path)
        if os.path.isdir(path) and not (
            os.path.exists(base + ".safetensors") or os.path.exists(base + ".bin")
        ):
            base = os.path.join(path, "pytorch_model")
        sd = _load_state_dict(base)
        if strict:
            from sketch2img_tpu.core.manifest import strict_convert

            self.safety_params = strict_convert(
                convert_torch_safety_checker, sd, what="safety_checker",
                num_layers=cfg.num_layers,
            )
        else:
            self.safety_params = convert_torch_safety_checker(
                sd, num_layers=cfg.num_layers
            )
        _, self.safety_run = make_safety_checker(cfg, compute_dtype=compute_dtype)

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

    def load_lgp_torch(self, path: str, compute_dtype=jnp.float32,
                       strict: bool = True) -> None:
        """Load the published ``edge_predictor.pt`` (app.py:67-68,
        README.md:20) into the Flax LGP. ``strict`` (default) errors on
        missing/unknown keys (assets/manifests/edge_predictor.json)."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if strict:
            from sketch2img_tpu.core.manifest import strict_convert

            params, stats = strict_convert(convert_torch_lgp, sd,
                                           what="edge_predictor")
        else:
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

    def cast_params(self, dtype=jnp.bfloat16, *, lgp: bool = False) -> "SDComponents":
        """Cast float params to ``dtype`` ONCE — the serving-mode analog of
        the reference demos loading fp16 weights (app.py:29-43 ``.half()``/
        ``revision="fp16"``). Without it every in-module ``astype(bf16)``
        re-converts fp32 weights per forward (~1.8 ms/UNet-fwd of pure
        ``convert_element_type`` HBM traffic in a profiler trace).

        The LGP stays fp32 by default (its compute dtype is fp32 for
        edge-parity with ``edge_predictor.pt``). Training code never calls
        this — fp32 master params stay the optimizer's business."""
        from sketch2img_tpu.utils.params import cast_float_params

        self.unet_params = cast_float_params(self.unet_params, dtype)
        self.vae_params = cast_float_params(self.vae_params, dtype)
        self.text_params = cast_float_params(self.text_params, dtype)
        if self.safety_params is not None:
            self.safety_params = cast_float_params(self.safety_params, dtype)
        if lgp and self.lgp_vars is not None:
            self.lgp_vars = cast_float_params(self.lgp_vars, dtype)
        return self

    @property
    def vae_scale_factor(self) -> int:
        """Pixel-to-latent downscale (8 for SD1.x)."""
        return 2 ** (len(self.vae.config.block_out_channels) - 1)

    # ---- functional apply handles (pipeline building blocks) ----

    def unet_apply(self, p, x, t, ctx):
        return self.unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(self, p, x, t, ctx):
        return self.unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    @property
    def unet_remat(self) -> UNet2DCondition:
        """Rematerialized twin of ``unet`` — same params tree (nn.remat
        changes only the backward's memory/compute trade), built lazily
        for requests core.memory.choose_remat flags as too big to fit
        without it."""
        if self._unet_remat is None:
            cfg = dataclasses.replace(self.unet.config, remat=True)
            self._unet_remat = UNet2DCondition(
                cfg, compute_dtype=self.unet.compute_dtype)
        return self._unet_remat

    def unet_apply_r(self, p, x, t, ctx):
        return self.unet_remat.apply({"params": p}, x, t, ctx)

    def unet_apply_taps_r(self, p, x, t, ctx):
        return self.unet_remat.apply({"params": p}, x, t, ctx,
                                     capture_taps=True)

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
    (app.py:84-123) and the stock pipeline's batching surface
    (modules/pipeline.py:29-35,47,64-74): prompt or prompt list,
    ``num_images_per_prompt``, ``eta``, ``callback``/``callback_steps``.

    ``mesh`` (optional, a ``parallel.make_mesh()`` (data, model) mesh)
    turns every program SPMD: the batch shards over ``data`` (non-divisible
    batches are padded in the exact per-image-seed mode and the pad rows
    dropped), UNet attention shards Megatron-style over ``model`` when
    that axis is >1. Single-chip behavior is the default (mesh=None) and
    is unchanged."""

    def __init__(self, components: SDComponents, mesh=None):
        from sketch2img_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()  # warm restarts replay the 3-5 min loop compiles
        self.c = components
        self._fns: Dict[Tuple, Any] = {}
        # per-__call__ user progress hook; read through a trampoline so the
        # traced program is independent of the hook's identity (no retrace
        # when the user passes a different function next call).
        self._user_callback = None
        self._cb_batch = None  # slice callback latents past mesh padding
        self.last_nsfw_flags = None
        self.last_remat = None  # remat picked by the last guided call
        self.mesh = mesh
        self._dp = 1
        if mesh is not None:
            self._setup_mesh(mesh)

    def _setup_mesh(self, mesh) -> None:
        """Distributed serving over a (data, model) ``jax.sharding.Mesh`` —
        the TPU-native growth path past one chip (the reference serves on
        exactly one GPU; SURVEY §2.3/§7). Parameters are placed once: UNet
        attention projections Megatron-sharded over ``model`` when that
        axis is >1 (parallel/tp.py — GSPMD inserts the single psum per
        attention), everything else replicated. ``__call__`` then shards
        the batch over ``data`` (padding non-divisible batches in the
        exact per-image-seed mode) and XLA compiles every pipeline program
        SPMD. The Pallas flash kernels — custom calls without a GSPMD
        partitioning rule — run on each shard's local heads through the
        TP context (ops/attention.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sketch2img_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        self._dp = mesh.shape[DATA_AXIS]
        tp = mesh.shape.get(MODEL_AXIS, 1)
        rep = NamedSharding(mesh, P())

        multihost = jax.process_count() > 1

        def put(tree):
            # multihost: route through host values (identical on every
            # process — same deterministic load/init) so device_put to the
            # process-spanning replicated sharding is unambiguous
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    np.asarray(x) if multihost else x, rep), tree)

        c = self.c
        if tp > 1:
            from sketch2img_tpu.ops.attention import (
                set_tensor_parallel_context,
            )
            from sketch2img_tpu.parallel.tp import shard_params_tp

            c.unet_params = shard_params_tp(mesh, c.unet_params)
            set_tensor_parallel_context(mesh)
        else:
            c.unet_params = put(c.unet_params)
        c.vae_params = put(c.vae_params)
        c.text_params = put(c.text_params)
        if c.lgp_vars is not None:
            c.lgp_vars = put(c.lgp_vars)
        if c.safety_params is not None:
            c.safety_params = put(c.safety_params)

    def _shard_batch(self, x):
        """Shard an array's leading (batch) axis over the mesh's data axis
        (no-op without a mesh); multihost-safe (parallel.shard_batch_array
        — shared with the injection route so the contract can't drift)."""
        if self.mesh is None:
            return x
        from sketch2img_tpu.parallel.mesh import shard_batch_array

        return shard_batch_array(self.mesh, x)

    def _fetch(self, x) -> np.ndarray:
        """Device -> host fetch, allgathered when the mesh spans processes
        (parallel.fetch_global)."""
        from sketch2img_tpu.parallel.mesh import fetch_global

        return fetch_global(self.mesh, x)

    def _trampoline_callback(self, i: int, t: int, latents: np.ndarray) -> None:
        if self._user_callback is not None:
            if self._cb_batch is not None:  # hide mesh-padding rows
                latents = latents[:self._cb_batch]
            self._user_callback(i, t, latents)

    # -- text encoding (pipeline.py:55-57: CFG pair, 77-token padded) --

    def _text_fn(self):
        if "text" not in self._fns:
            self._fns["text"] = jax.jit(self.c.text_apply)
        return self._fns["text"]

    def encode_prompt(
        self,
        prompt,
        negative_prompt="",
        num_images_per_prompt: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (uncond, cond), each (P*num_images, 77, 768). ``prompt`` /
        ``negative_prompt`` may be a string or list of strings; embeddings
        are repeat_interleaved per prompt (pipeline.py:64-74)."""
        tok = self.c.tokenizer
        assert tok is not None, "tokenizer not loaded"
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negs = (
            [negative_prompt] * len(prompts)
            if isinstance(negative_prompt, str)
            else list(negative_prompt)
        )
        if len(negs) != len(prompts):
            raise ValueError(
                f"got {len(prompts)} prompts but {len(negs)} negative prompts"
            )

        def ids(texts):
            return np.asarray(
                tok(texts, padding="max_length", truncation=True, max_length=77).input_ids,
                np.int32,
            )

        text_fn = self._text_fn()
        cond = text_fn(self.c.text_params, jnp.asarray(ids(prompts)))
        uncond = text_fn(self.c.text_params, jnp.asarray(ids(negs)))
        if num_images_per_prompt != 1:
            cond = jnp.repeat(cond, num_images_per_prompt, axis=0)
            uncond = jnp.repeat(uncond, num_images_per_prompt, axis=0)
        return uncond, cond

    @staticmethod
    def _norm_sketch(sketch01: np.ndarray) -> np.ndarray:
        """One sketchpad [0,1] -> (H,W,3) in [-1,1] (app.py:106-109:
        normalize, tile grayscale to 3ch). Accepts (H,W) or (H,W,1)
        grayscale — tiled like the reference — or already-RGB (H,W,3)."""
        arr = np.asarray(sketch01, np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[-1] == 1:
            arr = np.tile(arr, (1, 1, 3))
        elif arr.shape[-1] != 3:
            raise ValueError(
                f"sketch_image must be (H,W), (H,W,1) or (H,W,3); got {arr.shape}"
            )
        return (arr - 0.5) / 0.5

    def _sketch_moments(self, sketch01):
        """Sketchpad(s) [0,1] -> VAE (mean, logvar) moments. ``sketch01``
        may be one array (leading dim 1 out — one sketch conditions the
        whole batch, the reference demo surface app.py:104-109) or a list
        of per-image sketches (serving extension: leading dim = len(list);
        all must share one resolution — one XLA program per size)."""
        if isinstance(sketch01, (list, tuple)):
            arrs = [self._norm_sketch(s) for s in sketch01]
            shapes = {a.shape for a in arrs}
            if len(shapes) != 1:
                raise ValueError(
                    f"per-image sketches must share one resolution, got {shapes}"
                )
            arr = np.stack(arrs)
        else:
            arr = self._norm_sketch(sketch01)[None]
        if "moments" not in self._fns:  # jit: one dispatch, not one per op
            self._fns["moments"] = jax.jit(self.c.vae_encode_moments)
        return self._fns["moments"](self.c.vae_params, jnp.asarray(arr))

    def encode_sketch(self, sketch01: np.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Sketchpad [0,1] -> sampled VAE latent target x0.18215."""
        mean, logvar = self._sketch_moments(sketch01)
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        return sample_latent(mean, logvar, noise)

    def _lgp_fused(self):
        from sketch2img_tpu.models.lgp import lgp_fused_apply

        def lgp_fused(v, taps, nl, hh, ww):
            return lgp_fused_apply(
                v, taps, nl, hh, ww,
                compute_dtype=self.c.lgp.compute_dtype,
            )

        return lgp_fused

    def _get_fn(self, kind: str, steps: int, callback_steps: Optional[int] = None,
                solver: str = "dpm++", remat: bool = False):
        if callback_steps is not None:
            # progress callbacks are HOST-driven (segmented range programs):
            # the axon TPU backend has no in-jit host callbacks
            # (UNIMPLEMENTED: host send/recv), and the range programs take
            # traced bounds so every cadence shares the same compiles
            return self._get_callback_runner(kind, steps, callback_steps,
                                             solver, remat)
        key = (kind, steps, None, solver, remat)
        if key not in self._fns:
            if kind == "sketch":
                unet_fwd = self.c.unet_apply_r if remat else self.c.unet_apply
                unet_taps = (self.c.unet_apply_taps_r if remat
                             else self.c.unet_apply_taps)
                fn = make_sketch_guided_fn(
                    unet_fwd, unet_taps, self.c.lgp_apply,
                    self.c.schedule, steps, lgp_apply_fused=self._lgp_fused(),
                    solver=solver,
                )
            else:
                fn = make_text2img_fn(self.c.unet_apply, self.c.schedule, steps,
                                      solver=solver)
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _get_callback_runner(self, kind: str, steps: int, cb_steps: int,
                             solver: str, remat: bool):
        """Sampling with the reference's ``callback(i, t, latents)`` hook
        (modules/pipeline.py:34-35,113), driven from the host: the loop is
        dispatched as range programs (traced [start, stop) bounds — ONE
        compile per phase regardless of cadence) and the callback fires
        between dispatches with that step's fetched latents. Exactly the
        monolithic trajectory (same loop bodies; pinned by tests), works on
        backends without host-callback support (the axon TPU)."""
        from sketch2img_tpu.core.schedulers import make_sampler_step
        from sketch2img_tpu.pipelines.text2img import (
            make_text2img_range_fn,
            segment_plan,
        )

        ts = [int(t) for t in make_sampler_step(
            solver, self.c.schedule, steps)[0]]
        trampoline = self._trampoline_callback

        if kind == "sketch":
            from sketch2img_tpu.pipelines.sketch_guided import (
                make_sketch_guided_range_fns,
                num_guided_steps,
            )

            n_guided = num_guided_steps(steps)
            rkey = ("sketch_range", steps, solver, remat)
            if rkey not in self._fns:
                unet_fwd = self.c.unet_apply_r if remat else self.c.unet_apply
                unet_taps = (self.c.unet_apply_taps_r if remat
                             else self.c.unet_apply_taps)
                g, p = make_sketch_guided_range_fns(
                    unet_fwd, unet_taps, self.c.lgp_apply, self.c.schedule,
                    steps, solver=solver, lgp_apply_fused=self._lgp_fused())
                self._fns[rkey] = (jax.jit(g), jax.jit(p))
            gfn, pfn = self._fns[rkey]
            plan = segment_plan(steps, cb_steps, n_guided)

            def run(up, lv, lat0, ctx_u, ctx_c, target, gs):
                x, x0 = lat0, jnp.zeros_like(lat0)
                for a, b in plan:
                    if a < n_guided:
                        x, x0 = gfn(up, lv, x, x0, lat0, ctx_u, ctx_c,
                                    target, gs, a, b)
                    else:
                        x, x0 = pfn(up, x, x0, lat0, ctx_u, ctx_c, gs, a, b)
                    if (b - 1) % cb_steps == 0:
                        trampoline(b - 1, ts[b - 1], self._fetch(x))
                return x

            return run

        rkey = ("text_range", steps, solver)
        if rkey not in self._fns:
            self._fns[rkey] = jax.jit(make_text2img_range_fn(
                self.c.unet_apply, self.c.schedule, steps, solver=solver))
        rfn = self._fns[rkey]
        plan = segment_plan(steps, cb_steps)

        def run(up, lat0, ctx_pair, gs):
            x, x0 = lat0, jnp.zeros_like(lat0)
            for a, b in plan:
                x, x0 = rfn(up, x, x0, ctx_pair, gs, a, b)
                if (b - 1) % cb_steps == 0:
                    trampoline(b - 1, ts[b - 1], self._fetch(x))
            return x

        return run

    def __call__(
        self,
        prompt,
        *,
        negative_prompt="",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        width: int = 512,
        height: int = 512,
        seed: int = 0,
        sketch_image: Optional[np.ndarray] = None,
        num_images_per_prompt: int = 1,
        eta: float = 0.0,
        solver: str = "dpm++",
        callback=None,
        callback_steps: int = 1,
        remat: Optional[bool] = None,
    ) -> np.ndarray:
        """-> (H, W, 3) float image in [0, 1] for a single string prompt with
        ``num_images_per_prompt == 1``; otherwise (B, H, W, 3) with
        B = len(prompts) * num_images_per_prompt (pipeline.py:47,64-74).

        ``eta`` is accepted for reference-API parity (pipeline.py:29) and is
        unused: the solver is DPM-Solver++ 2M, whose step takes no eta — the
        reference's ``prepare_extra_step_kwargs`` likewise drops eta for any
        scheduler whose step doesn't accept it.

        ``callback(i, t, latents)`` fires every ``callback_steps`` solver
        steps with the host-fetched (B, h, w, 4) latents (pipeline.py:34-35).
        ``sketch_image`` is either one array — conditioning the whole batch,
        the reference demo surface (single sketchpad, app.py:104-109) — or a
        list of B arrays, one per batch image (serving extension: lets the
        micro-batcher merge requests with different sketches; the pipeline
        fn always took per-image (B,h,w,4) targets).

        ``solver`` selects the sampler: "dpm++" (DPM-Solver++ 2M, the
        reference demo's choice, app.py:14-25) or "ddim" (deterministic
        eta=0 DDIM).

        ``seed`` may be a list of one seed per batch image (serving
        extension): image i's initial noise is a function of seed[i] alone,
        so ``pipe(ps, seed=[a, b])[0] == pipe(ps[:1], seed=[a])[0]`` —
        batch composition doesn't change per-image results.

        ``remat=None`` (default) picks UNet rematerialization for the
        guided backward automatically from the HBM estimate in
        ``core.memory.choose_remat`` — big (batch, H, W) guided requests
        trade ~15% step time for fitting in HBM instead of OOMing (the
        reference OOMs on CUDA past the card size, app.py:188-193). Pass
        True/False to force. Same final image either way (remat changes
        only where activations are recomputed; pinned by tests).
        """
        del eta  # parity-only (see docstring)
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch = len(prompts) * num_images_per_prompt
        single = isinstance(prompt, str) and num_images_per_prompt == 1

        # data-mesh padding: the SPMD programs need batch % data-axis == 0.
        # Padding rides the per-image-seed mode, whose RNG draws are bitwise
        # independent of batch composition (pinned by tests), so the first
        # ``batch`` images follow exactly the unpadded trajectories (up to
        # XLA program-rounding drift, tests/test_parallel_pipeline.py);
        # pad rows are computed and discarded.
        pad = (-batch) % self._dp
        if pad:
            if isinstance(seed, (list, tuple)):
                if len(seed) != batch:
                    raise ValueError(
                        f"got {len(seed)} seeds for a batch of {batch}")
            elif batch == 1:
                # scalar seed at B=1 equals the per-image path bitwise:
                # same PRNGKey split, same flattened draw counts
                seed = [seed]
            else:
                raise ValueError(
                    f"batch {batch} doesn't divide the mesh data axis "
                    f"({self._dp}): pass per-image seeds (seed=[...]) so "
                    "padded results stay exact, or use a divisible batch")
            seed = list(seed) + [1] * pad
            if isinstance(sketch_image, (list, tuple)):
                if len(sketch_image) != batch:
                    raise ValueError(
                        f"got {len(sketch_image)} sketches for a batch of "
                        f"{batch}")
                sketch_image = list(sketch_image) + [sketch_image[-1]] * pad
        batch_p = batch + pad

        f = self.c.vae_scale_factor
        h, w = height // f, width // f
        if isinstance(seed, (list, tuple)):
            # per-image seeds (serving extension beyond the reference's one
            # generator): each image's initial noise depends only on its own
            # seed, so batched requests reproduce single-image results
            if len(seed) != batch_p:
                raise ValueError(
                    f"got {len(seed)} seeds for a batch of {batch}")
            seeds = np.asarray(
                [canon_seed(s) if s != 0 else np.random.randint(2**31 - 1)
                 for s in seed], np.int32)
            latents0, sketch_keys = _init_per_seed(jnp.asarray(seeds), h, w)
            k_sketch = None  # per-image sketch sampling below
        else:
            latents0, k_sketch = _init_one_seed(
                np.int32(canon_seed(seed) if seed != 0
                         else np.random.randint(2**31 - 1)),
                batch_p, h, w)
            sketch_keys = None
        uncond, cond = self.encode_prompt(
            prompt, negative_prompt, num_images_per_prompt
        )
        if pad:  # pad the CFG pair by repeating the last row
            uncond = jnp.concatenate(
                [uncond, jnp.repeat(uncond[-1:], pad, axis=0)])
            cond = jnp.concatenate(
                [cond, jnp.repeat(cond[-1:], pad, axis=0)])
        latents0 = self._shard_batch(latents0)
        uncond = self._shard_batch(uncond)
        cond = self._shard_batch(cond)

        self._user_callback = callback
        self._cb_batch = batch if pad else None
        cb_key = callback_steps if callback is not None else None
        try:
            if sketch_image is not None:
                if (isinstance(sketch_image, (list, tuple))
                        and len(sketch_image) != batch_p):
                    raise ValueError(
                        f"got {len(sketch_image)} sketches for a batch of "
                        f"{batch}")
                if sketch_keys is not None:
                    # per-image seeds: sample each image's sketch-latent
                    # target from its own key so the result depends only on
                    # (seed[i], sketch[i]) — the batch invariance that lets
                    # serving merge unrelated requests
                    mean, logvar = self._sketch_moments(sketch_image)
                    target = _sample_target_per(sketch_keys, mean, logvar)
                else:
                    mean, logvar = self._sketch_moments(sketch_image)
                    target = _sample_target_one(k_sketch, mean, logvar,
                                                batch_p)
                target = self._shard_batch(target)
                if remat is None:
                    from sketch2img_tpu.core.memory import choose_remat

                    # HBM pressure is per device: the data axis splits the
                    # batch evenly across chips
                    remat = choose_remat(batch_p // self._dp, height, width)
                self.last_remat = bool(remat)  # observable: which variant ran
                fn = self._get_fn("sketch", num_inference_steps, cb_key,
                                  solver, remat=bool(remat))
                latents = fn(self.c.unet_params, self.c.lgp_vars, latents0,
                             uncond, cond, target, guidance_scale)
            else:
                fn = self._get_fn("text", num_inference_steps, cb_key, solver)
                latents = fn(self.c.unet_params, latents0,
                             jnp.concatenate([uncond, cond], axis=0), guidance_scale)
        finally:
            # callbacks are host-driven (synchronous with the segment
            # dispatches — _get_callback_runner), so all events have fired
            # by the time the sampling call returns
            self._user_callback = None
            self._cb_batch = None

        if "decode" not in self._fns:  # jit: the full VAE decoder used to
            # run EAGERLY here — hundreds of per-op dispatches per request
            self._fns["decode"] = jax.jit(
                functools.partial(latents_to_image, self.c.vae_decode))
        img = self._fns["decode"](self.c.vae_params, latents)
        if self.c.safety_run is not None:
            # reference parity: checker runs on every generation
            # (modules/pipeline.py:121); flagged images are blacked out
            if "safety" not in self._fns:
                self._fns["safety"] = jax.jit(self.c.safety_run)
            img, flags = self._fns["safety"](self.c.safety_params, img)
            self.last_nsfw_flags = self._fetch(flags)[:batch]  # drop mesh pad
            if self.last_nsfw_flags.any():
                print("Potential NSFW content was detected in one or more "
                      "images. A black image will be returned instead.")
        img = self._fetch(img).astype(np.float32)[:batch]  # drop mesh pad
        return img[0] if single else img

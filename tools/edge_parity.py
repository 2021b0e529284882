"""Edge-parity harness — the north-star pixel-level check (BASELINE.md,
reference README.md:20 published LGP weights; /root/reference/evaluation.py:88-106).

Runs the evaluation fixture RNG-free (VAE posterior mean + an explicit
noise tensor derived from a seeded numpy RandomState, replayable through
the reference's torch code) and compares the binarized edge map against a
committed reference artifact. The moment real SD1.5 + edge_predictor.pt
weights are available, parity is one command:

  # 1. produce ours + the canonical noise
  python tools/edge_parity.py run --model_path /path/sd15 \
      --weights edge_predictor.pt --input photo.png \
      --output ours.png --save_noise noise.npy

  # 2. replay through the reference with the same noise (see --help notes),
  #    producing ref.png; then
  python tools/edge_parity.py compare ours.png ref.png

  # or pin ours against a committed digest once recorded:
  python tools/edge_parity.py run ... --expect tools/edge_parity_ref.json
  python tools/edge_parity.py run ... --record tools/edge_parity_ref.json

compare prints pixel agreement + edge IoU and exits nonzero below
--min_agreement (default 0.995 — binarization at 0.5 absorbs small
numeric drift between frameworks; identical math gives 1.0).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys

import numpy as np


def _digest(edge_u8: np.ndarray) -> dict:
    binary = (edge_u8 > 0).astype(np.uint8)
    return {
        "sha256": hashlib.sha256(edge_u8.tobytes()).hexdigest(),
        "shape": list(edge_u8.shape),
        "edge_fraction": round(float(binary.mean()), 6),
        "mean_intensity": round(float(edge_u8.mean()), 4),
    }


def _load_edge_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.uint8)


def cmd_run(args) -> int:
    from PIL import Image

    from sketch2img_tpu.apps.evaluation import evaluate
    from sketch2img_tpu.runtime import SDComponents

    c = SDComponents.from_diffusers_dir(args.model_path)
    c.load_lgp_torch(args.weights)

    img = Image.open(args.input).convert("RGB")
    w, h = img.size
    scale = 512 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
    w, h = img.size
    w, h = (w // 64) * 64, (h // 64) * 64
    img = img.crop((0, 0, w, h))
    arr = np.asarray(img, np.float32) / 255.0

    # canonical noise: seeded numpy, independent of any framework RNG, so a
    # torch-side replay (torch.from_numpy(np.load(...))) is bit-identical
    noise = np.random.RandomState(args.seed).standard_normal(
        (1, h // 8, w // 8, 4)
    ).astype(np.float32)
    if args.save_noise:
        np.save(args.save_noise, noise)
        print(f"wrote {args.save_noise} (NHWC; transpose to NCHW for torch)")

    out = evaluate(c, args.prompt, args.negative_prompt, arr, args.timestep,
                   noise=noise, deterministic_latent=True)
    Image.fromarray(out).convert("L").save(args.output)
    d = _digest(np.asarray(Image.open(args.output).convert("L"), np.uint8))
    print(json.dumps(d))

    if args.record:
        with open(args.record, "w") as f:
            json.dump(d, f, indent=1)
        print(f"recorded reference digest -> {args.record}")
    if args.expect:
        with open(args.expect) as f:
            want = json.load(f)
        if want.get("sha256") == d["sha256"]:
            print("PARITY: exact digest match")
            return 0
        print(f"DIGEST MISMATCH: got {d['sha256'][:16]}..., "
              f"want {want.get('sha256', '?')[:16]}... "
              f"(edge_fraction {d['edge_fraction']} vs "
              f"{want.get('edge_fraction')})")
        return 1
    return 0


def cmd_compare(args) -> int:
    a = _load_edge_png(args.ours)
    b = _load_edge_png(args.reference)
    if a.shape != b.shape:
        print(f"SHAPE MISMATCH: {a.shape} vs {b.shape}")
        return 1
    ba, bb = a > 0, b > 0
    agreement = float((ba == bb).mean())
    inter, union = float((ba & bb).sum()), float((ba | bb).sum())
    iou = inter / union if union else 1.0
    print(json.dumps({"pixel_agreement": round(agreement, 6),
                      "edge_iou": round(iou, 6),
                      "ours_edge_fraction": round(float(ba.mean()), 6),
                      "ref_edge_fraction": round(float(bb.mean()), 6)}))
    if agreement < args.min_agreement:
        print(f"FAIL: agreement {agreement:.4f} < {args.min_agreement}")
        return 1
    print("PARITY: PASS")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the fixture RNG-free and digest it")
    r.add_argument("--model_path", required=True)
    r.add_argument("--weights", default="edge_predictor.pt")
    r.add_argument("--input", required=True)
    r.add_argument("--output", default="ours.png")
    r.add_argument("--prompt", default="1girl, masterpiece")
    r.add_argument("--negative_prompt",
                   default="bad quality, worst quality, low quality")
    r.add_argument("--timestep", type=int, default=100)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--save_noise", default=None)
    r.add_argument("--record", default=None,
                   help="write the digest JSON to this path")
    r.add_argument("--expect", default=None,
                   help="compare against a committed digest JSON")

    c = sub.add_parser("compare", help="compare two edge PNGs")
    c.add_argument("ours")
    c.add_argument("reference")
    c.add_argument("--min_agreement", type=float, default=0.995)

    args = p.parse_args()
    return cmd_run(args) if args.cmd == "run" else cmd_compare(args)


if __name__ == "__main__":
    sys.exit(main())

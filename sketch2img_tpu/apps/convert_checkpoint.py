"""One-time checkpoint conversion CLI: diffusers-format torch model dir
(+ optional edge_predictor.pt / netG.pth) -> native npz directory that loads
without torch (runtime.SDComponents.from_native)."""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True,
                        help="diffusers-format SD1.x dir")
    parser.add_argument("--lgp_weights", type=str, default=None,
                        help="edge_predictor.pt (optional)")
    parser.add_argument("--netg", type=str, default=None,
                        help="anime2sketch netG.pth (optional)")
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()

    from sketch2img_tpu.runtime import SDComponents
    from sketch2img_tpu.train.checkpoint import export_params_npz

    c = SDComponents.from_diffusers_dir(args.model_path)
    if args.lgp_weights:
        c.load_lgp_torch(args.lgp_weights)
    c.save_native(args.output)

    if args.netg:
        from sketch2img_tpu.models.anime2sketch import load_torch_anime2sketch

        export_params_npz(os.path.join(args.output, "anime2sketch.npz"),
                          load_torch_anime2sketch(args.netg))

    print(f"wrote native checkpoint to {args.output}")


if __name__ == "__main__":
    main()

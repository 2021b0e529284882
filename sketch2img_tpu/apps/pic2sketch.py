"""anime2sketch standalone CLI — parity port of
/root/reference/anime2sketch/generate.py (pic2sketch: load netG.pth, resize
to load_size, GAN, invert + binarize at 0.5, resize back, save)."""

from __future__ import annotations

import argparse

import numpy as np


def pic2sketch(gan_apply, gan_params, image, load_size: int = 768):
    """image: PIL.Image -> PIL.Image sketch (generate.py:7-15)."""
    import jax.numpy as jnp
    from PIL import Image

    from sketch2img_tpu.models.anime2sketch import binarize_sketch

    aus_resize = image.size
    img = image.convert("RGB").resize((load_size, load_size), Image.BICUBIC)
    arr = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    raw = gan_apply(gan_params, jnp.asarray(arr)[None])
    out = np.asarray(binarize_sketch(raw))[0, :, :, 0]
    out3 = np.tile(out[:, :, None], (1, 1, 3))
    pil = Image.fromarray((out3 * 255).astype(np.uint8))
    return pil.resize(aus_resize, Image.LANCZOS)


def main():
    from PIL import Image

    from sketch2img_tpu.models.anime2sketch import (
        create_anime2sketch,
        load_torch_anime2sketch,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default="weights/netG.pth")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="output.png")
    parser.add_argument("--load_size", type=int, default=512)
    args = parser.parse_args()

    params = load_torch_anime2sketch(args.weights)
    gan = create_anime2sketch()

    import jax

    gan_apply = jax.jit(lambda p, x: gan.apply({"params": p}, x))
    img = pic2sketch(gan_apply, params, Image.open(args.input), args.load_size)
    img.save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

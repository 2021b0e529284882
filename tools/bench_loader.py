"""Host data-path throughput: can data/loader.py feed the train step?

The cached-latent LGP train step runs at ~139.9 img/s/chip (28.6 ms/step,
README) and the uncached one at ~20.2 img/s/chip — device-side numbers.
This bench measures what the HOST side (ImageStore: PIL decode, tag
processing, resize/crop, tokenize, collate; Loader: shuffle + background
prefetch) actually sustains from a synthetic on-disk dataset, for both
paths (VERDICT r2 item 9; reference data path: trainer.py:124-131).

  python tools/bench_loader.py [--n 512] [--size 512] [--batch 4]

Emits one JSON line per path:
  {"metric": "loader_uncached_images_per_sec", "value": ..., and
   "feeds_train_step": value >= the device rate}

Tokenization uses a deterministic stub by default (the env ships no CLIP
vocab assets); pass --tokenizer_dir with vocab.json+merges.txt to include
real BPE cost (data/tokenizer.py).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

# device-side train-step rates to beat (README perf table, v5e chip)
DEVICE_RATE_UNCACHED = 20.2
DEVICE_RATE_CACHED = 139.9

_TAGS = ("1girl solo long_hair looking_at_viewer smile short_hair bangs "
         "blue_eyes skirt blonde_hair brown_hair black_hair hair_ornament "
         "red_eyes hat dress bow ribbon holding animal_ears jewelry").split()


class _StubTokenizer:
    """Whitespace-hash ids — stands in for CLIP BPE when no vocab assets
    exist; cost-wise negligible (noted in the output)."""

    pad_token_id = 0

    def __call__(self, text, padding="do_not_pad", truncation=True,
                 max_length=225):
        ids = [hash(w) % 49000 + 1 for w in text.split()][: max_length]

        class R:
            input_ids = ids

        return R()


def make_dataset(root: str, n: int, size: int, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        # structured noise compresses like a real photo (pure noise JPEGs
        # decode unrealistically slowly)
        base = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
        img = Image.fromarray(base, "RGB").resize((size, size),
                                                  Image.BILINEAR)
        img.save(os.path.join(root, f"img_{i:05d}.jpg"), quality=90)
        tags = ", ".join(rng.choice(_TAGS, size=12, replace=False))
        with open(os.path.join(root, f"img_{i:05d}.txt"), "w") as f:
            f.write(tags)


def bench_epochs(loader, epochs: int = 2):
    """Time the LAST epoch (first epoch warms page cache)."""
    n_images = 0
    for _ in range(epochs - 1):
        for _ in loader:
            pass
    t0 = time.perf_counter()
    for batch in loader:
        n_images += len(batch["input_ids"])
    dt = time.perf_counter() - t0
    return n_images / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--tokenizer_dir", default=None)
    ap.add_argument("--keep_dir", default=None,
                    help="reuse/keep the synthetic dataset here")
    args = ap.parse_args()

    from sketch2img_tpu.data.dataset import ImageStore
    from sketch2img_tpu.data.loader import Loader

    if args.tokenizer_dir:
        from sketch2img_tpu.data.tokenizer import CLIPBPETokenizer

        tok = CLIPBPETokenizer.from_pretrained(args.tokenizer_dir)
    else:
        tok = _StubTokenizer()

    root = args.keep_dir or tempfile.mkdtemp(prefix="loader_bench_")
    if not os.path.exists(os.path.join(root, "img_00000.jpg")):
        make_dataset(root, args.n, args.size)

    store = ImageStore([root], size=args.size, tokenizer=tok,
                       process_tags=True, center_crop=False)
    assert len(store) == args.n, (len(store), args.n)

    loader = Loader(store, args.batch, shuffle=True, pad_to=store.max_length,
                    prefetch=args.prefetch)
    rate = bench_epochs(loader)
    print(json.dumps({
        "metric": "loader_uncached_images_per_sec",
        "value": round(rate, 1), "unit": "images/sec",
        "device_train_rate": DEVICE_RATE_UNCACHED,
        "feeds_train_step": rate >= DEVICE_RATE_UNCACHED,
        "bpe_included": bool(args.tokenizer_dir),
    }), flush=True)

    # cached path: moments stand-in (the real cache stores VAE moments; the
    # per-step host cost — dict lookup + collate — is what's measured)
    lat = args.size // 8

    def fake_moments(px):
        return np.zeros((px.shape[0], lat, lat, 8), np.float32)

    store_c = ImageStore([root], size=args.size, tokenizer=tok,
                         process_tags=True, center_crop=True)
    t0 = time.perf_counter()
    store_c.cache_latents(fake_moments, fake_moments)
    cache_build_s = time.perf_counter() - t0

    loader_c = Loader(store_c, args.batch, shuffle=True,
                      pad_to=store_c.max_length, prefetch=args.prefetch)
    rate_c = bench_epochs(loader_c)
    print(json.dumps({
        "metric": "loader_cached_images_per_sec",
        "value": round(rate_c, 1), "unit": "images/sec",
        "device_train_rate": DEVICE_RATE_CACHED,
        "feeds_train_step": rate_c >= DEVICE_RATE_CACHED,
        "cache_build_seconds": round(cache_build_s, 1),
        "bpe_included": bool(args.tokenizer_dir),
    }), flush=True)


if __name__ == "__main__":
    main()

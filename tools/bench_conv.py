"""Microbenchmark: the UNet's 3x3-conv trunk, shape by shape, on the TPU.

Round-1 finding (docs/ROADMAP.md): conv trunk ~5.7 ms of the 12.3 ms bs1
UNet forward vs a ~2.1 ms FLOP bound. This tool localizes the gap per conv
shape and compares lowering strategies before committing to a Pallas kernel:

  xla    — lax.conv_general_dilated, NHWC, bf16 (the current models' path)
  im2col — explicit 9-tap patch concat -> one (BHW, 9Cin)x(9Cin, Cout) dot
  shift9 — nine shifted (BHW, Cin)x(Cin, Cout) dots accumulated

Run on the axon TPU:  python tools/bench_conv.py [--batch 2] [--reps 20]
Timing ends with a dependent host fetch (CLAUDE.md: block_until_ready does
not synchronize through the tunnel).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, Cin, Cout, stride, count) for one SD1.5 UNet forward at 64x64
# latents (512px). Counts cover conv1/conv2 of every resnet, down/upsamples,
# conv_in/out; 1x1 shortcuts listed separately.
SD15_CONVS = [
    # down path
    (64, 64, 4, 320, 1, 1),       # conv_in
    (64, 64, 320, 320, 1, 4),     # down0 resnets
    (64, 64, 320, 320, 2, 1),     # downsample0
    (32, 32, 320, 640, 1, 1),
    (32, 32, 640, 640, 1, 3),
    (32, 32, 640, 640, 2, 1),     # downsample1
    (16, 16, 640, 1280, 1, 1),
    (16, 16, 1280, 1280, 1, 3),
    (16, 16, 1280, 1280, 2, 1),   # downsample2
    (8, 8, 1280, 1280, 1, 4),     # down3 resnets
    # mid
    (8, 8, 1280, 1280, 1, 4),
    # up path (3 resnets per level, diffusers channel plan)
    (8, 8, 2560, 1280, 1, 3),
    (8, 8, 1280, 1280, 1, 3),
    (16, 16, 1280, 1280, 1, 1),   # upsample0 (after 2x)
    (16, 16, 2560, 1280, 1, 2),
    (16, 16, 1920, 1280, 1, 1),
    (16, 16, 1280, 1280, 1, 3),
    (32, 32, 1280, 1280, 1, 1),   # upsample1
    (32, 32, 1920, 640, 1, 1),
    (32, 32, 1280, 640, 1, 1),
    (32, 32, 960, 640, 1, 1),
    (32, 32, 640, 640, 1, 3),
    (64, 64, 640, 640, 1, 1),     # upsample2
    (64, 64, 960, 320, 1, 1),
    (64, 64, 640, 320, 1, 2),
    (64, 64, 320, 320, 1, 3),
    (64, 64, 320, 4, 1, 1),       # conv_out
]


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, args, reps, iters=3):
    noop = jax.jit(jnp.sum)
    tiny = jnp.ones((8, 8))
    fetch(noop(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(noop(tiny))
    baseline = (time.perf_counter() - t0) / 5

    fetch(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    per_call = max(1e-9, (time.perf_counter() - t0) / iters - baseline)
    return per_call / reps


def conv_xla(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def conv_im2col(x, w, stride):
    b, h, w_, cin = x.shape
    kh = kw = 3
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy:dy + h:stride, dx:dx + w_:stride, :]
        for dy in range(kh) for dx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H', W', 9Cin)
    return jax.lax.dot_general(
        patches, w.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16,
    )


def conv_shift9(x, w, stride):
    b, h, w_, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h:stride, dx:dx + w_:stride, :]
            y = jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(jnp.bfloat16)


VARIANTS = {"xla": conv_xla, "im2col": conv_im2col, "shift9": conv_shift9}


def bench_shape(variant, b, h, w_, cin, cout, stride, reps):
    conv = VARIANTS[variant]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
    wt = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02

    # the tunnel fetch costs ~30 ms: size the chain so device time dominates
    gflop = 2 * b * (h // stride) * (w_ // stride) * 9 * cin * cout / 1e9
    est = max(gflop / 200e3, 5e-6)  # optimistic per-call estimate (seconds)
    n = max(reps, int(0.06 / est))
    n = min(n, 4000)

    @jax.jit
    def chained(x, wt):
        def body(carry, _):
            y = conv(carry, wt, stride)
            carry = carry + jnp.mean(y).astype(carry.dtype) * 1e-20
            return carry, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    return timed(chained, (x, wt), n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--variants", default="xla,im2col,shift9")
    args = p.parse_args()

    variants = args.variants.split(",")
    print(f"# batch={args.batch} reps={args.reps} "
          f"backend={jax.devices()[0].platform}")
    header = f"{'shape':>34}  {'GFLOP':>7}" + "".join(
        f"  {v:>10}" for v in variants) + f"  {'bound_us':>8}"
    print(header)

    totals = {v: 0.0 for v in variants}
    total_bound = 0.0
    for (h, w_, cin, cout, stride, count) in SD15_CONVS:
        ho, wo = h // stride, w_ // stride
        gflop = 2 * args.batch * ho * wo * 9 * cin * cout / 1e9
        bound_us = gflop / 200e3 * 1e6  # 200 TFLOP/s bf16 ceiling -> us
        row = f"({h:3d},{w_:3d},{cin:4d})->{cout:4d} s{stride} x{count}"
        line = f"{row:>34}  {gflop:7.2f}"
        for v in variants:
            dt = bench_shape(v, args.batch, h, w_, cin, cout, stride, args.reps)
            totals[v] += dt * count
            line += f"  {dt*1e6:8.1f}us"
        total_bound += bound_us * count / 1e6
        line += f"  {bound_us:8.1f}"
        print(line, flush=True)

    print("\n# totals per UNet forward (conv trunk only)")
    for v in variants:
        print(f"  {v:>8}: {totals[v]*1e3:7.3f} ms")
    print(f"  flop bound: {total_bound*1e3:7.3f} ms (at 200 TFLOP/s)")


if __name__ == "__main__":
    main()

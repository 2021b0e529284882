"""Flash-attention block sweep on the TPU: forward and backward separately,
per (N, d) — fills ops/flash_attention._BLOCK_TABLE (ROADMAP: the bwd
kernels previously reused the fwd blocks untuned).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_flash.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from sketch2img_tpu.ops import flash_attention as fa

# (b*h, N, d): SD1.5 self-attention shapes at 512/768/1024 px (bs1, 8 heads)
CASES = [
    (8, 4096, 40),
    (8, 9216, 40),
    (8, 16384, 40),
    (8, 1024, 80),
    (8, 4096, 80),   # 1024px at the 32x downsampled level
    (8, 256, 160),
    (16, 4096, 40),  # CFG-doubled batch (plain loop / bs2)
    (16, 1024, 80),
    (128, 4480, 40),  # clip-injection [image; CLIP] concat, batch-8 serving
]

BLOCKS = [256, 512, 1024, 2048, 4096]


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, args, reps, iters=3):
    noop = jax.jit(jnp.sum)
    tiny = jnp.ones((8, 8))
    fetch(noop(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(noop(tiny))
    baseline = (time.perf_counter() - t0) / 5
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    return max(1e-9, (time.perf_counter() - t0) / iters - baseline) / reps


def bench_case(bh, n, d, blocks, what, reps):
    scale = d ** -0.5
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, bh, n, d), jnp.bfloat16)
    k = jax.random.normal(key, (1, bh, n, d), jnp.bfloat16)
    v = jax.random.normal(key, (1, bh, n, d), jnp.bfloat16)

    fa.force_block_sizes(blocks)
    try:
        if what == "fwd":
            @jax.jit
            def chained(q, k, v):
                def body(c, _):
                    o = fa._flash(c, k, v, scale)
                    return c + o * 1e-20, ()
                out, _ = jax.lax.scan(body, q, None, length=reps)
                return out
            return timed(chained, (q, k, v), reps)

        @jax.jit
        def chained(q, k, v):
            def body(c, _):
                def loss(qq):
                    return jnp.sum(fa._flash(qq, k, v, scale).astype(jnp.float32) ** 2)
                g = jax.grad(loss)(c)
                return c + g.astype(c.dtype) * 1e-20, ()
            out, _ = jax.lax.scan(body, q, None, length=reps)
            return out
        return timed(chained, (q, k, v), reps)
    finally:
        fa.force_block_sizes(None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--what", nargs="+", default=["fwd", "bwd"])
    p.add_argument("--variant", choices=["transposed", "classic", "both"],
                   default="both")
    p.add_argument("--cases", type=int, nargs="*", default=None,
                   help="indices into CASES (default: all)")
    args = p.parse_args()

    variants = {"transposed": [True], "classic": [False],
                "both": [True, False]}[args.variant]
    cases = ([CASES[i] for i in args.cases] if args.cases is not None
             else CASES)
    for tp in variants:
        fa.set_transposed_kernels(tp)
        print(f"# variant: {'transposed' if tp else 'classic'}")
        _run(args, cases)
    fa.set_transposed_kernels(True)


def _run(args, cases):
    for what in args.what:
        print(f"## {what}")
        for bh, n, d, in cases:
            results = []
            for bq in BLOCKS:
                if bq > n:
                    continue
                for bk in BLOCKS:
                    if bk > n:
                        continue
                    # skip VMEM-hopeless combos
                    if bq * bk * 4 > 8 * (1 << 20):
                        continue
                    try:
                        dt = bench_case(bh, n, d, (bq, bk), what, args.reps)
                        results.append((dt, bq, bk))
                        print(f"  N={n:6d} d={d:3d} bq={bq:4d} bk={bk:4d}: "
                              f"{dt*1e6:9.1f}us", flush=True)
                    except Exception as e:  # noqa: BLE001 — sweep survives OOM
                        print(f"  N={n:6d} d={d:3d} bq={bq:4d} bk={bk:4d}: "
                              f"FAIL {type(e).__name__}", flush=True)
            if results:
                dt, bq, bk = min(results)
                print(f"  BEST {what} N={n} d={d}: ({bq},{bk}) {dt*1e6:.1f}us",
                      flush=True)


if __name__ == "__main__":
    main()

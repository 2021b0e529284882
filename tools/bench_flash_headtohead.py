"""Interleaved head-to-head re-measurement of flash block candidates.

Single-shot sweeps through the axon tunnel carry +-30% noise; this
interleaves the candidates round-robin (rounds x one chained-scan call
each) and reports per-candidate medians so the dispatch-table entries are
picked on repeatable signal. Calls are chained inside one jit via
lax.scan (the tunnel's dispatch floor is ~1.4 ms/call otherwise). Usage:

  PYTHONPATH=... python tools/bench_flash_headtohead.py \
      --bh 8 --n 4096 --d 40 --what fwd \
      --cand 2048,512 1024,1024 512,1024 1024,2048
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from sketch2img_tpu.ops import flash_attention as fa  # noqa: E402


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bh", type=int, default=8)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--d", type=int, default=40)
    p.add_argument("--what", default="fwd", choices=["fwd", "bwd"])
    p.add_argument("--reps", type=int, default=40)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--cand", nargs="+", required=True, help="bq,bk pairs")
    args = p.parse_args()

    cands = [tuple(int(v) for v in c.split(",")) for c in args.cand]
    bh, n, d = args.bh, args.n, args.d
    q = jax.random.normal(jax.random.PRNGKey(0), (1, bh, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, bh, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, bh, n, d), jnp.bfloat16)
    scale = d ** -0.5

    def make(blocks):
        fa.force_block_sizes(blocks)
        try:
            if args.what == "fwd":
                @jax.jit
                def chained(q, k, v):
                    def body(c, _):
                        o = fa._flash(c, k, v, scale)
                        return c + o * 1e-20, ()
                    out, _ = jax.lax.scan(body, q, None, length=args.reps)
                    return out
            else:
                @jax.jit
                def chained(q, k, v):
                    def body(c, _):
                        def loss(qq):
                            return jnp.sum(
                                fa._flash(qq, k, v, scale).astype(jnp.float32) ** 2)
                        g = jax.grad(loss)(c)
                        return c + g.astype(c.dtype) * 1e-20, ()
                    out, _ = jax.lax.scan(body, q, None, length=args.reps)
                    return out
            fetch(chained(q, k, v))  # compile + drain
            return chained
        finally:
            fa.force_block_sizes(None)

    fns = {c: make(c) for c in cands}

    noop = jax.jit(jnp.sum)
    tiny = jnp.ones((8, 8))
    fetch(noop(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(noop(tiny))
    baseline = (time.perf_counter() - t0) / 5

    results = {c: [] for c in cands}
    for _ in range(args.rounds):
        for c in cands:
            t0 = time.perf_counter()
            fetch(fns[c](q, k, v))
            results[c].append(
                max(1e-9, time.perf_counter() - t0 - baseline) / args.reps)
    for c in cands:
        med = statistics.median(results[c])
        runs = " ".join(f"{t*1e6:7.1f}" for t in results[c])
        print(f"{args.what} bh={bh} n={n} d={d} ({c[0]:4d},{c[1]:4d}): "
              f"median {med*1e6:8.1f}us   [{runs}]", flush=True)


if __name__ == "__main__":
    main()

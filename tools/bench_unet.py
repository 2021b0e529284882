"""UNet forward/guided-step timing on the TPU: conv backend comparison.

Usage: python tools/bench_unet.py [--what fwd|guided] [--batch 1 2]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2])
    p.add_argument("--backends", nargs="+", default=["xla", "auto"])
    p.add_argument("--reps", type=int, default=40)
    p.add_argument("--size", type=int, default=64, help="latent h=w")
    p.add_argument("--cast-params", action="store_true",
                   help="pre-cast float params to bf16 (serving mode)")
    p.add_argument("--norm-barrier", action="store_true",
                   help="optimization_barrier on norm inputs")
    args = p.parse_args()

    from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition
    from sketch2img_tpu.ops.conv2d import set_default_conv_backend

    if args.norm_barrier:
        from sketch2img_tpu.models.layers import set_norm_input_barrier
        set_norm_input_barrier(True)

    unet = UNet2DCondition(SD15_CONFIG, compute_dtype=jnp.bfloat16)
    s = args.size

    def make_params():
        shapes = jax.eval_shape(lambda: unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))))
        import numpy as np
        rng = np.random.RandomState(0)
        return jax.tree_util.tree_map(
            lambda sh: jnp.asarray(rng.normal(0, 0.02, sh.shape), sh.dtype),
            shapes)["params"]

    params = make_params()
    if args.cast_params:
        from sketch2img_tpu.utils.params import cast_float_params
        params = cast_float_params(params, jnp.bfloat16)

    for be in args.backends:
        set_default_conv_backend(be)
        for b in args.batches:
            x = jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 4))
            t = jnp.zeros((b,), jnp.int32)
            ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768)) * 0.1
            reps = args.reps

            @jax.jit
            def chained(p, x, t, ctx):
                def body(carry, _):
                    eps = unet.apply({"params": p}, carry, t, ctx)
                    return carry + eps.astype(carry.dtype) * 1e-20, ()
                out, _ = jax.lax.scan(body, x, None, length=reps)
                return out

            dt = timed(chained, (params, x, t, ctx), reps)
            print(f"backend={be:6s} bs={b} {s}x{s}: {dt*1e3:7.3f} ms/fwd",
                  flush=True)


if __name__ == "__main__":
    main()

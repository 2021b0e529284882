"""Capture a device trace of the full config-4 guided pipeline (bs1, 512px,
50 steps) for per-op analysis.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_guided.py \
      [--outdir /tmp/trace_guided] [--calls 3] [--batch 1] [--size 512]

Then:  python tools/trace_summary.py /tmp/trace_guided --steps <calls> --top 40
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="/tmp/trace_guided")
    p.add_argument("--calls", type=int, default=3)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--unroll", type=int, default=1,
                   help="solver steps per XLA while iteration (staging A/B)")
    p.add_argument("--donate", action="store_true",
                   help="donate the latents0 buffer to the jit")
    args = p.parse_args()

    import bench

    bench._enable_compile_cache()

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.lgp import lgp_fused_apply
    from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn

    unet, lgp, up, lv = bench._sd_stack()
    fn = jax.jit(make_sketch_guided_fn(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c, capture_taps=True),
        lambda v, f, n: lgp.apply(v, f, n, train=False),
        make_schedule(), args.steps, unroll=args.unroll,
        lgp_apply_fused=lambda v, taps, nl, hh, ww: lgp_fused_apply(
            v, taps, nl, hh, ww, compute_dtype=jnp.bfloat16),
    ), donate_argnums=(2,) if args.donate else ())
    key = jax.random.PRNGKey(0)
    hw = args.size // 8
    b = args.batch
    lat0 = jax.random.normal(key, (b, hw, hw, 4), jnp.float32)
    ctx_u = jax.random.normal(key, (b, 77, 768), jnp.float32) * 0.1
    ctx_c = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768), jnp.float32) * 0.1
    sketch = jax.random.normal(jax.random.PRNGKey(2), (b, hw, hw, 4), jnp.float32)
    lat0_host = jax.device_get(lat0)

    def call():
        # donated buffers are consumed — re-stage the latents per call
        lat = jnp.asarray(lat0_host) if args.donate else lat0
        return float(jnp.sum(fn(up, lv, lat, ctx_u, ctx_c, sketch, 7.5)))

    print("compiling + warmup ...", flush=True)
    print(call(), flush=True)
    jax.profiler.start_trace(args.outdir)
    acc = 0.0
    for _ in range(args.calls):
        acc += call()
    jax.profiler.stop_trace()
    print("traced", args.calls, "calls; acc:", acc, flush=True)


if __name__ == "__main__":
    main()

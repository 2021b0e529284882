"""Capture a device trace of any bench config's sampling program for
per-op accounting (VERDICT r4 item 5: configs 3 and 5 need the same
category budget the guided step has, docs/ROADMAP.md).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_config.py \
      --config 3 [--outdir /tmp/trace_c3] [--calls 3] [--batch 1]

Then:  python tools/trace_summary.py <outdir> --steps <calls> --top 40

Configs (matching bench.py):
  3  plain SD1.5 text2img CFG sampling (default bs1, 512px, 50 steps)
  4  sketch-guided (LGP vjp guidance) — same as tools/trace_guided.py
  5  attention-injection variant (default bs8, 512px, 25 steps)
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def build(args):
    import bench

    from sketch2img_tpu.core.schedulers import make_schedule

    b, hw = args.batch, args.size // 8
    if args.config == 3:
        from sketch2img_tpu.pipelines.text2img import make_text2img_fn

        unet, _, up, _ = bench._sd_stack()
        fn = jax.jit(make_text2img_fn(
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
            make_schedule(), args.steps))
        lat0 = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 4),
                                 jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * b, 77, 768),
                                jnp.float32) * 0.1
        return fn, (up, lat0, ctx, 7.5)
    if args.config == 4:
        from sketch2img_tpu.models.lgp import lgp_fused_apply
        from sketch2img_tpu.pipelines.sketch_guided import (
            make_sketch_guided_fn,
        )

        unet, lgp, up, lv = bench._sd_stack()
        fn = jax.jit(make_sketch_guided_fn(
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
            lambda p, x, t, c: unet.apply({"params": p}, x, t, c,
                                          capture_taps=True),
            lambda v, f, n: lgp.apply(v, f, n, train=False),
            make_schedule(), args.steps,
            lgp_apply_fused=lambda v, taps, nl, hh, ww: lgp_fused_apply(
                v, taps, nl, hh, ww, compute_dtype=jnp.bfloat16)))
        k = jax.random.PRNGKey
        lat0 = jax.random.normal(k(0), (b, hw, hw, 4), jnp.float32)
        ctx_u = jax.random.normal(k(0), (b, 77, 768), jnp.float32) * 0.1
        ctx_c = jax.random.normal(k(1), (b, 77, 768), jnp.float32) * 0.1
        sketch = jax.random.normal(k(2), (b, hw, hw, 4), jnp.float32)
        return fn, (up, lv, lat0, ctx_u, ctx_c, sketch, 7.5)

    # config 5: attention-injection (bench.bench_attn_injected's program)
    import dataclasses

    from sketch2img_tpu.models.unet import (
        SD15_CONFIG,
        UNet2DCondition,
        num_transformer_blocks,
    )
    from sketch2img_tpu.pipelines.attn_injected import make_attn_injected_fn

    cfg = dataclasses.replace(SD15_CONFIG, injection="clip")
    unet = UNet2DCondition(cfg, compute_dtype=jnp.bfloat16)
    n = num_transformer_blocks(cfg)
    states_init = [jnp.zeros((2, 257, 1024))] * n
    up = bench._serving_cast(bench._random_init(
        unet, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 77, 768)), injection_states=states_init)["params"])
    fn = jax.jit(make_attn_injected_fn(
        lambda p, x, t, c, s, sc: unet.apply(
            {"params": p}, x, t, c, injection_states=s, injection_scale=sc),
        make_schedule(), args.steps, n))
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 4),
                             jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * b, 77, 768),
                            jnp.float32) * 0.1
    state = jax.random.normal(jax.random.PRNGKey(2), (2 * b, 257, 1024),
                              jnp.float32) * 0.1
    return fn, (up, lat0, ctx, state, 0.5, 7.5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=3, choices=[3, 4, 5])
    p.add_argument("--outdir", default=None)
    p.add_argument("--calls", type=int, default=3)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args()
    if args.batch is None:
        args.batch = 8 if args.config == 5 else 1
    if args.steps is None:
        args.steps = 25 if args.config == 5 else 50
    if args.outdir is None:
        args.outdir = f"/tmp/trace_c{args.config}"

    import bench

    bench._enable_compile_cache()
    fn, fargs = build(args)

    def call():
        return float(jnp.sum(fn(*fargs)))

    print("compiling + warmup ...", flush=True)
    print(call(), flush=True)
    jax.profiler.start_trace(args.outdir)
    acc = 0.0
    for _ in range(args.calls):
        acc += call()
    jax.profiler.stop_trace()
    print(f"traced {args.calls} calls into {args.outdir}; acc: {acc}",
          flush=True)


if __name__ == "__main__":
    main()

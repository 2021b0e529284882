"""Benchmark harness — prints ONE JSON line per run for the driver.

Default (no args): the headline metric from BASELINE.md — 512x512, 50-step
sketch-guided generation, images/sec/chip, full SD1.5-size models (random
weights — throughput only), bf16 compute. ``--config N`` selects the other
BASELINE.json configs:

  1  anime2sketch U-Net edge extraction, one 512x512 image
  2  LGP MLP inference over cached UNet activations
  3  plain SD1.5 text2img, 50-step 512x512, CFG only
  4  sketch-guided sampling with per-step LGP gradient guidance (default)
  5  attention-injection variant, batch-8 generation

Baseline note: the reference publishes NO numbers (BASELINE.md). The A100
anchors are engineering estimates for the reference code path (SD1.5
fp16+xformers ~20 UNet-it/s at 512^2 => ~2.5 s per plain 50-step image;
sketch-guided doubles ~26 of 50 steps with a full UNet backward ≈ 2x
=> ~0.20 img/s; batch-8 injection ≈ 0.55 img/s). Replace with measured
numbers when A100 hardware is available.

Timing note: on the axon TPU tunnel ``block_until_ready`` returns before
execution completes — every timed region ends with a dependent host fetch.
"""

from __future__ import annotations

import argparse
import json
import time

# documented A100 estimates (see module docstring)
BASELINES = {
    1: 0.03,   # anime2sketch 512^2 single image, seconds (CPU-free estimate)
    2: 0.002,  # LGP inference over cached activations, seconds
    3: 0.40,   # plain text2img, img/s
    4: 0.20,   # sketch-guided, img/s
    5: 0.55,   # batch-8 attn-injection, img/s
}


def _emit(metric, value, unit, vs):
    print(json.dumps({"metric": metric, "value": round(value, 6),
                      "unit": unit, "vs_baseline": round(vs, 3)}))


def _random_init(module, *a, seed=0, scale=0.02, **kw):
    """Random (not zero) weights at full architecture — host-side numpy RNG
    (fast for the 860M-param UNet), normal(0, scale) per leaf."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *a, **kw))
    rng = np.random.RandomState(seed)

    def leaf(s):
        return jnp.asarray(
            rng.normal(0.0, scale, s.shape).astype(np.float32), s.dtype
        )

    return jax.tree_util.tree_map(leaf, shapes)


def _serving_cast(tree):
    """Pre-cast float params to bf16 once — serving mode (the reference
    demos load fp16 weights, app.py:29-43); saves ~1.8 ms/UNet-forward of
    per-call fp32->bf16 convert traffic."""
    import jax.numpy as jnp

    from sketch2img_tpu.utils.params import cast_float_params

    return cast_float_params(tree, jnp.bfloat16)


def _canary(out):
    """Output sanity: finite and non-degenerate (not a constant map).

    Stats are computed ON DEVICE and only scalars cross the tunnel: fetching
    the full array (config 2's is 152 MB) congests the axon tunnel for
    ~100+ ms and inflates the timed fetches that follow (measured: config 2
    read 7.6 ms/call with a full-array canary vs 0.6 ms without)."""
    import jax.numpy as jnp

    arr = out.astype(jnp.float32)
    assert bool(jnp.isfinite(arr).all()), "bench output contains non-finite values"
    assert float(jnp.std(arr)) > 0, "bench output is constant — degenerate program"


def _timed(fn, args, iters=3):
    """Mean seconds/call. Each call syncs via a dependent host fetch; the
    fetch round-trip (~30 ms through the axon tunnel) is measured with a
    no-op and subtracted so sub-fetch-latency kernels report honestly.

    Order matters: the canary runs FIRST and is followed by one untimed
    call — the canary's device work congests the tunnel and the next fetch
    absorbs the drain (measured: 437 ms for the first call after a canary
    vs 46 ms steady-state on config 2). Baseline and the timed loop only
    start once the queue is clear."""
    import jax
    import jax.numpy as jnp

    def once():
        return float(jnp.sum(fn(*args)))

    _canary(fn(*args))  # compile + output sanity
    once()  # absorb the canary's tunnel backlog before any timing

    noop = jax.jit(jnp.sum)
    tiny = jnp.ones((8, 8))
    float(noop(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(tiny))
    baseline = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    for _ in range(iters):
        once()
    return max(1e-9, (time.perf_counter() - t0) / iters - baseline)


def bench_anime2sketch():
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.models.anime2sketch import create_anime2sketch

    gan = create_anime2sketch(compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 512, 3), jnp.float32)
    params = _serving_cast(_random_init(gan, x)["params"])
    # the ~2 ms/call kernel must dominate the ~30-45 ms (and drifting)
    # tunnel fetch baseline: 100 chained reps puts the chain at ~200 ms so
    # baseline variance contributes <0.5% (at 20 reps it was ~±20%)
    reps = 100

    # chain reps GAN calls inside one jit (output fed back as input) so the
    # per-call time resolves above the tunnel's fetch latency
    @jax.jit
    def chained(p, x):
        def body(img, _):
            y = gan.apply({"params": p}, img)
            return jnp.tile(y, (1, 1, 1, 3)).astype(img.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    dt = _timed(chained, (params, x), iters=3) / reps
    _emit("anime2sketch_512px_latency", dt, "seconds", BASELINES[1] / max(dt, 1e-9))


def bench_lgp():
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.models.lgp import LatentEdgePredictor

    lgp = LatentEdgePredictor(compute_dtype=jnp.bfloat16)
    # cached activations are stored bf16 (the UNet computes them in bf16;
    # an fp32 cache would double the 76 MB/sample footprint AND add a
    # 152 MB fp32->bf16 convert read per inference — measured ~0.3 ms of
    # the old 0.7 ms latency)
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 9280), jnp.bfloat16)
    nl = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4), jnp.bfloat16)
    variables = _random_init(lgp, feats, nl)
    # BN running vars must be positive (eval-mode rsqrt)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) + 0.5, variables["batch_stats"])
    # NO _serving_cast here: real serving keeps the LGP fp32 (edge parity,
    # cast_params(lgp=False) default) — and bf16 LGP vars measured SLOWER
    # (0.76 ms vs 0.57 ms; the w-major split-dense fuses worse in bf16)
    # 400 chained reps: the 0.6 ms kernel must dominate the drifting
    # ~30-45 ms tunnel fetch baseline (at 20 reps, baseline variance alone
    # moved the metric ±25% between sessions)
    reps = 400

    @jax.jit
    def chained(v, f, n):
        def body(f, _):
            out = lgp.apply(v, f, n, train=False)
            # data-dependence without changing values meaningfully
            return f + jnp.mean(out).astype(f.dtype) * 1e-20, ()
        f, _ = jax.lax.scan(body, f, None, length=reps)
        return f

    dt = _timed(chained, (variables, feats, nl), iters=3) / reps
    _emit("lgp_cached_activations_latency", dt, "seconds", BASELINES[2] / max(dt, 1e-9))


def _sd_stack(remat=False):
    import jax.numpy as jnp

    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition

    cfg = SD15_CONFIG
    if remat:
        import dataclasses

        cfg = dataclasses.replace(cfg, remat=True)
    unet = UNet2DCondition(cfg, compute_dtype=jnp.bfloat16)
    lgp = LatentEdgePredictor(compute_dtype=jnp.bfloat16)
    b, h, w = 1, 64, 64
    unet_vars = _random_init(unet, jnp.zeros((b, h, w, 4)),
                             jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 768)))
    lgp_vars = _random_init(lgp, jnp.zeros((b, h, w, 9280)), jnp.zeros((b, h, w, 4)))
    import jax

    # BN running vars must be positive (eval-mode rsqrt)
    lgp_vars["batch_stats"] = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) + 0.5, lgp_vars["batch_stats"])
    return unet, lgp, _serving_cast(unet_vars["params"]), _serving_cast(lgp_vars)


def bench_text2img(batch=1, size=512, steps=50):
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.pipelines.text2img import make_text2img_fn

    unet, _, up, _ = _sd_stack()
    fn = jax.jit(make_text2img_fn(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        make_schedule(), steps,
    ))
    hw = size // 8
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (batch, hw, hw, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * batch, 77, 768),
                            jnp.float32) * 0.1
    dt = _timed(fn, (up, lat0, ctx, 7.5))
    _emit(f"text2img_{size}px_{steps}step"
          f"{'' if batch == 1 else f'_bs{batch}'}_images_per_sec_per_chip",
          batch / dt, "images/sec/chip", (batch / dt) / BASELINES[3])


def bench_sketch_guided(batch=1, size=512, steps=50, remat=None):
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.memory import choose_remat
    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.lgp import lgp_fused_apply
    from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn

    if remat is None:  # auto, same policy the runtime applies per request
        remat = choose_remat(batch, size, size)
    unet, lgp, up, lv = _sd_stack(remat=remat)

    fn = jax.jit(make_sketch_guided_fn(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c, capture_taps=True),
        lambda v, f, n: lgp.apply(v, f, n, train=False),
        make_schedule(), steps,
        lgp_apply_fused=lambda v, taps, nl, hh, ww: lgp_fused_apply(
            v, taps, nl, hh, ww, compute_dtype=jnp.bfloat16),
    ))
    key = jax.random.PRNGKey(0)
    hw = size // 8
    lat0 = jax.random.normal(key, (batch, hw, hw, 4), jnp.float32)
    ctx_u = jax.random.normal(key, (batch, 77, 768), jnp.float32) * 0.1
    ctx_c = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768),
                              jnp.float32) * 0.1
    sketch = jax.random.normal(jax.random.PRNGKey(2), (batch, hw, hw, 4),
                               jnp.float32)
    dt = _timed(fn, (up, lv, lat0, ctx_u, ctx_c, sketch, 7.5))
    _emit(f"sketch_guided_{size}px_{steps}step"
          f"{'' if batch == 1 else f'_bs{batch}'}"
          f"{'_remat' if remat else ''}_images_per_sec_per_chip",
          batch / dt, "images/sec/chip", (batch / dt) / BASELINES[4])


def bench_attn_injected(batch=8, steps=25):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.unet import (
        SD15_CONFIG,
        UNet2DCondition,
        num_transformer_blocks,
    )
    from sketch2img_tpu.pipelines.attn_injected import make_attn_injected_fn

    cfg = dataclasses.replace(SD15_CONFIG, injection="clip")
    unet = UNet2DCondition(cfg, compute_dtype=jnp.bfloat16)
    n = num_transformer_blocks(cfg)
    b = batch
    states_init = [jnp.zeros((2, 257, 1024))] * n
    up = _serving_cast(
        _random_init(unet, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,), jnp.int32),
                     jnp.zeros((2, 77, 768)), injection_states=states_init)["params"])

    fn = jax.jit(make_attn_injected_fn(
        lambda p, x, t, c, s, sc: unet.apply({"params": p}, x, t, c,
                                             injection_states=s,
                                             injection_scale=sc),
        make_schedule(), steps, n,  # demo default 25 (clip_guided_inf.py:181)
    ))
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * b, 77, 768), jnp.float32) * 0.1
    state = jax.random.normal(jax.random.PRNGKey(2), (2 * b, 257, 1024), jnp.float32) * 0.1
    dt = _timed(fn, (up, lat0, ctx, state, 0.5, 7.5))
    # the 25-step baseline estimate scales linearly in steps
    base = BASELINES[5] * 25.0 / steps
    _emit(f"attn_injected_batch{b}_512px_{steps}step_images_per_sec_per_chip",
          b / dt, "images/sec/chip", (b / dt) / base)


def _enable_compile_cache():
    import os

    from sketch2img_tpu.utils.compile_cache import enable

    enable(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def bench_quality():
    """TPU-side output regression (VERDICT r4 item 3): run the tiny stack
    in the bf16 serving configuration on the axon backend and
    tolerance-compare against the committed device manifest
    (tools/quality_check.py --device). Emits ok=1/0 as the JSON metric so
    the driver records pass/fail."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    import quality_check

    manifest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests", "fixtures",
                            "quality_manifest_device.json")
    rc = quality_check.run_device_check(manifest, update=False)
    _emit("device_quality_regression_ok", 1.0 if rc == 0 else 0.0,
          "bool", 1.0 if rc == 0 else 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=4, choices=[1, 2, 3, 4, 5])
    parser.add_argument("--quality", action="store_true",
                        help="device-side output regression instead of a "
                             "throughput config (tools/quality_check.py "
                             "--device against the committed manifest)")
    parser.add_argument("--batch", type=int, default=None,
                        help="configs 3/4/5: images per call "
                             "(default 1; config 5 default 8)")
    parser.add_argument("--size", type=int, default=None,
                        help="configs 3/4: image size in px (default 512)")
    parser.add_argument("--steps", type=int, default=None,
                        help="configs 3/4: solver steps (default 50)")
    parser.add_argument("--remat", action="store_true",
                        help="config 4: force the rematerialized UNet "
                             "backward (default: core.memory.choose_remat "
                             "picks per batch/size)")
    parser.add_argument("--no-remat", action="store_true",
                        help="config 4: force remat OFF even when the HBM "
                             "estimate would flip it on")
    args = parser.parse_args()
    _enable_compile_cache()
    if args.quality:
        bench_quality()
        return
    kw = {}
    if args.config in (3, 4, 5):
        if args.batch:
            kw["batch"] = args.batch
    if args.config in (3, 4):
        if args.size:
            kw["size"] = args.size
    if args.config in (3, 4, 5):
        if args.steps:
            kw["steps"] = args.steps
        if args.config == 4 and args.remat:
            kw["remat"] = True
        elif args.config == 4 and args.no_remat:
            kw["remat"] = False
    {
        1: bench_anime2sketch,
        2: bench_lgp,
        3: bench_text2img,
        4: bench_sketch_guided,
        5: bench_attn_injected,
    }[args.config](**kw)


if __name__ == "__main__":
    main()

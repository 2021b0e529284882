"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): 512x512, 50-step sketch-guided generation,
images/sec/chip, full SD1.5-size models (random weights — throughput only),
bf16 compute. ``vs_baseline`` divides by the documented A100 reference
estimate below.

Baseline note: the reference publishes NO numbers (BASELINE.md). The A100
anchor used here is an engineering estimate for the reference code path
(SD1.5 fp16+xformers ~20 UNet-it/s at 512^2 => ~2.5 s plain 50-step image;
sketch-guided doubles ~26 of 50 steps with a full UNet backward ≈ 2x cost
=> ~5 s/image => 0.20 img/s). Replace with a measured number when A100
hardware is available.
"""

from __future__ import annotations

import json
import time

A100_SKETCH_GUIDED_IMG_PER_SEC = 0.20  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.lgp import LatentEdgePredictor, lgp_fused_apply
    from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition
    from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn

    unet = UNet2DCondition(SD15_CONFIG, compute_dtype=jnp.bfloat16)
    lgp = LatentEdgePredictor(compute_dtype=jnp.bfloat16)

    b, h, w = 1, 64, 64
    steps = 50

    def zeros_init(module, *a, **kw):
        shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *a, **kw))
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    unet_vars = zeros_init(unet, jnp.zeros((b, h, w, 4)), jnp.zeros((b,), jnp.int32),
                           jnp.zeros((b, 77, 768)))
    lgp_vars = zeros_init(lgp, jnp.zeros((b, h, w, 9280)), jnp.zeros((b, h, w, 4)))
    # non-degenerate BN stats for a realistic compute graph
    lgp_vars = jax.tree_util.tree_map(lambda x: x + 0.5, lgp_vars)

    def unet_apply(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx)

    def unet_apply_taps(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx, capture_taps=True)

    def lgp_apply(v, f, nl):
        return lgp.apply(v, f, nl, train=False)

    def lgp_fused(v, taps, nl, hh, ww):
        return lgp_fused_apply(v, taps, nl, hh, ww, compute_dtype=jnp.bfloat16)

    sched = make_schedule()
    fn = jax.jit(make_sketch_guided_fn(unet_apply, unet_apply_taps, lgp_apply,
                                       sched, steps, lgp_apply_fused=lgp_fused))

    key = jax.random.PRNGKey(0)
    lat0 = jax.random.normal(key, (b, h, w, 4), jnp.float32)
    ctx_u = jax.random.normal(key, (b, 77, 768), jnp.float32) * 0.1
    ctx_c = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768), jnp.float32) * 0.1
    sketch = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 4), jnp.float32)

    args = (unet_vars["params"], lgp_vars, lat0, ctx_u, ctx_c, sketch, 7.5)

    def run_once():
        # NOTE: on the axon TPU tunnel block_until_ready returns before the
        # device finishes — a dependent host fetch is the only reliable sync.
        return float(jnp.sum(fn(*args)))

    run_once()  # warmup / compile

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run_once()
    dt = (time.perf_counter() - t0) / n_iters

    imgs_per_sec = b / dt
    result = {
        "metric": "sketch_guided_512px_50step_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_SKETCH_GUIDED_IMG_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

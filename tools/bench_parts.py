"""Per-part UNet cost breakdown on the TPU: resnet blocks and transformer
blocks at each level's real shape, plus GN+SiLU and tap-capture overhead.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_parts.py [--batch 1]
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


def bench_module(module, inputs, reps, extra=None):
    import numpy as np

    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *inputs))
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes
    )["params"]
    x = jax.random.normal(jax.random.PRNGKey(1), inputs[0].shape, jnp.bfloat16)
    rest = inputs[1:]

    @jax.jit
    def chained(p, x):
        def body(c, _):
            y = module.apply({"params": p}, c, *rest)
            return c + jnp.mean(y).astype(c.dtype) * 1e-20, ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    return timed(chained, (params, x), reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--xfmr-parts", action="store_true",
                   help="break the 64x64 transformer block into sub-ops")
    p.add_argument("--glue", action="store_true",
                   help="up/downsamples, conv_in/out, skip concats")
    args = p.parse_args()
    b = args.batch

    from sketch2img_tpu.models.layers import ResnetBlock
    from sketch2img_tpu.models.unet import SpatialTransformer

    temb = jnp.zeros((b, 1280), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768), jnp.bfloat16)

    # (label, count-per-fwd, module, inputs)
    CASES = [
        # resnets: (spatial, in->out); counts from the SD1.5 plan
        ("res 64x64 320->320", 2, ResnetBlock(320, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 64, 64, 320)), temb)),
        ("res 64x64 960->320", 1, ResnetBlock(320, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 64, 64, 960)), temb)),
        ("res 64x64 640->320", 2, ResnetBlock(320, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 64, 64, 640)), temb)),
        ("res 32x32 320->640", 1, ResnetBlock(640, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 320)), temb)),
        ("res 32x32 640->640", 1, ResnetBlock(640, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 640)), temb)),
        ("res 32x32 1920->640", 1, ResnetBlock(640, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 1920)), temb)),
        ("res 32x32 1280->640", 1, ResnetBlock(640, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 1280)), temb)),
        ("res 32x32 960->640", 1, ResnetBlock(640, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 960)), temb)),
        ("res 16x16 640->1280", 1, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 16, 16, 640)), temb)),
        ("res 16x16 1280->1280", 1, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 16, 16, 1280)), temb)),
        ("res 16x16 2560->1280", 2, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 16, 16, 2560)), temb)),
        ("res 16x16 1920->1280", 1, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 16, 16, 1920)), temb)),
        ("res 8x8 1280->1280", 6, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 8, 8, 1280)), temb)),
        ("res 8x8 2560->1280", 3, ResnetBlock(1280, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 8, 8, 2560)), temb)),
        # transformers (self-attn N tokens + cross-attn 77 + GEGLU FFN)
        ("xfmr 64x64 320", 5,
         SpatialTransformer(320, 8, 768, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 64, 64, 320)), ctx)),
        ("xfmr 32x32 640", 5,
         SpatialTransformer(640, 8, 768, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 32, 32, 640)), ctx)),
        ("xfmr 16x16 1280", 5,
         SpatialTransformer(1280, 8, 768, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 16, 16, 1280)), ctx)),
        ("xfmr 8x8 1280", 1,
         SpatialTransformer(1280, 8, 768, compute_dtype=jnp.bfloat16),
         (jnp.zeros((b, 8, 8, 1280)), ctx)),
    ]

    if args.xfmr_parts:
        from sketch2img_tpu.models.layers import (
            CrossAttention, GEGLUFeedForward, GroupNorm, LayerNorm,
        )
        import flax.linen as nn

        class GNProj(nn.Module):
            dim: int

            @nn.compact
            def __call__(self, x):
                h = GroupNorm(32, 1e-6, name="norm")(x)
                h = nn.Conv(self.dim, (1, 1), dtype=jnp.bfloat16,
                            name="proj_in")(h)
                return h.reshape(x.shape[0], -1, self.dim)

        x320 = jnp.zeros((b, 64, 64, 320))
        tok = jnp.zeros((b, 4096, 320))
        CASES = [
            ("self-attn 4096x320", 1,
             CrossAttention(320, 8, 40, compute_dtype=jnp.bfloat16), (tok,)),
            ("cross-attn 4096x77", 1,
             CrossAttention(320, 8, 40, context_dim=768,
                            compute_dtype=jnp.bfloat16), (tok, ctx)),
            ("ffn 4096x320", 1,
             GEGLUFeedForward(320, compute_dtype=jnp.bfloat16), (tok,)),
            ("gn+proj_in 64x64x320", 1, GNProj(320), (x320,)),
            ("layernorm 4096x320", 3, LayerNorm(), (tok,)),
        ]

    if args.glue:
        from sketch2img_tpu.models.layers import Downsample, GroupNorm, Upsample
        import flax.linen as nn

        class ConvOut(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = GroupNorm(32, 1e-5, name="norm")(x)
                h = nn.silu(h)
                return nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=jnp.bfloat16, name="conv_out")(h)

        CASES = [
            ("down 64->32 320ch", 1,
             Downsample(320, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 64, 64, 320)),)),
            ("down 32->16 640ch", 1,
             Downsample(640, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 32, 32, 640)),)),
            ("down 16->8 1280ch", 1,
             Downsample(1280, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 16, 16, 1280)),)),
            ("up 8->16 1280ch", 1,
             Upsample(1280, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 8, 8, 1280)),)),
            ("up 16->32 1280ch", 1,
             Upsample(1280, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 16, 16, 1280)),)),
            ("up 32->64 640ch", 1,
             Upsample(640, compute_dtype=jnp.bfloat16),
             (jnp.zeros((b, 32, 32, 640)),)),
            ("conv_in 4->320", 1,
             nn.Conv(320, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16),
             (jnp.zeros((b, 64, 64, 4)),)),
            ("gn+silu+conv_out 320->4", 1, ConvOut(),
             (jnp.zeros((b, 64, 64, 320)),)),
        ]

    total = 0.0
    print(f"# batch={b}")
    for label, count, module, inputs in CASES:
        dt = bench_module(module, inputs, args.reps)
        total += dt * count
        print(f"  {label:>22} x{count}: {dt*1e6:8.1f}us  (x{count} = "
              f"{dt*count*1e3:6.3f} ms)", flush=True)
    print(f"# sum of parts: {total*1e3:.3f} ms "
          f"(excl. up/downsamples, conv_in/out, time-embed, final GN)")


if __name__ == "__main__":
    main()

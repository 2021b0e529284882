"""Data-parallel batched generation over the virtual 8-device mesh — the
serving-scale SPMD path (batch axis sharded, params replicated)."""

import numpy as np

import jax
import jax.numpy as jnp

from sketch2img_tpu.core.schedulers import make_schedule
from sketch2img_tpu.parallel import batch_sharding, make_mesh, replicated
from sketch2img_tpu.pipelines.text2img import make_text2img_fn


def test_text2img_data_parallel_matches_single():
    sched = make_schedule()
    ac = sched.alphas_cumprod
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)

    def fake_unet(params, x, t, ctx):
        a = jnp.sqrt(jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1 - jnp.asarray(ac))[t].reshape(-1, 1, 1, 1)
        # per-sample model so DP sharding is non-trivial but deterministic
        return (x - a * jnp.tanh(x * 0.1 + w)) / s

    fn = make_text2img_fn(fake_unet, sched, num_steps=5)
    b = 8
    lat0 = jnp.asarray(rng.randn(b, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((2 * b, 7, 16))

    single = fn({}, lat0, ctx, 7.5)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    jfn = jax.jit(fn)
    lat_sharded = jax.device_put(lat0, batch_sharding(mesh, lat0.ndim))
    ctx_sharded = jax.device_put(ctx, batch_sharding(mesh, ctx.ndim))
    out = jfn({}, lat_sharded, ctx_sharded, 7.5)
    # output keeps the batch sharding and matches the single-device result
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
    assert len(out.sharding.device_set) == 8

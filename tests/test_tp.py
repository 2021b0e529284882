"""Tensor-parallel attention sharding (parallel/tp.py): outputs on a
(data, model) mesh must match the replicated single-device forward, and the
attention projections must actually be distributed over the model axis."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sketch2img_tpu.models.unet import UNet2DCondition, UNetConfig
from sketch2img_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_params_tp,
    tp_param_specs,
)


def _tiny_unet():
    cfg = UNetConfig(
        block_out_channels=(32, 64),
        cross_attn=(True, False),
        num_heads=2,
        cross_attention_dim=24,
    )
    unet = UNet2DCondition(cfg)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 24)),
    )["params"]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4))
    t = jnp.asarray([100, 300, 500, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 24)) * 0.1
    return unet, params, (x, t, ctx)


def test_tp_specs_mark_attention_only():
    _, params, _ = _tiny_unet()
    specs = tp_param_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(params)
    nspec = 0
    for path, _ in flat:
        keys = [p.key for p in path]
        node = specs
        for k in keys:
            node = node[k]
        if any(k in ("to_q", "to_k", "to_v") for k in keys) and keys[-1] == "kernel":
            assert node == P(None, "model"), (keys, node)
            nspec += 1
        elif "to_out" in keys and keys[-1] == "kernel":
            assert node == P("model", None), (keys, node)
            nspec += 1
        else:
            assert node == P(), (keys, node)
    assert nspec > 0


def test_tp_forward_matches_replicated():
    unet, params, (x, t, ctx) = _tiny_unet()

    want = np.asarray(jax.jit(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    )(params, x, t, ctx), np.float32)

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)  # data=4, model=2
    params_tp = shard_params_tp(mesh, params)

    # attention kernels really distributed: >1 addressable shard each
    q_kernel = params_tp["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["kernel"]
    assert len({s.device for s in q_kernel.addressable_shards}) > 1

    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    ts = jax.device_put(t, batch_sharding(mesh, t.ndim))
    cs = jax.device_put(ctx, batch_sharding(mesh, ctx.ndim))
    got = np.asarray(jax.jit(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    )(params_tp, xs, ts, cs), np.float32)

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_flash_shard_map_matches_xla():
    """With the TP context set, qualifying attention runs the Pallas kernel
    per-shard over local heads (interpret mode stands in for TPU) and must
    match the replicated XLA path, forward AND backward."""
    from sketch2img_tpu.ops import flash_attention as fa
    from sketch2img_tpu.ops.attention import (
        multi_head_attention,
        set_tensor_parallel_context,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(k1, (2, 256, 4 * 16))
    k = jax.random.normal(k2, (2, 256, 4 * 16))
    v = jax.random.normal(k3, (2, 256, 4 * 16))

    want = multi_head_attention(q, k, v, 4, backend="xla")
    gw = jax.grad(lambda q: jnp.sum(
        multi_head_attention(q, k, v, 4, backend="xla") ** 2))(q)

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    fa.set_interpret_mode(True)
    set_tensor_parallel_context(mesh)
    try:
        got = multi_head_attention(q, k, v, 4, backend="pallas")
        gg = jax.grad(lambda q: jnp.sum(
            multi_head_attention(q, k, v, 4, backend="pallas") ** 2))(q)
        # heads not divisible by the axis -> falls back, still correct
        q3 = q[..., : 3 * 16]; k3_ = k[..., : 3 * 16]; v3 = v[..., : 3 * 16]
        fb = multi_head_attention(q3, k3_, v3, 3, backend="auto")
        fb_want = multi_head_attention(q3, k3_, v3, 3, backend="xla")
    finally:
        set_tensor_parallel_context(None)
        fa.set_interpret_mode(False)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fb_want),
                               rtol=2e-3, atol=2e-3)


def test_guided_vjp_under_tensor_parallel():
    """VERDICT r2 item 5 / SURVEY §7 hard-part 1: the flagship program —
    make_sketch_guided_fn's vjp through the tapped UNet — must compile and
    run under GSPMD on a (data=4, model=2) mesh with Megatron-sharded
    attention projections, and match the replicated result. This is the
    HBM escape hatch for scaling past one chip; it must not be fictional."""
    from sketch2img_tpu.core.schedulers import make_schedule
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.pipelines.sketch_guided import make_sketch_guided_fn

    # 4-block tiny config so all nine LGP taps exist (tap channels = 480)
    cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                     cross_attn=(True, True, True, False),
                     num_heads=2, cross_attention_dim=32)
    unet = UNet2DCondition(cfg)
    tap_ch = 480
    lgp = LatentEdgePredictor(input_dim=tap_ch + 4 + 36, output_dim=4,
                              num_layers=9)

    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
    params = unet.init(k1, jnp.zeros((1, 16, 16, 4)),
                       jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 7, 32)))["params"]
    lgp_vars = lgp.init(k2, jnp.zeros((1, 16, 16, tap_ch)),
                        jnp.zeros((1, 16, 16, 4)), train=False)

    sched = make_schedule()
    fn = make_sketch_guided_fn(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c,
                                      capture_taps=True),
        lambda v, f, nl: lgp.apply(v, f, nl, train=False),
        sched, num_steps=3,
    )

    b = 4
    lat0 = jax.random.normal(k3, (b, 16, 16, 4))
    uncond = jax.random.normal(k4, (b, 7, 32)) * 0.1
    cond = jax.random.normal(k5, (b, 7, 32)) * 0.1
    target = jax.random.normal(k6, (b, 16, 16, 4))

    want = np.asarray(jax.jit(fn)(params, lgp_vars, lat0, uncond, cond,
                                  target, 7.5), np.float32)

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)  # data=4, model=2
    params_tp = shard_params_tp(mesh, params)
    rep = NamedSharding(mesh, P())
    lgp_tp = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                    lgp_vars)
    args = [jax.device_put(a, batch_sharding(mesh, a.ndim))
            for a in (lat0, uncond, cond, target)]
    got = np.asarray(jax.jit(fn)(params_tp, lgp_tp, *args, 7.5), np.float32)

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

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

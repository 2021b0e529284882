"""Flash-attention kernel correctness (pallas interpret mode on CPU) vs the
fused-XLA reference, including ragged sequence lengths and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.ops import flash_attention as fa
from sketch2img_tpu.ops.attention import multi_head_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.set_interpret_mode(True)
    yield
    fa.set_interpret_mode(False)


@pytest.fixture(autouse=True, params=[True, False],
                ids=["transposed", "classic"])
def kernel_variant(request):
    """Run every kernel test against both the d-major (transposed) kernels
    and the classic layout (what d >= 128 uses)."""
    fa.set_transposed_kernels(request.param)
    yield
    fa.set_transposed_kernels(True)


@pytest.mark.parametrize("b,h,n,d", [
    (1, 2, 256, 40),    # SD 320-ch head dim
    (1, 2, 256, 80),
    (2, 1, 128, 64),
    (1, 2, 300, 64),    # ragged: pads to block boundary, masked tail
])
def test_forward_matches_xla(b, h, n, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, n, d), jnp.float32)
    k = jax.random.normal(k2, (b, h, n, d), jnp.float32)
    v = jax.random.normal(k3, (b, h, n, d), jnp.float32)
    scale = d ** -0.5
    assert fa.supported(q, k, v, None)
    got = fa.flash_attention(q, k, v, scale)
    want = fa._xla_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_cross_attention_shapes():
    # nq != nk (e.g. injected cross-attn over sketch tokens)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(k1, (1, 2, 256, 64), jnp.float32)
    kv = jax.random.normal(k2, (1, 2, 128, 64), jnp.float32)
    got = fa.flash_attention(q, kv, kv, 0.125)
    want = fa._xla_reference(q, kv, kv, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_gradients_match_xla():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (1, 1, 128, 32), jnp.float32)
    k = jax.random.normal(k2, (1, 1, 128, 32), jnp.float32)
    v = jax.random.normal(k3, (1, 1, 128, 32), jnp.float32)
    scale = 32 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(fa._xla_reference(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_backend_routing_uses_kernel():
    """multi_head_attention auto backend must route through the kernel when
    supported (interpret mode stands in for TPU here)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(k1, (1, 256, 64), jnp.float32)
    k = jax.random.normal(k2, (1, 256, 64), jnp.float32)
    v = jax.random.normal(k3, (1, 256, 64), jnp.float32)
    out_auto = multi_head_attention(q, k, v, 2, backend="pallas")
    out_xla = multi_head_attention(q, k, v, 2, backend="xla")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla),
                               rtol=2e-3, atol=2e-3)


def test_block_dispatch_table_lookup():
    """_block_sizes: per-kernel bwd kinds resolve their own entries at the
    tuned (4096, bh<=8) bucket and fall back to the shared "bwd" entry (then
    defaults) elsewhere; blocks never exceed the padded sequence."""
    assert fa._block_sizes(4096, 4096, "fwd", 8) == (4096, 256)
    assert fa._block_sizes(4096, 4096, "bwd_dq", 8) == (2048, 1024)
    assert fa._block_sizes(4096, 4096, "bwd_dkv", 8) == (1024, 1024)
    # bh=16 has no per-kernel split -> shared bwd entry
    assert fa._block_sizes(4096, 4096, "bwd_dq", 16) == fa._block_sizes(
        4096, 4096, "bwd", 16)
    # clip-injection shape lands in the 4608 bucket, not 9216
    assert fa._block_sizes(4096, 4353, "fwd", 128) == (4096, 128)
    # intermediate 640px sizes keep (1024,1024); exact 9216 gets (3072,1024)
    assert fa._block_sizes(6400, 6400, "fwd", 8) == (1024, 1024)
    assert fa._block_sizes(9216, 9216, "fwd", 8) == (3072, 1024)
    # _pad_guard: tuned blocks must not force gross padding off-bucket —
    # 704px (N=7744) falls back to 1024 q-blocks (pad 8192, not 9216), and
    # plain 4225-4608-token self-attention must not inherit the injection
    # bucket's 4096 q-block (pad 8192, not 5120)
    assert fa._block_sizes(7744, 7744, "fwd", 8)[0] == 1024
    assert fa._block_sizes(4489, 4489, "fwd", 8)[0] == 1024
    # 9216 bucket: per-kernel kinds fall back to the shared bwd entry
    assert fa._block_sizes(9216, 9216, "bwd_dkv", 8) == fa._block_sizes(
        9216, 9216, "bwd", 8)
    # beyond the largest bucket -> defaults, capped to the padded sequence
    bq, bk = fa._block_sizes(256, 256, "fwd", 8)
    assert bq <= 256 and bk <= 256
    # force_block_sizes overrides everything (bench/sweep hook)
    fa.force_block_sizes((512, 512))
    try:
        assert fa._block_sizes(4096, 4096, "bwd_dq", 8) == (512, 512)
    finally:
        fa.force_block_sizes(None)


def test_short_kv_supported_but_not_preferred():
    """Short KV is a correctness-supported shape (explicit pallas backend
    works) but the auto backend keeps XLA there — measured faster on v5e
    (see preferred() docstring)."""
    q = jnp.zeros((1, 8, 4096, 40))
    k77 = jnp.zeros((1, 8, 77, 40))
    v77 = k77
    assert fa.supported(q, k77, v77, None)
    assert not fa.preferred(q, k77, v77, None)
    k4k = jnp.zeros((1, 8, 4096, 40))
    assert fa.preferred(q, k4k, k4k, None)


@pytest.mark.parametrize("nk", [77, 33])
def test_short_kv_cross_attention(nk):
    """Cross-attention shapes (nq image tokens, nk=77 text tokens): the
    padded key tail must be masked exactly, forward and backward."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(k1, (1, 2, 256, 40), jnp.float32)
    k = jax.random.normal(k2, (1, 2, nk, 40), jnp.float32)
    v = jax.random.normal(k3, (1, 2, nk, 40), jnp.float32)
    scale = 40 ** -0.5
    assert fa.supported(q, k, v, None)

    out = fa.flash_attention(q, k, v, scale)
    want = fa._xla_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    gf = jax.grad(lambda q, k, v: jnp.sum(
        fa.flash_attention(q, k, v, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        fa._xla_reference(q, k, v, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_kv_len_masks_padded_tail_fwd_bwd():
    """Pre-padded keys + kv_len must equal attention over the unpadded keys
    (the clip-injection path pads [4096 image; 257 CLIP] keys to a 128
    multiple so the kernel skips its HBM pad copies) — values and grads,
    flash (interpret) and the xla fallback."""
    import numpy as np

    from sketch2img_tpu.ops import attention as attn

    b, h, nq, nk, d = 1, 2, 256, 300, 40
    pad = -nk % 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, nq, h * d))
    k = jax.random.normal(kk, (b, nk, h * d))
    v = jax.random.normal(kv, (b, nk, h * d))
    garbage = 37.0 + jax.random.normal(kg, (b, pad, h * d))
    kp = jnp.concatenate([k, garbage], axis=1)
    vp = jnp.concatenate([v, garbage], axis=1)

    def f(be, padded):
        def loss(q, k, v):
            out = attn.multi_head_attention(
                q, k, v, h, backend=be,
                kv_len=nk if padded else None)
            return jnp.sum(jnp.sin(out)), out
        (l, out), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                         has_aux=True)(q, kp if padded else k,
                                                       vp if padded else v)
        return out, g

    want, gwant = f("xla", False)
    for be in ("xla", "pallas"):
        if be == "pallas":
            fa.set_interpret_mode(True)
        try:
            got, ggot = f(be, True)
        finally:
            fa.set_interpret_mode(False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # dq matches; dk/dv match on the true rows, zero on the pad tail
        np.testing.assert_allclose(np.asarray(ggot[0]), np.asarray(gwant[0]),
                                   rtol=3e-5, atol=3e-5)
        for gi in (1, 2):
            np.testing.assert_allclose(np.asarray(ggot[gi][:, :nk]),
                                       np.asarray(gwant[gi]),
                                       rtol=3e-5, atol=3e-5)
            np.testing.assert_allclose(np.asarray(ggot[gi][:, nk:]), 0.0,
                                       atol=1e-6)

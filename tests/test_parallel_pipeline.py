"""Distributed inference through the PUBLIC pipeline API:
``SketchGuidedPipeline(components, mesh=...)`` must run every program SPMD
over a (data, model) mesh — batch sharded over ``data`` (with exact
per-image-seed padding for non-divisible batches), attention projections
Megatron-sharded over ``model`` — and reproduce the single-device results.
The reference serves on exactly one GPU (SURVEY §2.3); this is the
TPU-native scale-out the mesh API exists for, now reachable from
``apps/serve.py --data_parallel/--model_parallel``."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fakes import FakeTokenizer
from sketch2img_tpu.models.clip_text import CLIPTextConfig
from sketch2img_tpu.models.lgp import LatentEdgePredictor
from sketch2img_tpu.models.unet import UNetConfig
from sketch2img_tpu.models.vae import VAEConfig
from sketch2img_tpu.parallel import make_mesh
from sketch2img_tpu.runtime import SDComponents, SketchGuidedPipeline

TAP_CH = 480


def _sketch(seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (128, 128)).astype(np.float32)


@pytest.fixture(scope="module")
def tiny():
    c = SDComponents.random_init(
        compute_dtype=jnp.float32,
        unet_config=UNetConfig(block_out_channels=(32, 32, 64, 64),
                               cross_attn=(True, True, True, False),
                               num_heads=2, cross_attention_dim=32),
        vae_config=VAEConfig(block_out_channels=(32, 64)),
        text_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_layers=2,
                                   num_heads=4),
        random_weights=True,
    )
    c.tokenizer = FakeTokenizer()
    lgp = LatentEdgePredictor(input_dim=TAP_CH + 4 + 36, output_dim=4,
                              num_layers=9)
    c.lgp = lgp
    c.lgp_vars = lgp.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 4, 4, TAP_CH)),
                          jnp.zeros((1, 4, 4, 4)), train=False)
    return c


KW = dict(num_inference_steps=2, width=128, height=128)


def _assert_guided_close(got, want):
    """The guided loop's alpha = |dx|/|g| correction amplifies program-level
    rounding (SPMD vs single-device fusion orders) into ~1e-2 on a few
    percent of pixels — same mechanism as the documented bs2-vs-bs1 drift
    (runtime._sample_target_per docstring). The initial latents and target
    draws are bitwise identical (verified: _init_per_seed[0] ==
    _init_one_seed at B=1), so the trajectory is the same up to rounding:
    tight on average, loosely bounded pointwise."""
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert diff.mean() < 2e-3, diff.mean()
    assert diff.max() < 3e-2, diff.max()


@pytest.fixture(scope="module")
def ref(tiny):
    """Single-device reference results, computed BEFORE any mesh pipeline
    re-places the shared param trees."""
    pipe = SketchGuidedPipeline(tiny)
    return {
        "guided_bs1": pipe("a tree", seed=5, sketch_image=_sketch(0), **KW),
        "guided_11": pipe(["a cat"], seed=[11],
                          sketch_image=[_sketch(1)], **KW),
        "guided_22": pipe(["a dog"], seed=[22],
                          sketch_image=[_sketch(2)], **KW),
        "text_bs1": pipe("a tree", seed=5, **KW),
    }


@pytest.fixture(scope="module")
def dp_pipe(tiny, ref):
    """data=8 mesh pipeline (ref fixture ordering keeps the single-device
    runs ahead of the param re-placement)."""
    return SketchGuidedPipeline(tiny, mesh=make_mesh(jax.devices()[:8]))


def test_dp_bs1_guided_pads_and_matches(dp_pipe, ref):
    """A batch-1 guided request on an 8-way data mesh pads to 8 internally
    (scalar seed == [seed] bitwise at B=1) and returns ONE image matching
    the single-device result."""
    got = dp_pipe("a tree", seed=5, sketch_image=_sketch(0), **KW)
    assert got.shape == ref["guided_bs1"].shape
    _assert_guided_close(got, ref["guided_bs1"])


def test_dp_batch_merges_match_solo(dp_pipe, ref):
    """Per-image (seed, sketch) pairs through the mesh: each padded-batch
    image equals its solo single-device run — the serving merge contract
    survives data sharding."""
    got = dp_pipe(["a cat", "a dog"], seed=[11, 22],
                  sketch_image=[_sketch(1), _sketch(2)], **KW)
    assert got.shape == (2, 128, 128, 3)
    _assert_guided_close(got[0], ref["guided_11"][0])
    _assert_guided_close(got[1], ref["guided_22"][0])
    # discrimination: each image is its OWN request's result, not the
    # other's (catches any seed/sketch misalignment under padding, which
    # would swap trajectories outright rather than add rounding drift)
    own = np.abs(got[0] - ref["guided_11"][0]).mean()
    other = np.abs(got[0] - ref["guided_22"][0]).mean()
    assert own * 10 < other, (own, other)


def test_dp_text2img_matches(dp_pipe, ref):
    got = dp_pipe("a tree", seed=5, **KW)
    np.testing.assert_allclose(got, ref["text_bs1"], atol=2e-3)


def test_dp_scalar_seed_nondivisible_batch_raises(dp_pipe):
    """Padding is only exact in per-image-seed mode; a scalar seed with a
    non-divisible batch > 1 must fail loudly, pointing at seed lists."""
    with pytest.raises(ValueError, match="per-image seeds"):
        dp_pipe(["a", "b"], seed=7, **KW)


def test_dp_divisible_batch_no_padding(dp_pipe):
    """A divisible batch (8 on data=8) needs no padding — scalar seeds
    stay on the reference's one-generator surface."""
    got = dp_pipe(["p"] * 8, seed=9, **KW)
    assert got.shape == (8, 128, 128, 3)


def test_dp_serving_end_to_end(dp_pipe, ref):
    """The HTTP server + micro-batcher over the meshed pipeline: two
    concurrent different-sketch requests merge into ONE pipeline call,
    pad 2 -> 8 across the data mesh, and each client gets its own
    request's image back."""
    import base64
    import http.client
    import io
    import json
    import threading

    from PIL import Image

    from sketch2img_tpu.apps.serve import make_server

    bsrv = make_server(dp_pipe, "127.0.0.1", 0, batch_window_ms=1500,
                       max_batch=2)
    t = threading.Thread(target=bsrv.serve_forever, daemon=True)
    t.start()
    try:
        def b64_of(arr01):
            buf = io.BytesIO()
            Image.fromarray((arr01 * 255).astype(np.uint8)).save(
                buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        results = {}

        def fire(name, seed, sk):
            conn = http.client.HTTPConnection("127.0.0.1",
                                              bsrv.server_port, timeout=600)
            conn.request("POST", "/generate", body=json.dumps({
                "prompt": f"a {name}", "num_inference_steps": 2,
                "width": 128, "height": 128, "seed": seed,
                "sketch_png_b64": b64_of(sk), "response": "json",
            }))
            resp = conn.getresponse()
            results[name] = (resp.status, json.loads(resp.read()))
            conn.close()

        calls0 = bsrv.handler_class.batcher.calls
        t1 = threading.Thread(target=fire, args=("cat", 11, _sketch(1)))
        t2 = threading.Thread(target=fire, args=("dog", 22, _sketch(2)))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results["cat"][0] == 200 and results["dog"][0] == 200
        assert bsrv.handler_class.batcher.calls == calls0 + 1  # merged

        for name, seed, sk in (("cat", 11, _sketch(1)),
                               ("dog", 22, _sketch(2))):
            # the server PNG-decodes the sketch to uint8 — give the solo
            # run the same quantized sketch
            qsk = (sk * 255).astype(np.uint8) / np.float32(255.0)
            solo = dp_pipe([f"a {name}"], seed=[seed],
                           sketch_image=[qsk], **KW)
            got = np.asarray(Image.open(io.BytesIO(base64.b64decode(
                results[name][1]["images"][0])))) / 255.0
            diff = np.abs(got - np.clip(solo[0], 0, 1))
            # uint8 response round-trip + bs2-vs-bs1 guided rounding
            # drift (see _assert_guided_close); identity is what matters
            assert diff.mean() < 4e-3, (name, diff.mean())

        # a scalar-seed batch that doesn't divide the data axis is a 400
        # client error (the fix — per-image seed lists — is client-side),
        # not a 500 from the pipeline's internal ValueError
        conn = http.client.HTTPConnection("127.0.0.1", bsrv.server_port,
                                          timeout=600)
        conn.request("POST", "/generate", body=json.dumps({
            "prompt": ["a", "b", "c"], "num_inference_steps": 2,
            "width": 128, "height": 128, "seed": 7}))
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        assert resp.status == 400, (resp.status, body)
        assert "per-image seeds" in body["error"]
    finally:
        bsrv.shutdown()


def test_guided_vjp_ingredients_spmd_tight_parity(tiny):
    """The guided step's INGREDIENTS — uncond eps, cond eps + taps, LGP
    loss, and the vjp gradient w.r.t. the latents — fp32, data-mesh vs
    single-device at TIGHT tolerance (VERDICT r4 item 7).

    The full one-step latent compare CANNOT be pinned tightly even at one
    step: the alpha = |dx|/|g| correction multiplies the gradient
    DIRECTION by a data-dependent factor, and on random weights legitimate
    SPMD-vs-single program rounding measured 0.12 max latent diff after
    ONE step (same mechanism as the documented bs2-vs-bs1 latent drift,
    runtime._sample_target_per). The quantities below are
    pre-amplification: a real sharding fault — wrong pad-row handling,
    misaligned batch split, missing collective — moves them grossly (O(1)
    relative), while SPMD program rounding stays ~1e-6 relative."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sketch2img_tpu.core.schedulers import get_noise_level
    from sketch2img_tpu.models.unet import concat_taps
    from sketch2img_tpu.parallel.mesh import batch_sharding

    c = tiny

    def ingredients(up, lv, x, ctx_u, ctx_c, target):
        t = jnp.full((x.shape[0],), 301, jnp.int32)
        eps_u = c.unet_apply(up, x, t, ctx_u)

        def loss_fn(xc):
            eps_t, taps = c.unet_apply_taps(up, xc, t, ctx_c)
            nl = get_noise_level(c.schedule, x, t)
            feats = concat_taps(taps, x.shape[1], x.shape[2])
            out = c.lgp_apply(lv, feats, nl)
            return jnp.mean((target - out) ** 2), eps_t

        (loss, eps_t), g = jax.value_and_grad(loss_fn, has_aux=True)(x)
        return eps_u, eps_t, loss, g

    up = jax.tree_util.tree_map(np.asarray, c.unet_params)
    lv = jax.tree_util.tree_map(np.asarray, c.lgp_vars)
    rng = np.random.default_rng(3)
    b, hw = 8, 16
    lat = rng.standard_normal((b, hw, hw, 4)).astype(np.float32)
    ctx_u = (rng.standard_normal((b, 12, 32)) * 0.1).astype(np.float32)
    ctx_c = (rng.standard_normal((b, 12, 32)) * 0.1).astype(np.float32)
    target = rng.standard_normal((b, hw, hw, 4)).astype(np.float32)

    single = jax.jit(ingredients)(up, lv, lat, ctx_u, ctx_c, target)

    mesh = make_mesh(jax.devices()[:8])
    rep = NamedSharding(mesh, P())
    upm = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), up)
    lvm = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), lv)
    shard = lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim))  # noqa: E731
    spmd = jax.jit(ingredients)(upm, lvm, shard(lat), shard(ctx_u),
                                shard(ctx_c), shard(target))

    for name, s, m in zip(("eps_u", "eps_t", "loss", "g"), single, spmd):
        s, m = np.asarray(s), np.asarray(m)
        # scale-aware tight bound: 1e-4 of the quantity's own max magnitude
        tol = 1e-4 * max(np.abs(s).max(), 1e-30)
        np.testing.assert_allclose(m, s, atol=tol, rtol=0, err_msg=name)


def test_tp_pipeline_guided_matches(tiny, ref):
    """(data=4, model=2): Megatron-sharded attention through the public
    pipeline — the SURVEY §7 HBM escape hatch as a user-facing feature,
    not just a pinned fn-level program (tests/test_tp.py)."""
    pipe = SketchGuidedPipeline(
        tiny, mesh=make_mesh(jax.devices()[:8], model_parallel=2))
    got = pipe("a tree", seed=5, sketch_image=_sketch(0), **KW)
    _assert_guided_close(got, ref["guided_bs1"])

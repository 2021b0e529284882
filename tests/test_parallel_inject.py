"""Distributed serving for the CLIP attention-injection route (round-5,
VERDICT r4 item 1): ``ClipGuidedPipeline(components, mesh=...)`` shards the
batch over a data mesh (padding non-divisible batches in the exact
per-image-seed mode) and reproduces single-device results; a model axis > 1
is refused loudly (the injected ``sketch_*`` params are replicated —
merging them into Megatron-sharded base params is an unvalidated program).

Reference surface being extended: /root/reference/modules/clip_guided_inf.py
(single GPU, single image)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fakes import FakeTokenizer
from sketch2img_tpu.apps.clip_guided_inf import ClipGuidedPipeline
from sketch2img_tpu.models.clip_text import CLIPTextConfig
from sketch2img_tpu.models.clip_vision import CLIPVisionConfig
from sketch2img_tpu.models.unet import UNetConfig
from sketch2img_tpu.models.vae import VAEConfig
from sketch2img_tpu.parallel import make_mesh
from sketch2img_tpu.runtime import SDComponents

CLIP_CFG = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                            num_layers=2, num_heads=4, intermediate_size=64)

KW = dict(num_inference_steps=2, width=128, height=128)


def _sketch(seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (64, 64)).astype(np.float32)


def _components():
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
    return c


@pytest.fixture(scope="module")
def stack():
    """(single-device reference results, DP-meshed pipeline). The solo runs
    happen BEFORE the mesh pipeline re-places the shared param trees."""
    c = _components()
    solo = ClipGuidedPipeline(components=c, cast_bf16=False,
                              clip_config=CLIP_CFG)
    ref = {
        "cat": solo("a cat", seed=31, strength=0.3, spimg=_sketch(1), **KW),
        "dog": solo("a dog", seed=32, strength=0.9, spimg=_sketch(2), **KW),
        "plain": solo("a cat", seed=31, strength=0.5, **KW),
    }
    dp = ClipGuidedPipeline(components=c, cast_bf16=False,
                            clip_config=CLIP_CFG,
                            mesh=make_mesh(jax.devices()[:8]))
    return ref, dp


def test_dp_bs1_inject_pads_and_matches(stack):
    """A single inject request on an 8-way data mesh pads to 8 internally
    (scalar seed == [seed] bitwise at B=1) and returns ONE image matching
    the single-device result. Forward-only sampling: no vjp amplification,
    so the bound is the plain program-rounding one (same tolerance as the
    text2img DP pin)."""
    ref, dp = stack
    got = dp("a cat", seed=31, strength=0.3, spimg=_sketch(1), **KW)
    assert got.shape == ref["cat"].shape
    np.testing.assert_allclose(got, ref["cat"], atol=2e-3)


def test_dp_inject_batch_merges_match_solo(stack):
    """Per-image (seed, sketch, strength) through the mesh: each
    padded-batch image equals its solo single-device run — the serving
    merge contract survives data sharding on the injection route."""
    ref, dp = stack
    got = dp(["a cat", "a dog"], seed=[31, 32], strength=[0.3, 0.9],
             spimg=[_sketch(1), _sketch(2)], **KW)
    assert got.shape == (2, 128, 128, 3)
    np.testing.assert_allclose(got[0], ref["cat"], atol=2e-3)
    np.testing.assert_allclose(got[1], ref["dog"], atol=2e-3)
    # discrimination: each image is its OWN request's result (catches
    # seed/sketch/strength misalignment under padding)
    own = np.abs(got[0] - ref["cat"]).mean()
    other = np.abs(got[0] - ref["dog"]).mean()
    assert own * 10 < other, (own, other)


def test_dp_inject_no_sketch(stack):
    """No-sketch inject (zero state, zero scale) works under the mesh."""
    ref, dp = stack
    got = dp("a cat", seed=31, strength=0.5, **KW)
    np.testing.assert_allclose(got, ref["plain"], atol=2e-3)


def test_dp_inject_scalar_seed_nondivisible_batch_raises(stack):
    _, dp = stack
    with pytest.raises(ValueError, match="per-image seeds"):
        dp(["a", "b"], seed=7, **KW)


def test_tp_mesh_refused_loudly():
    """model axis > 1 must be refused at construction — the operational
    guard apps/serve.py relies on (its --model_parallel combination exits
    before building the pipeline; a direct construction fails here)."""
    c = _components()
    with pytest.raises(ValueError, match="data-parallel meshes only"):
        ClipGuidedPipeline(components=c, cast_bf16=False,
                           clip_config=CLIP_CFG,
                           mesh=make_mesh(jax.devices()[:8],
                                          model_parallel=2))

"""Flax -> torch export parity (core/export.py).

The reference ecosystem exchanges torch state dicts: edge_predictor.pt
(trainer.py:279), sketch_attn_model.pt / sketch_encoder_model.pt
(clip_guided_trainer.py:263-264). These tests pin that our exporters emit
EXACTLY those key inventories (vs the committed manifests) and are bitwise
inverses of the ingestion converters, and that reference-trained .pt files
load back through the strict manifest-checked path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketch2img_tpu.core import export as ex
from sketch2img_tpu.core.manifest import (
    ConversionError,
    DEFAULT_IGNORE,
    diff_keys,
    load_manifest,
    strict_convert,
    zeros_state_dict,
)
from sketch2img_tpu.models.lgp import LatentEdgePredictor, convert_torch_lgp
from sketch2img_tpu.models.unet import SD15_CONFIG, UNet2DCondition, UNetConfig


def tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, va in flat_a:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(flat_b[path]), err_msg=str(path))


TINY_INJ = UNetConfig(block_out_channels=(32, 64), cross_attn=(True, True),
                      num_heads=2, cross_attention_dim=24, layers_per_block=1,
                      injection="clip", injection_context_dim=40)


@pytest.fixture(scope="module")
def tiny_inj_params():
    from sketch2img_tpu.models.unet import num_transformer_blocks
    from sketch2img_tpu.train.train_attn_inject import split_injection_params

    unet = UNet2DCondition(TINY_INJ)
    n = num_transformer_blocks(TINY_INJ)
    states = [jnp.ones((1, 5, 40))] * n
    params = unet.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)),
                       jnp.array([3]), jnp.ones((1, 7, 24)),
                       injection_states=states)["params"]
    return split_injection_params(params)[1]


# ---------------------------------------------------------------- LGP ----


def test_lgp_export_matches_manifest_and_roundtrips():
    lgp = LatentEdgePredictor()  # full published size — it's a small MLP
    variables = lgp.init(jax.random.PRNGKey(1), jnp.ones((2, 9280)),
                         jnp.ones((2, 4)), train=False)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.random.default_rng(0).normal(
            size=x.shape), x.dtype), variables)

    sd = ex.lgp_to_torch_state(variables)
    manifest = load_manifest("edge_predictor")
    missing, unexpected = diff_keys(manifest, sd, ignore=())
    assert not missing and not unexpected, (missing, unexpected)
    for k, shape in manifest.items():
        assert list(sd[k].shape) == shape, k

    params, stats = strict_convert(convert_torch_lgp, sd, what="export")
    tree_equal({"params": params, "batch_stats": stats}, variables)


# ---------------------------------------------------------------- SAT ----


def test_sat_roundtrip_tiny(tiny_inj_params):
    sd = ex.sat_to_torch_state(tiny_inj_params, TINY_INJ)
    back = strict_convert(ex.convert_torch_sat, sd, TINY_INJ, what="sat")
    tree_equal(back, tiny_inj_params)


def test_sat_sketch_variant_has_no_proj(tiny_inj_params):
    """The sketch variant's SAT modules carry no sketch_proj
    (sketch_guided_attn.py:61-64) — export drops it, import tolerates it."""
    import flax.traverse_util as tu

    flat = {k: v for k, v in tu.flatten_dict(tiny_inj_params).items()
            if "sketch_proj" not in k}
    no_proj = tu.unflatten_dict(flat)
    sd = ex.sat_to_torch_state(no_proj, TINY_INJ)
    assert not any("sketch_proj" in k for k in sd)
    back = strict_convert(ex.convert_torch_sat, sd, TINY_INJ, what="sat")
    tree_equal(back, no_proj)


def test_sat_manifest_zeros_load_strict_and_reexport():
    """The committed sketch_attn_model.pt inventory loads with every key
    consumed at SD1.5 scale, and re-exports to the identical inventory."""
    manifest = load_manifest("sat_sd15")
    sd15_inj = dataclasses.replace(SD15_CONFIG, injection="clip")
    tree = strict_convert(ex.convert_torch_sat, zeros_state_dict(manifest),
                          sd15_inj, what="sat_sd15")

    # cross-check vs the actual SD1.5 injected UNet's trainable subtree
    # (eval_shape: zero FLOPs at 860M params)
    from sketch2img_tpu.models.unet import num_transformer_blocks
    from sketch2img_tpu.train.train_attn_inject import split_injection_params

    unet = UNet2DCondition(sd15_inj)
    n = num_transformer_blocks(sd15_inj)
    shapes = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)),
                          jnp.ones((1,), jnp.int32), jnp.ones((1, 77, 768)),
                          injection_states=[jnp.ones((1, 5, 1024))] * n))
    want = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(
                split_injection_params(shapes["params"])[1])}
    got = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
           jax.tree_util.tree_leaves_with_path(tree)}
    assert got == want

    sd = ex.sat_to_torch_state(tree, sd15_inj)
    missing, unexpected = diff_keys(manifest, sd, ignore=())
    assert not missing and not unexpected, (missing, unexpected)
    for k, shape in manifest.items():
        assert list(sd[k].shape) == shape, k


def test_sat_renamed_key_fails_loudly():
    manifest = load_manifest("sat_sd15")
    sd = zeros_state_dict(manifest)
    k = sorted(sd)[0]
    sd[k + "_renamed"] = sd.pop(k)
    with pytest.raises(ConversionError):
        strict_convert(ex.convert_torch_sat, sd,
                       dataclasses.replace(SD15_CONFIG, injection="clip"),
                       what="sat_sd15")


# -------------------------------------------------------- CLIP vision ----


def _tiny_vision():
    from sketch2img_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=64)
    enc = CLIPVisionEncoder(config=cfg)
    params = enc.init(jax.random.PRNGKey(2),
                      jnp.ones((1, 28, 28, 3)))["params"]
    return cfg, params


def test_clip_vision_roundtrip_tiny():
    from sketch2img_tpu.models.clip_vision import convert_torch_clip_vision

    cfg, params = _tiny_vision()
    sd = ex.clip_vision_to_torch_state(params, num_layers=cfg.num_layers)
    back = strict_convert(convert_torch_clip_vision, sd, cfg.num_layers,
                          ignore=DEFAULT_IGNORE + ("*post_layernorm*",),
                          what="clip_vision")
    tree_equal(back, params)
    np.testing.assert_array_equal(
        sd["vision_model.post_layernorm.weight"], 1.0)  # identity fill


def test_clip_vision_export_matches_manifest():
    """Manifest zeros -> converter -> exporter reproduces the committed
    sketch_encoder_model.pt inventory (transposes are numpy views — the
    full ViT-L/14 'materializes' lazily)."""
    from sketch2img_tpu.models.clip_vision import convert_torch_clip_vision

    manifest = load_manifest("clip_vision_l14")
    params = strict_convert(
        convert_torch_clip_vision, zeros_state_dict(manifest), 24,
        ignore=DEFAULT_IGNORE + ("*post_layernorm*",), what="clip_vision_l14")
    sd = ex.clip_vision_to_torch_state(params, num_layers=24)
    missing, unexpected = diff_keys(manifest, sd)  # position_ids optional
    assert not missing and not unexpected, (missing, unexpected)
    for k, shape in manifest.items():
        if k in sd:
            assert list(sd[k].shape) == shape, k


# ----------------------------------------------------------- .pt IO ----


def test_pt_files_load_through_pipeline_loaders(tmp_path, tiny_inj_params):
    """torch.save round trip through the app-level loaders — the exact
    files a reference user brings over (clip_guided_inf.py:47-51)."""
    torch = pytest.importorskip("torch")  # noqa: F841  [convert] extra
    from sketch2img_tpu.apps.clip_guided_inf import (
        load_attn_weights,
        load_clip_weights,
    )

    attn_pt = str(tmp_path / "sketch_attn_model.pt")
    ex.save_torch_state(attn_pt, ex.sat_to_torch_state(tiny_inj_params,
                                                       TINY_INJ))
    tree_equal(load_attn_weights(attn_pt, TINY_INJ), tiny_inj_params)

    cfg, params = _tiny_vision()
    clip_pt = str(tmp_path / "sketch_encoder_model.pt")
    ex.save_torch_state(clip_pt,
                        ex.clip_vision_to_torch_state(params, cfg.num_layers))
    tree_equal(load_clip_weights(clip_pt, cfg.num_layers), params)

"""Auto-remat policy (core/memory.py): the runtime must pick UNet
rematerialization per (batch, H, W) by itself — the reference simply OOMs
on CUDA past the card size (app.py:188-193); here big guided requests flip
remat instead of failing, and the image is the same either way."""

import numpy as np
import pytest

from sketch2img_tpu.core import memory


def test_estimate_monotonic():
    base = memory.estimate_guided_gib(1, 512, 512, False)
    assert memory.estimate_guided_gib(2, 512, 512, False) > base
    assert memory.estimate_guided_gib(1, 1024, 1024, False) > base
    # remat exists to spend less: at any size its estimate must be lower
    for b, s in [(1, 512), (2, 1024), (8, 768)]:
        assert (memory.estimate_guided_gib(b, s, s, True)
                < memory.estimate_guided_gib(b, s, s, False))


def test_choose_remat_flips_on_budget():
    est = memory.estimate_guided_gib(2, 1024, 1024, False)
    assert not memory.choose_remat(2, 1024, 1024, budget_gib=est / 0.92 * 1.1)
    assert memory.choose_remat(2, 1024, 1024, budget_gib=est / 0.92 * 0.9)


def test_hbm_env_override(monkeypatch):
    monkeypatch.setenv("SKETCH2IMG_HBM_GIB", "3.25")
    assert memory.device_hbm_gib() == 3.25
    monkeypatch.delenv("SKETCH2IMG_HBM_GIB")
    assert memory.device_hbm_gib() > 0


def test_fit_recovers_linear_table():
    """fit_from_calibration must reproduce (base, slope) from an exactly
    linear synthetic calibration, per remat setting."""
    true = {False: (4.0, 70.0), True: (4.5, 20.0)}
    rows = []
    for flag, (b0, sl) in true.items():
        for size, batch in [(512, 1), (512, 8), (768, 4), (1024, 2)]:
            mpix = batch * (size // 8) ** 2 / 2**20
            rows.append((size, batch, flag, b0 + sl * mpix))
    bases, slopes = memory.fit_from_calibration(rows)
    for flag, (b0, sl) in true.items():
        assert bases[flag] == pytest.approx(b0, abs=1e-6)
        assert slopes[flag] == pytest.approx(sl, rel=1e-6)


def test_constants_match_committed_calibration():
    """The runtime constants must be exactly the fit of the committed
    v5e calibration table — catches someone editing one without the
    other (regenerate both via tools/calibrate_remat.py)."""
    bases, slopes = memory.fit_from_calibration(memory.CALIBRATION)
    for flag in (False, True):
        assert memory._BASE_GIB[flag] == pytest.approx(bases[flag], abs=0.005)
        assert memory._SLOPE_GIB_PER_MPIX[flag] == pytest.approx(
            slopes[flag], abs=0.05)


def test_fit_is_upper_envelope_of_calibration():
    """No measured calibration row may sit above the stored fitted line —
    the estimator must never under-predict a measured case (ADVICE r3:
    the old min-base fit left 512px/bs8 ~0.2 GiB over and leaned on
    choose_remat's headroom to absorb it)."""
    for size, batch, remat, total in memory.CALIBRATION:
        est = memory.estimate_guided_gib(batch, size, size, remat)
        assert total <= est + 1e-9, (size, batch, remat, total, est)


def test_measured_cases_fit_v5e_without_remat():
    """The calibration itself proves VERDICT item 10's acceptance cases:
    1024px bs2 and 768px bs4 guided fit v5e HBM with remat OFF (measured
    8.3 / 8.9 GiB vs the 15.7 GiB budget), so the policy must not flip."""
    assert not memory.choose_remat(2, 1024, 1024, budget_gib=15.7)
    assert not memory.choose_remat(4, 768, 768, budget_gib=15.7)
    # ... and a case past the measured range must flip (conservative fit)
    assert memory.choose_remat(8, 1024, 1024, budget_gib=15.7)


def test_pipeline_auto_remat_same_image(monkeypatch):
    """The pipeline's auto choice must be observable (last_remat) and the
    rematted program must produce the same image (remat only changes where
    activations are recomputed)."""
    from sketch2img_tpu.runtime import SketchGuidedPipeline

    # tiny stack, mirroring test_runtime.tiny_components (module-scoped
    # fixture there; rebuilt here to keep files independent)
    import jax
    import jax.numpy as jnp
    from fakes import FakeTokenizer
    from sketch2img_tpu.models.clip_text import CLIPTextConfig
    from sketch2img_tpu.models.lgp import LatentEdgePredictor
    from sketch2img_tpu.models.unet import UNetConfig
    from sketch2img_tpu.models.vae import VAEConfig
    from sketch2img_tpu.runtime import SDComponents

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
    lgp = LatentEdgePredictor(input_dim=480 + 4 + 36, output_dim=4,
                              num_layers=9)
    c.lgp = lgp
    c.lgp_vars = lgp.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 4, 4, 480)), jnp.zeros((1, 4, 4, 4)),
                          train=False)

    pipe = SketchGuidedPipeline(c)
    sketch = np.zeros((128, 128), np.float32)
    sketch[30:90, 60:70] = 1.0
    kw = dict(num_inference_steps=2, width=128, height=128, seed=5,
              sketch_image=sketch)

    # plenty of budget -> auto picks the plain program
    monkeypatch.setenv("SKETCH2IMG_HBM_GIB", "1000")
    img_plain = pipe("a tree", **kw)
    assert pipe.last_remat is False

    # starve the budget -> auto flips remat on; the image is unchanged up
    # to fusion-order rounding
    monkeypatch.setenv("SKETCH2IMG_HBM_GIB", "0.01")
    img_remat = pipe("a tree", **kw)
    assert pipe.last_remat is True
    np.testing.assert_allclose(img_remat, img_plain, atol=2e-3)

    # explicit override beats the policy
    img_forced = pipe("a tree", **kw, remat=False)
    assert pipe.last_remat is False
    np.testing.assert_array_equal(img_forced, img_plain)

"""VAE golden parity vs the torch mirror (encode moments + decode),
including the 0.18215 scaling semantics (app.py:109, pipeline.py:166)."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.core.convert import convert_torch_vae  # noqa: E402
from sketch2img_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latent  # noqa: E402

from torch_sd_mirror import TorchMiniVAE  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    golden = TorchMiniVAE(block_out=(32, 64), layers=2, latent=4).eval()
    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=2)
    params = convert_torch_vae(golden.state_dict(), cfg)
    vae = AutoencoderKL(cfg)
    return golden, vae, params


def test_encode_parity(pair):
    golden, vae, params = pair
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        moments = golden.encode(x).numpy()
    want_mean, want_logvar = np.split(moments, 2, axis=1)

    mean, logvar = jax.jit(
        functools.partial(vae.apply, {"params": params}, method=AutoencoderKL.encode)
    )(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), want_mean, rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2),
        np.clip(want_logvar, -30, 20),
        rtol=1e-3,
        atol=2e-4,
    )


def test_decode_parity(pair):
    golden, vae, params = pair
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        want = golden.decode(z).numpy()
    got = jax.jit(
        functools.partial(vae.apply, {"params": params}, method=AutoencoderKL.decode)
    )(jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-3, atol=2e-4
    )


def test_sample_latent_scaling():
    mean = jnp.ones((1, 2, 2, 4))
    logvar = jnp.zeros((1, 2, 2, 4))
    noise = jnp.full((1, 2, 2, 4), 0.5)
    z = sample_latent(mean, logvar, noise)
    np.testing.assert_allclose(np.asarray(z), (1.0 + 0.5) * 0.18215, rtol=1e-6)


def test_encode_decode_roundtrip_shape(pair):
    golden, vae, params = pair
    x = jnp.zeros((1, 32, 32, 3))
    mean, logvar = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 16, 16, 4)  # one downsample for 2-block config
    out = vae.apply({"params": params}, mean, method=AutoencoderKL.decode)
    assert out.shape == (1, 32, 32, 3)

"""LGP golden-parity tests against a torch implementation of the documented
architecture (Linear 9320->512->256->128->64->4 with ReLU+BatchNorm1d,
latent_predictor.py:15-45), including the w-major flatten round-trip."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.models.lgp import LatentEdgePredictor, convert_torch_lgp  # noqa: E402


IN_DIM, OUT_DIM, NPOS = 72, 4, 9  # tiny stand-in for 9320/4/9 (same math)


def _torch_lgp(input_dim, output_dim):
    layers = torch.nn.Sequential(
        torch.nn.Linear(input_dim, 512),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(512),
        torch.nn.Linear(512, 256),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(256),
        torch.nn.Linear(256, 128),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(128),
        torch.nn.Linear(128, 64),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(64),
        torch.nn.Linear(64, output_dim),
    )
    return torch.nn.ModuleDict({"layers": layers})


def _torch_forward(model, x_nchw, t_nchw, num_layers=NPOS):
    # literal latent_predictor.py:37-45 (w-major flatten), minus fp16 cast
    pos_elem = [torch.sin(2 * math.pi * t_nchw * (2 ** -l)) for l in range(num_layers)]
    pos_encoding = torch.cat(pos_elem, dim=1)
    x = torch.cat((x_nchw, t_nchw, pos_encoding), dim=1)
    b, c, h, w = x.shape
    x = x.permute(0, 3, 2, 1).reshape(b * w * h, c)  # b c h w -> (b w h) c
    return model["layers"](x), (b, h, w)


@pytest.fixture(scope="module")
def golden():
    torch.manual_seed(0)
    model = _torch_lgp(IN_DIM + 4 + 4 * NPOS, OUT_DIM)
    # randomize running stats so eval-mode BN is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_eval_parity_with_torch(golden):
    rng = np.random.RandomState(0)
    b, h, w = 2, 5, 3
    x = rng.randn(b, IN_DIM, h, w).astype(np.float32)
    t = rng.randn(b, 4, h, w).astype(np.float32)

    with torch.no_grad():
        want_flat, (tb, th, tw) = _torch_forward(golden, torch.from_numpy(x), torch.from_numpy(t))
    # reference inverse: (b w h) c -> b c h w  (pipeline.py:156)
    want = want_flat.reshape(tb, tw, th, OUT_DIM).permute(0, 3, 2, 1).numpy()

    params, stats = convert_torch_lgp(golden.state_dict())
    lgp = LatentEdgePredictor(input_dim=IN_DIM + 4 + 4 * NPOS, output_dim=OUT_DIM, num_layers=NPOS)
    # NHWC in, NHWC out — per-pixel map, no flatten needed
    got = lgp.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t.transpose(0, 2, 3, 1)),
        train=False,
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=2e-4, atol=2e-5)


def test_train_mode_batch_stats(golden):
    """Train-mode BN uses batch statistics over every pixel — order-invariant,
    so NHWC per-pixel application must equal torch's flattened version."""
    rng = np.random.RandomState(1)
    b, h, w = 2, 4, 4
    x = rng.randn(b, IN_DIM, h, w).astype(np.float32)
    t = rng.randn(b, 4, h, w).astype(np.float32)

    golden.train()
    try:
        with torch.no_grad():
            want_flat, _ = _torch_forward(golden, torch.from_numpy(x), torch.from_numpy(t))
        want = want_flat.reshape(b, w, h, OUT_DIM).permute(0, 3, 2, 1).numpy()
    finally:
        golden.eval()

    params, stats = convert_torch_lgp(golden.state_dict())
    lgp = LatentEdgePredictor(input_dim=IN_DIM + 4 + 4 * NPOS, output_dim=OUT_DIM, num_layers=NPOS)
    got, _ = lgp.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t.transpose(0, 2, 3, 1)),
        train=True,
        mutable=["batch_stats"],
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=5e-4, atol=5e-5)


def test_full_size_init_shapes():
    import jax

    lgp = LatentEdgePredictor()  # 9320 -> 4, 9 octaves (app.py:67)
    variables = lgp.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 2, 9280)),
        jnp.zeros((1, 2, 2, 4)),
        train=False,
    )
    assert variables["params"]["dense_0"]["kernel"].shape == (9320, 512)
    assert variables["params"]["dense_4"]["kernel"].shape == (64, 4)

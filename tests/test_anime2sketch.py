"""anime2sketch golden-parity: the flax generator must reproduce a torch
implementation of the documented pix2pix U-Net (anime2sketch/model.py:5-116)
bit-for-bit after weight conversion."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sketch2img_tpu.models.anime2sketch import (  # noqa: E402
    UnetGenerator,
    convert_torch_anime2sketch,
    binarize_sketch,
)


# -- torch golden model: literal re-statement of the documented architecture --
class TorchSkipBlock(tnn.Module):
    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        use_bias = True  # InstanceNorm2d
        if input_nc is None:
            input_nc = outer_nc
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=use_bias)
        downrelu = tnn.LeakyReLU(0.2, True)
        downnorm = tnn.InstanceNorm2d(inner_nc, affine=False, track_running_stats=False)
        uprelu = tnn.ReLU(True)
        upnorm = tnn.InstanceNorm2d(outer_nc, affine=False, track_running_stats=False)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv] + [submodule] + [uprelu, upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1, bias=use_bias)
            model = [downrelu, downconv] + [uprelu, upconv, upnorm]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1, bias=use_bias)
            model = [downrelu, downconv, downnorm] + [submodule] + [uprelu, upconv, upnorm]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class TorchUnetGenerator(tnn.Module):
    def __init__(self, input_nc, output_nc, num_downs, ngf=64):
        super().__init__()
        block = TorchSkipBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = TorchSkipBlock(ngf * 8, ngf * 8, submodule=block)
        block = TorchSkipBlock(ngf * 4, ngf * 8, submodule=block)
        block = TorchSkipBlock(ngf * 2, ngf * 4, submodule=block)
        block = TorchSkipBlock(ngf, ngf * 2, submodule=block)
        self.model = TorchSkipBlock(output_nc, ngf, input_nc=input_nc,
                                    submodule=block, outermost=True)

    def forward(self, x):
        return self.model(x)


@pytest.mark.parametrize("num_downs,ngf,size", [(6, 4, 64), (8, 2, 256)])
def test_generator_parity(num_downs, ngf, size):
    torch.manual_seed(0)
    golden = TorchUnetGenerator(3, 1, num_downs, ngf).eval()
    x = torch.randn(1, 3, size, size)
    with torch.no_grad():
        want = golden(x).numpy()

    params = convert_torch_anime2sketch(golden.state_dict(), num_downs=num_downs)
    gen = UnetGenerator(3, 1, num_downs, ngf)
    apply = jax.jit(functools.partial(gen.apply, {"params": params}))
    got = np.asarray(apply(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_module_prefix_strip():
    torch.manual_seed(1)
    golden = TorchUnetGenerator(3, 1, 6, 4)
    sd = {f"module.{k}": v for k, v in golden.state_dict().items()}
    params = convert_torch_anime2sketch(sd, num_downs=6)  # model.py:110-115
    assert "downconv" in params["model"]


def test_binarize_semantics():
    raw = jnp.asarray([[0.2, 0.5, 0.51, 0.49]])
    out = np.asarray(binarize_sketch(raw))
    # val = 1-raw -> [0.8, 0.5, 0.49, 0.51]; <0.5 -> 0 else 1 (trainer.py:39-41)
    np.testing.assert_array_equal(out, [[1.0, 1.0, 0.0, 1.0]])

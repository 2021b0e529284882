"""anime2sketch — pix2pix-style U-Net GAN generator for on-the-fly sketch
synthesis from real images.

Reference: /root/reference/anime2sketch/model.py:5-116. 8-down recursive
skip-connection U-Net, 3->1 channels, ngf=64, InstanceNorm (no affine, no
running stats), LeakyReLU(0.2) down / ReLU up, ConvTranspose up, Tanh output.
Published weights: ``netG.pth`` (trainer.py:114).

TPU-first: NHWC layout, channels-last concat for skip connections, explicit
padding matching torch Conv2d(k4,s2,p1) / ConvTranspose2d(k4,s2,p1) exactly
(verified numerically against torch in tests/test_anime2sketch.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False, track_running_stats=False) on NHWC."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class _UpConv(nn.Module):
    """ConvTranspose2d(k4, s2, p1) with the phase-decomposed lowering
    (ops/subpixel.py conv_transpose4x4_s2 — 4x fewer MACs than XLA's
    zero-dilated conv-transpose).  Keeps nn.ConvTranspose's
    ``transpose_kernel=True`` parameter layout (4, 4, Cout, Cin) so the
    netG.pth converter (convt_w below) is unchanged."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sketch2img_tpu.ops.subpixel import conv_transpose4x4_s2

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (4, 4, self.features, cin),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.compute_dtype)
        return conv_transpose4x4_s2(x, kernel.astype(self.compute_dtype), bias)


class UnetSkipBlock(nn.Module):
    """One recursive skip level: x -> [down, submodule, up]; cat skip unless
    outermost (anime2sketch/model.py:35-101)."""

    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Any = None
    outermost: bool = False
    innermost: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(
            self.inner_nc,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=True,  # norm layer is InstanceNorm -> convs keep bias
            dtype=self.compute_dtype,
            name="downconv",
        )(h)
        if not (self.outermost or self.innermost):
            h = _instance_norm(h)
        if self.submodule is not None:
            h = self.submodule(h)
        h = nn.relu(h)
        h = _UpConv(
            self.outer_nc, compute_dtype=self.compute_dtype, name="upconv"
        )(h)
        if self.outermost:
            return nn.tanh(h)
        h = _instance_norm(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """U-Net generator, built innermost-out (anime2sketch/model.py:20-29)."""

    input_nc: int = 3
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        ngf, dt = self.ngf, self.compute_dtype
        block = UnetSkipBlock(ngf * 8, ngf * 8, innermost=True, compute_dtype=dt)
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock(ngf * 8, ngf * 8, submodule=block, compute_dtype=dt)
        block = UnetSkipBlock(ngf * 4, ngf * 8, submodule=block, compute_dtype=dt)
        block = UnetSkipBlock(ngf * 2, ngf * 4, submodule=block, compute_dtype=dt)
        block = UnetSkipBlock(ngf, ngf * 2, submodule=block, compute_dtype=dt)
        self.model = UnetSkipBlock(
            self.output_nc,
            ngf,
            input_nc=self.input_nc,
            submodule=block,
            outermost=True,
            compute_dtype=dt,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,3) in [-1,1]; H,W divisible by 2**num_downs. -> (B,H,W,1)."""
        return self.model(x)


def create_anime2sketch(compute_dtype=jnp.float32) -> UnetGenerator:
    """Hardcoded options parity with anime2sketch/model.py:104-116."""
    return UnetGenerator(3, 1, 8, 64, compute_dtype=compute_dtype)


def binarize_sketch(raw: jnp.ndarray) -> jnp.ndarray:
    """1 - model(x), thresholded at 0.5 — trainer.py:36-44 / generate.py:7-15."""
    val = 1.0 - raw
    return jnp.where(val < 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (netG.pth)
# ---------------------------------------------------------------------------


def convert_torch_anime2sketch(state_dict, num_downs: int = 8) -> dict:
    """Map the recursive torch Sequential key paths onto the flax module tree.

    torch Sequential indices per level (anime2sketch/model.py:69-93):
      outermost: 0=downconv, 1=submodule, 3=upconv
      middle:    1=downconv, 3=submodule, 5=upconv
      innermost: 1=downconv, 3=upconv
    ``module.``-prefix stripping parity: anime2sketch/model.py:110-115.
    """
    import numpy as np

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    if any(k.startswith("module.") for k in state_dict):
        # DataParallel-saved checkpoint (model.py:110-115). Read-through
        # view keeps strict-mode consumption tracking (core/manifest.py).
        from sketch2img_tpu.core.manifest import PrefixStripView

        state_dict = PrefixStripView(state_dict, "module.")

    def conv_w(k):  # torch (O,I,kh,kw) -> flax (kh,kw,I,O)
        return arr(k).transpose(2, 3, 1, 0)

    def convt_w(k):  # torch (I,O,kh,kw) -> flax transpose_kernel (kh,kw,O,I)
        return arr(k).transpose(2, 3, 1, 0)

    def build(prefix: str, level: int) -> dict:
        outermost = level == 0
        innermost = level == num_downs - 1
        if outermost:
            down_i, sub_i, up_i = 0, 1, 3
        elif innermost:
            down_i, sub_i, up_i = 1, None, 3
        else:
            down_i, sub_i, up_i = 1, 3, 5
        out = {
            "downconv": {
                "kernel": conv_w(f"{prefix}.{down_i}.weight"),
                "bias": arr(f"{prefix}.{down_i}.bias"),
            },
            "upconv": {
                "kernel": convt_w(f"{prefix}.{up_i}.weight"),
                "bias": arr(f"{prefix}.{up_i}.bias"),
            },
        }
        if sub_i is not None:
            out["submodule"] = build(f"{prefix}.{sub_i}.model", level + 1)
        return out

    return {"model": build("model.model", 0)}


def load_torch_anime2sketch(path: str, num_downs: int = 8,
                            strict: bool = True) -> dict:
    """Load ``netG.pth`` (trainer.py:114) into Flax params. ``strict``
    (default) errors on missing/unknown keys — the published inventory is
    assets/manifests/netG.json."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if strict:
        from sketch2img_tpu.core.manifest import strict_convert

        return strict_convert(convert_torch_anime2sketch, sd,
                              what="netG", num_downs=num_downs)
    return convert_torch_anime2sketch(sd, num_downs=num_downs)

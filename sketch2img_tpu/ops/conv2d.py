"""3x3 convolution with a measured per-shape lowering dispatch.

The UNet's conv trunk is the single largest block of FLOPs in the model
(the role cuDNN+xformers fusion plays for the reference's dependency stack,
/root/reference/app.py:43 context). On v5e, XLA's native conv lowering sits
1.4-2x off the bf16 FLOP bound for most SD1.5 shapes, and the best lowering
depends on the shape (tools/bench_conv.py, measured bs=2 on v5e):

  * small spatial (<= 16x16), wide channels  -> explicit im2col + one dot
    (e.g. 16^2 1280->1280: 88us vs 125us XLA; 8^2 1280->1280: 44 vs 61)
  * large spatial (>= 32x32)                 -> nine shifted dots accumulated
    (e.g. 64^2 320->320: 142us vs 154us XLA; 32^2 1280->1280: 326 vs 474)
  * strided (downsample) and tiny channels   -> XLA conv
    (e.g. 64^2 320->320 s2: 60us XLA vs 174/218)

``conv3x3`` keeps the exact nn.Conv parameter layout (HWIO kernel, flat
bias) so checkpoint converters are unaffected; all variants are plain XLA
dot/conv programs with well-defined VJPs, so the sketch-guidance backward
(pipeline vjp) and the attention-injection trainer work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

_DEFAULT_BACKEND = "auto"

# Backward-pass note (measured, do not redo): routing the vjp through this
# same dispatch via custom_vjp (dx as a 3x3 conv of the cotangent with the
# flipped/transposed kernel, dw via XLA conv-backprop-filter) was built and
# A/B-measured on v5e — headline guided sampling got SLOWER (0.715 vs 0.741
# img/s). Autodiff of the shift9/im2col lowerings already yields the same
# shifted-dot structure and XLA fuses its pad-accumulate chains better than
# a re-dispatched conv. Plain autodiff is the shipped backward.


def set_default_conv_backend(backend: str) -> None:
    """"auto" (measured dispatch), "xla", "im2col", or "shift9"."""
    global _DEFAULT_BACKEND
    assert backend in ("auto", "xla", "im2col", "shift9"), backend
    _DEFAULT_BACKEND = backend


def _conv_xla(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _pad_input(x, padding):
    (pt, pb), (pl, pr) = padding
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))


def _out_hw(h, w, padding, stride):
    (pt, pb), (pl, pr) = padding
    return (h + pt + pb - 2) // stride, (w + pl + pr - 2) // stride


def _conv_im2col(x, w, stride, padding):
    b, h, w_, cin = x.shape
    cout = w.shape[-1]
    ho, wo = _out_hw(h, w_, padding, stride)
    xp = _pad_input(x, padding)
    cols = [
        jax.lax.slice(
            xp, (0, dy, dx, 0),
            (b, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, cin),
            (1, stride, stride, 1),
        )
        for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, Ho, Wo, 9*Cin)
    return jax.lax.dot_general(
        patches, w.reshape(9 * cin, cout),
        (((3,), (0,)), ((), ())), preferred_element_type=x.dtype,
    )


def _conv_shift9(x, w, stride, padding):
    b, h, w_, cin = x.shape
    cout = w.shape[-1]
    ho, wo = _out_hw(h, w_, padding, stride)
    xp = _pad_input(x, padding)
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            )
            y = jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def _pick_backend(b, h, w, cin, cout, stride) -> str:
    """Measured dispatch (tools/bench_conv.py on v5e at bs 1/2/4/8/16 over
    every SD1.5 conv shape). XLA conv approaches the FLOP bound once the
    batch is large (>= 8 it reaches ~100% MFU on the wide shapes and every
    alternate loses); below that the winner tracks the GEMM row count
    rows = B*H*W: few rows -> one big im2col matmul, mid-range -> nine
    shifted matmuls (no 9x patch materialization), many rows -> XLA conv."""
    if stride != 1 or min(cin, cout) < 64:
        return "xla"
    if b >= 8:
        return "xla"
    rows = b * h * w
    if rows <= 512:
        return "im2col"
    if rows <= 8192:
        return "shift9"
    return "xla"


# --- stride-2 downsample with a phase-decomposed input gradient ----------
#
# XLA lowers the dx of a stride-2 conv as a transposed conv over the
# zero-dilated cotangent, measured at 9-20 TFLOP/s on the SD1.5 downsample
# shapes (device trace: down_{0,1,2}_downsample bwd fusions, 86-109 us each
# per guided step).  Grouping input pixels by parity instead gives four tiny
# convs over the *undilated* cotangent — no multiplies against dilation
# zeros, 9 total taps (1+2+2+4), the FLOP minimum.


def _down2_dx(g, w, pt, pl, x_shape, x_dtype):
    from sketch2img_tpu.ops.subpixel import interleave2x2, tap_dot

    b, h, w_, cin = x_shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho, wo = g.shape[1], g.shape[2]

    def taps(p, pad0):
        # kernel rows ky with (p + pad0 - ky) even; cotangent row offset
        # dy = (p + pad0 - ky) // 2
        return [(ky, (p + pad0 - ky) // 2) for ky in range(3)
                if (p + pad0 - ky) % 2 == 0]

    phases = []
    for p in range(2):
        for q in range(2):
            tk = [(ky, dy, kx, dx)
                  for ky, dy in taps(p, pt) for kx, dx in taps(q, pl)]
            kmat = jnp.concatenate(
                [jnp.transpose(w[ky, kx]) for ky, _, kx, _ in tk], axis=0
            )  # (T*Cout, Cin)
            phases.append(tap_dot(gp, [(dy, dx) for _, dy, _, dx in tk],
                                  kmat, ho, wo))
    y = interleave2x2(phases, ho, wo)
    return y[:, :h, :w_, :].astype(x_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_down2(x, w, padding):
    return _conv_xla(x, w, 2, padding)


def _conv_down2_fwd(x, w, padding):
    return _conv_xla(x, w, 2, padding), (x, w)


def _conv_down2_bwd(padding, res, g):
    x, w = res
    dx = _down2_dx(g, w, padding[0][0], padding[1][0], x.shape, x.dtype)
    _, vjp_w = jax.vjp(lambda w_: _conv_xla(x, w_, 2, padding), w)
    (dw,) = vjp_w(g)
    return dx, dw


_conv_down2.defvjp(_conv_down2_fwd, _conv_down2_bwd)


def conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias=None,
    *,
    stride: int = 1,
    padding=((1, 1), (1, 1)),
    backend: str | None = None,
) -> jnp.ndarray:
    """NHWC 3x3 conv; ``w`` is HWIO (3, 3, Cin, Cout) like nn.Conv."""
    be = backend or _DEFAULT_BACKEND
    if be == "auto":
        be = _pick_backend(x.shape[0], x.shape[1], x.shape[2], x.shape[3],
                           w.shape[-1], stride)
        if (stride == 2 and be == "xla"
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and padding in (((1, 1), (1, 1)), ((0, 1), (0, 1)))):
            y = _conv_down2(x, w, padding)
            return y if bias is None else y + bias.astype(y.dtype)
    y = {"xla": _conv_xla, "im2col": _conv_im2col, "shift9": _conv_shift9}[be](
        x, w, stride, padding
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3))`` with dispatched lowering.

    Identical parameter names/shapes ("kernel" HWIO, "bias") so torch
    converters and existing checkpoints are untouched.
    """

    features: int
    stride: int = 1
    padding: tuple = ((1, 1), (1, 1))
    compute_dtype: jnp.dtype = jnp.float32
    backend: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.compute_dtype)
        return conv3x3(
            x, kernel.astype(self.compute_dtype), bias,
            stride=self.stride, padding=self.padding, backend=self.backend,
        )

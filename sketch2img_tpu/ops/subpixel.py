"""Subpixel (phase-decomposed) lowering of nearest-2x-upsample + 3x3 conv.

The reference's up path runs ``F.interpolate(scale=2, mode="nearest")``
followed by a SAME 3x3 conv (diffusers Upsample2D use_conv=True; consumed at
/root/reference via the stock UNet/VAE, SURVEY.md D1/D2).  On the upsampled
grid each output pixel's 3x3 window covers only a 2x2 patch of *source*
pixels (nearest duplicates rows/cols), so the composite is algebraically
exact as four phase convs with 2x2 kernels over the source image:

  y[2i+p, 2j+q] = sum_{r,c in {0,1}} K[p,q,r,c] . x[i+roff_p[r], j+coff_q[c]]

with the 3x3 taps folded into the phase kernels:

  rows_0 = {0 -> r0, 1 -> r1, 2 -> r1}   (output row 2i:   taps  i-1, i)
  rows_1 = {0 -> r0, 1 -> r0, 2 -> r1}   (output row 2i+1: taps  i, i+1)

FLOPs drop from 9*(2H)(2W)*Cin*Cout to 4*4*H*W*Cin*Cout (2.25x) and the
(2H, 2W, C) nearest-upsampled intermediate is never materialized.  The
interleave back to (2H, 2W) is one transpose-reshape (depth-to-space).

Used by models.layers.Upsample — covers the three UNet up-path convs (hit
three times per guided step: primal + jvp + transpose) and the three large
VAE-decoder upsample convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"


def set_default_upsample_backend(backend: str) -> None:
    """"auto" | "subpixel" | "naive" (nearest-repeat + dispatched conv3x3)."""
    global _DEFAULT_BACKEND
    assert backend in ("auto", "subpixel", "naive"), backend
    _DEFAULT_BACKEND = backend


def _phase_kernels(w: jnp.ndarray) -> list[list[jnp.ndarray]]:
    """Fold the 3x3 kernel into four 2x2 phase kernels.

    K[p][q] has shape (2, 2, Cin, Cout); tap (r, c) multiplies the source
    pixel at (i + roff_p[r], j + coff_q[c]) with roff_0=(-1,0), roff_1=(0,1).

    The fold stays in the kernel's dtype: an fp32 upcast doubles the derived
    weight bytes, and inside the sampling while-loop XLA stages the folded
    tensors into VMEM every iteration — measured at +0.2 ms/step on v5e.
    """
    wf = w
    # index groups: phase 0 -> kernel rows {0} and {1,2}; phase 1 -> {0,1},{2}
    row0 = [wf[0], wf[1] + wf[2]]          # each (3, Cin, Cout)
    row1 = [wf[0] + wf[1], wf[2]]
    out = []
    for rows in (row0, row1):
        row_phases = []
        for cols in ((lambda a: [a[0], a[1] + a[2]]),
                     (lambda a: [a[0] + a[1], a[2]])):
            k = jnp.stack(
                [jnp.stack(cols(r), axis=0) for r in rows], axis=0
            )  # (2, 2, Cin, Cout)
            row_phases.append(k.astype(w.dtype))
        out.append(row_phases)
    return out


_ROFF = ((-1, 0), (0, 1))  # per-phase tap offsets


def tap_dot(xp: jnp.ndarray, taps, kmat: jnp.ndarray, h: int, w: int
            ) -> jnp.ndarray:
    """Shared phase-conv building block: gather ``taps`` = [(dy, dx), ...]
    shifted views of a 1-padded plane ``xp``, concatenate on channels, one
    dot against ``kmat`` (T*Cin, Cout). Used by the subpixel upsample, the
    transposed conv, and conv2d's downsample dx."""
    b, _, _, cin = xp.shape
    cols = [
        jax.lax.slice(xp, (0, 1 + dy, 1 + dx, 0),
                      (b, 1 + dy + h, 1 + dx + w, cin))
        for dy, dx in taps
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, T*Cin)
    return jax.lax.dot_general(
        patches, kmat.astype(patches.dtype),
        (((3,), (0,)), ((), ())), preferred_element_type=patches.dtype,
    )


def interleave2x2(phases, h: int, w: int) -> jnp.ndarray:
    """[p00, p01, p10, p11] of (B, h, w, C) -> (B, 2h, 2w, C) with
    out[2i+p, 2j+q] = phases[2p+q][i, j] (depth-to-space)."""
    b, c = phases[0].shape[0], phases[0].shape[-1]
    y = jnp.stack(phases, axis=3).reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _subpixel(x, w, bias):
    b, h, w_, cin = x.shape
    cout = w.shape[-1]
    ks = _phase_kernels(w)
    taps = lambda p, q: [(_ROFF[p][r], _ROFF[q][c])
                         for r in range(2) for c in range(2)]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ph = [tap_dot(xp, taps(p, q), ks[p][q].reshape(4 * cin, cout), h, w_)
          for p in range(2) for q in range(2)]
    y = interleave2x2(ph, h, w_)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _naive(x, w, bias):
    from sketch2img_tpu.ops.conv2d import conv3x3

    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv3x3(x, w, bias)


_CT_TAPS = ([(1, 0), (3, -1)], [(0, 1), (2, 0)])
# ConvTranspose2d(k=4, s=2, p=1): out[2u+p] = sum_i w[ky] x[i] over
# o = 2i + ky - 1, so phase p takes kernel rows ky with ky = p+1 (mod 2)
# at source offsets di = (p + 1 - ky) // 2.


_CT_BACKEND = "auto"
_CT_PHASE_MAX_ROWS = 65536  # b*h*w source pixels; above this, patch traffic
                            # beats the 4x MAC saving (measured, see below)


def set_conv_transpose_backend(backend: str) -> None:
    """"auto" (measured size dispatch), "xla", or "phase"."""
    global _CT_BACKEND
    assert backend in ("auto", "phase", "xla"), backend
    _CT_BACKEND = backend


def conv_transpose4x4_s2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias=None,
) -> jnp.ndarray:
    """torch ConvTranspose2d(kernel 4, stride 2, pad 1) on NHWC input.

    ``w`` is the flax ``transpose_kernel=True`` parameter, (4, 4, Cout, Cin)
    — torch's (Cin, Cout, kh, kw) transposed by the checkpoint converter
    (models/anime2sketch.py convt_w).  The anime2sketch GAN decoder
    (anime2sketch/model.py:35-101) runs this at 1024^2 inside the LGP
    train step.

    MEASURED (v5e, one process, interleaved, full GAN fwd bs4 1024px):
    the parity-grouped "phase" lowering — exact, 4x fewer MACs than a
    zero-dilated conv — runs 56.5 ms vs 32.8 ms for XLA's
    lax.conv_transpose: XLA does NOT lower conv-transpose naively on TPU,
    and the phase path's (B, H, W, 4*Cin) patch materialization dominates
    at GAN-scale spatial extents.  XLA is therefore the default; the phase
    path stays as an opt-in (it is the right shape for small-spatial
    transposed convs should one appear).
    """
    b, h, w_, cin = x.shape
    cout = w.shape[2]
    be = _CT_BACKEND
    if be == "auto":
        be = "phase" if b * h * w_ <= _CT_PHASE_MAX_ROWS else "xla"
    if be == "xla":
        y = jax.lax.conv_transpose(
            x, w, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
        return y if bias is None else y + bias.astype(y.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = []
    for p in range(2):
        for q in range(2):
            tk = [(ky, dy, kx, dx)
                  for ky, dy in _CT_TAPS[p] for kx, dx in _CT_TAPS[q]]
            kmat = jnp.concatenate(
                [jnp.transpose(w[ky, kx]) for ky, _, kx, _ in tk], axis=0
            )  # (4*Cin, Cout)
            phases.append(tap_dot(xp, [(dy, dx) for _, dy, _, dx in tk],
                                  kmat, h, w_))
    y = interleave2x2(phases, h, w_)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def upsample2x_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias=None,
    *,
    backend: str | None = None,
) -> jnp.ndarray:
    """nearest-2x upsample + SAME 3x3 conv on NHWC input, HWIO kernel."""
    be = backend or _DEFAULT_BACKEND
    if be == "auto":
        # The fold turns 9*Cin*Cout kernel values into 16*Cin*Cout phase
        # values (1.78x weight traffic).  At small source extents the conv is
        # weight-bound, so the 2.25x MAC saving cannot pay for it: measured
        # on v5e, the 8x8->16x16 1280ch upsample loses ~20 us while 16x16+
        # sources win 60-150 us.  Dispatch on the source pixel count.
        be = "subpixel" if x.shape[1] * x.shape[2] >= 256 else "naive"
    return {"subpixel": _subpixel, "naive": _naive}[be](x, w, bias)

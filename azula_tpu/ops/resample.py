r"""Fused resampling + convolution.

`conv3x3(nearest_upsample2(x))` — the UNet up-path (reference
`adm/_src/unet.py:82-109`, `azula/nn/unet.py:248-257`) — is algebraically a
*subpixel* convolution: each of the four output phases `(r, s)` is a 2x2
convolution of the low-resolution input with phase kernels built by summing
3x3 taps that land on the same source pixel. This computes 16 taps at the low
resolution instead of 36 (44% of the FLOPs) and never materializes the
4x-upsampled tensor — a pure win on both MXU time and HBM traffic.
"""

from __future__ import annotations

__all__ = [
    "upsample2_conv3x3",
]

import jax
import jax.numpy as jnp

from jax import Array


def _phase_kernel(w: Array, r: int, s: int) -> Array:
    r"""Builds the (2, 2, C_i, C_o) kernel of output phase `(r, s)` from a
    (3, 3, C_i, C_o) kernel: tap `k` of the 3x3 kernel reads upsampled pixel
    `2p + r + k - 1`, i.e. source pixel `floor((2p + r + k - 1) / 2)`."""

    groups = {
        0: ((0,), (1, 2)),  # phase 0: source p-1 gets tap 0; p gets taps 1+2
        1: ((0, 1), (2,)),  # phase 1: source p gets taps 0+1; p+1 gets tap 2
    }

    gy, gx = groups[r], groups[s]

    return jnp.stack(
        [
            jnp.stack(
                [sum(w[k, l] for k in gy[dy] for l in gx[dx]) for dx in (0, 1)],
                axis=0,
            )
            for dy in (0, 1)
        ],
        axis=0,
    )


def upsample2_conv3x3(x: Array, w: Array, bias: Array | None = None) -> Array:
    r"""Computes `conv3x3_same(nearest_upsample2(x), w)` without materializing
    the upsampled tensor.

    Arguments:
        x: The input, with shape :math:`(B, H, W, C_i)`.
        w: The kernel, HWIO, with shape :math:`(3, 3, C_i, C_o)`.
        bias: An optional bias, with shape :math:`(C_o,)`.

    Returns:
        The output, with shape :math:`(B, 2H, 2W, C_o)`.
    """

    B, H, W, _ = x.shape
    K = w.shape[-1]

    phases = []
    for r in (0, 1):
        for s in (0, 1):
            kern = _phase_kernel(w, r, s).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                x,
                kern,
                window_strides=(1, 1),
                padding=[(1 - r, r), (1 - s, s)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            phases.append(y)

    out = jnp.stack(phases, axis=-2).reshape(B, H, W, 2, 2, K)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * W, K)

    if bias is not None:
        out = out + bias.astype(out.dtype)

    return out

r"""Normalization kernels.

TPU-native replacement for the reference's GroupNorm/SiLU call sites
(`azula/plugins/adm/_src/nn.py:80-87`, `azula/nn/unet.py:78-83`). XLA already
fuses normalization chains well; these helpers keep the math in float32
regardless of the activation dtype (matching the reference's GroupNorm32) and
provide the channels-last group-norm used by the UNet and the ADM port.
"""

from __future__ import annotations

__all__ = [
    "group_norm",
    "group_norm_silu",
]

import jax
import jax.numpy as jnp

from jax import Array


def group_norm(
    x: Array,
    groups: int,
    eps: float = 1e-5,
    scale: Array | None = None,
    bias: Array | None = None,
) -> Array:
    r"""Channels-last group normalization with float32 statistics.

    Arguments:
        x: The input, with shape :math:`(B, *, C)` (channels last).
        groups: The number of groups :math:`G` (must divide :math:`C`).
        eps: A numerical stability term.
        scale: Optional per-channel scale :math:`\gamma`, with shape :math:`(C,)`.
        bias: Optional per-channel bias :math:`\beta`, with shape :math:`(C,)`.

    Returns:
        The normalized tensor, with shape :math:`(B, *, C)`.
    """

    dtype = x.dtype
    B, *spatial, C = x.shape

    assert C % groups == 0, f"channels ({C}) must be divisible by groups ({groups})"

    y = x.astype(jnp.float32).reshape(B, -1, groups, C // groups)

    mean = y.mean(axis=(1, 3), keepdims=True)
    var = y.var(axis=(1, 3), keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)

    y = y.reshape(B, *spatial, C)

    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)

    return y.astype(dtype)


def group_norm_silu(
    x: Array,
    groups: int,
    eps: float = 1e-5,
    scale: Array | None = None,
    bias: Array | None = None,
) -> Array:
    r"""Fused GroupNorm + SiLU (the ADM ResBlock prologue)."""

    y = group_norm(x, groups, eps=eps, scale=scale, bias=bias)

    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)

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

    # Compute float32 statistics per (batch, group), then apply the
    # normalization as one fused multiply-add in the activation dtype: the
    # full-size tensor is never materialized in float32, halving HBM traffic
    # for bf16 activations.
    #
    # The statistics reduce over the *spatial* (major) axes first, keeping the
    # channel (lane) axis intact: reducing a (B, HW, G, C/G) view over its
    # split minor dims forces XLA into layout copies that dominate the UNet
    # profile (measured ~50% of the ADM-256 forward on v5e); the (B, HW, C)
    # -> (B, C) sum/sumsq pair fuses into a single bandwidth-bound pass, and
    # the per-group fold then runs on a tiny (B, C) array.
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # (B, C)
    s2 = jnp.sum(jnp.square(xf), axis=1)  # (B, C)

    n = (x.size // B) // groups
    gs1 = jnp.sum(s1.reshape(B, groups, -1), axis=-1)  # (B, G)
    gs2 = jnp.sum(s2.reshape(B, groups, -1), axis=-1)

    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)

    # Broadcast per-group stats to per-channel (B, C)
    a = jnp.repeat(inv, C // groups, axis=-1)
    b = jnp.repeat(-mean * inv, C // groups, axis=-1)

    if scale is not None:
        a = a * scale.astype(jnp.float32)
        b = b * scale.astype(jnp.float32)
    if bias is not None:
        b = b + bias.astype(jnp.float32)

    shape = (B,) + (1,) * len(spatial) + (C,)
    a = a.reshape(shape).astype(dtype)
    b = b.reshape(shape).astype(dtype)

    return x * a + b


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

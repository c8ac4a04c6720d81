r"""Normalization kernels.

TPU-native replacement for the reference's GroupNorm/SiLU call sites
(`azula/plugins/adm/_src/nn.py:80-87`, `azula/nn/unet.py:78-83`). XLA already
fuses normalization chains well; these helpers keep the math in float32
regardless of the activation dtype (matching the reference's GroupNorm32) and
provide the channels-last group-norm used by the UNet and the ADM port.

The statistics pass is a Pallas TPU kernel on aligned shapes: each program
loads one (S_BLK, C) spatial tile into VMEM *once*, computes its per-channel
mean and **centered** sum of squares in-register, and a tiny XLA fold combines
the block moments with the Chan et al. parallel-variance formula

    M2 = sum_b M2_b + n_b * sum_b (mean_b - mean)^2

whose terms are all O(n * var) — robust to |mean| >> std by construction,
unlike the raw E[x^2] - E[x]^2 fold which cancels catastrophically in float32
(ADVICE r2). The one-pass raw fold costs the same HBM traffic but the robust
*XLA* variants all lose it: a shifted one-pass breaks the reduction fusion
(1.75x the stats pass at 8x256x256x256), a two-pass reads the input twice
(1.28x), and a `lax.cond` lazy recompute gets flattened into executing both
branches (1.36x) — measured in `tools/norm_micro.py`. The VMEM-resident
two-pass has no such trade: one HBM read, exact centering.

The backward is analytic (`custom_vjp` on the statistics): d mean/dx = 1/n and
d var/dx = 2 (x - mean)/n within each group — one fused elementwise pass
instead of differentiating through the reductions.
"""

from __future__ import annotations

__all__ = [
    "group_norm",
    "group_norm_silu",
    "group_stats",
]

import functools

import jax
import jax.numpy as jnp

from jax import Array


def _stats_xla(x: Array, groups: int) -> tuple[Array, Array]:
    r"""Two-pass (mean, then centered sum of squares) fallback — robust at any
    magnitude; used off-TPU and on shapes the kernel does not cover."""

    B, HW, C = x.shape
    n = HW * (C // groups)

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # (B, C)
    mean = jnp.sum(s1.reshape(B, groups, -1), axis=-1) / n  # (B, G)

    mc = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]  # (B, 1, C)
    d2 = jnp.sum(jnp.square(x.astype(jnp.float32) - mc), axis=1)  # (B, C)
    var = jnp.maximum(jnp.sum(d2.reshape(B, groups, -1), axis=-1) / n, 0.0)

    return mean, var


def _stats_block(HW: int, C: int) -> int:
    r"""Spatial tile size: large enough to amortize the grid, small enough
    that the bf16 tile plus its float32 image fit comfortably in VMEM."""

    return min(HW, max(128, (1 << 19) // C))


def _stats_tpu(x: Array, groups: int) -> tuple[Array, Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, HW, C = x.shape
    S_BLK = _stats_block(HW, C)
    nblk = HW // S_BLK
    n = HW * (C // groups)

    def kernel(x_ref, mean_ref, m2_ref):
        xb = x_ref[0].astype(jnp.float32)  # (S_BLK, C)
        mu = jnp.mean(xb, axis=0, keepdims=True)  # (1, C)
        d = xb - mu
        mean_ref[...] = mu[None]
        m2_ref[...] = jnp.sum(d * d, axis=0, keepdims=True)[None]

    mean_bc, m2_bc = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, S_BLK, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nblk, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, C), jnp.float32),
        ],
    )(x)

    # Chan et al. combine on the small (B, nblk, C) partials.
    mg = mean_bc.reshape(B, nblk, groups, -1)
    mean = jnp.mean(mg, axis=(1, 3))  # (B, G) — uniform blocks
    dev = mg - mean[:, None, :, None]
    m2 = jnp.sum(m2_bc.reshape(B, nblk, groups, -1), axis=(1, 3))
    m2 = m2 + S_BLK * jnp.sum(jnp.square(dev), axis=(1, 3))
    var = jnp.maximum(m2 / n, 0.0)

    return mean, var


def _stats_fwd_impl(x: Array, groups: int) -> tuple[Array, Array]:
    B, HW, C = x.shape

    S_BLK = _stats_block(HW, C)
    if (
        jax.default_backend() == "tpu"
        and C % 128 == 0
        and S_BLK % 8 == 0  # sublane alignment (covers odd HW at nblk=1)
        and HW % S_BLK == 0
    ):
        return _stats_tpu(x, groups)

    return _stats_xla(x, groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def group_stats(x: Array, groups: int) -> tuple[Array, Array]:
    r"""Per-(batch, group) float32 (mean, variance) of a channels-last tensor.

    Arguments:
        x: The input, with shape :math:`(B, HW, C)`.
        groups: The number of groups :math:`G` (must divide :math:`C`).

    Returns:
        Arrays ``(mean, var)``, each with shape :math:`(B, G)`.
    """

    return _stats_fwd_impl(x, groups)


def _stats_fwd(x, groups):
    mean, var = _stats_fwd_impl(x, groups)
    return (mean, var), (x, mean)


def _stats_bwd(groups, residuals, cotangents):
    x, mean = residuals
    g_mean, g_var = cotangents

    B, HW, C = x.shape
    n = HW * (C // groups)

    a = jnp.repeat(g_mean / n, C // groups, axis=-1)[:, None, :]  # (B, 1, C)
    b = jnp.repeat(2.0 * g_var / n, C // groups, axis=-1)[:, None, :]
    mc = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]

    gx = a + b * (x.astype(jnp.float32) - mc)

    return (gx.astype(x.dtype),)


group_stats.defvjp(_stats_fwd, _stats_bwd)


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

    # Statistics per (batch, group) — one VMEM-resident Pallas pass on TPU
    # (see module docstring) — then the normalization applied as one fused
    # multiply-add in the activation dtype: the full-size tensor is never
    # materialized in float32, halving HBM traffic for bf16 activations. The
    # channel (lane) axis stays intact throughout: reducing a (B, HW, G, C/G)
    # view over its split minor dims forces XLA into layout copies that
    # dominate the UNet profile (measured ~50% of the ADM-256 forward on v5e).
    mean, var = group_stats(x.reshape(B, -1, C), groups)
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

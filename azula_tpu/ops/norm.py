r"""Normalization kernels.

TPU-native replacement for the reference's GroupNorm/SiLU call sites
(`azula/plugins/adm/_src/nn.py:80-87`, `azula/nn/unet.py:78-83`). XLA already
fuses normalization chains well; these helpers keep the math in float32
regardless of the activation dtype (matching the reference's GroupNorm32) and
provide the channels-last group-norm used by the UNet and the ADM port.

Three statistics implementations, all robust to |mean| >> std (the raw
E[x^2] - E[x]^2 fold cancels catastrophically in float32 — ADVICE r2):

- ``pilot`` (default): a single XLA pass computing *shifted* moments, where
  the shift is a per-channel pilot row (the first spatial element). The shift
  identity is exact for any shift, and every term stays O(n * var). Chosen by
  end-to-end measurement: as a plain XLA reduction it fuses into the producer
  op's epilogue (conv/attention output), so in a full UNet forward its HBM
  cost is near zero. Bench bisect (r4): adm256 1.07 img/s with pilot vs 0.94
  with the Pallas kernel — the kernel forces a materialization boundary the
  fused reduction never pays, outweighing its single-read advantage.
- ``pallas``: a VMEM-resident TPU kernel; each program loads one (S_BLK, C)
  tile *once*, computes per-channel mean and centered sum of squares
  in-register, and a tiny XLA fold combines block moments with the Chan et al.
  parallel-variance formula. Fastest *standalone* (one HBM read, exact
  centering) — use it when the stats input is already materialized (e.g. a
  standalone normalization over loaded data) rather than fused model code.
  The per-block partials are emitted as (B, nblk, 8, C), each program owning
  an aligned (8, C) sublane tile: Mosaic requires the last two block dims to
  be divisible by (8, 128) or equal to the array dims, so a (1, 1, C) block
  over (B, nblk, C) would be illegal at every production nblk > 1 (the r3
  regression).
- ``twopass``: mean pass then centered sum of squares — the reference
  semantics in two reads; numerically the most conservative fallback.

The backward is analytic (`custom_vjp` on the statistics): d mean/dx = 1/n and
d var/dx = 2 (x - mean)/n within each group — one fused elementwise pass
instead of differentiating through the reductions.
"""

from __future__ import annotations

__all__ = [
    "group_norm",
    "group_norm_silu",
    "group_stats",
    "stats_kernel_eligible",
]

import functools

import jax
import jax.numpy as jnp

from jax import Array


def _stats_twopass(x: Array, groups: int) -> tuple[Array, Array]:
    r"""Two-pass (mean, then centered sum of squares): robust at any magnitude,
    at the cost of reading the input twice."""

    B, HW, C = x.shape
    n = HW * (C // groups)

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # (B, C)
    mean = jnp.sum(s1.reshape(B, groups, -1), axis=-1) / n  # (B, G)

    mc = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]  # (B, 1, C)
    d2 = jnp.sum(jnp.square(x.astype(jnp.float32) - mc), axis=1)  # (B, C)
    var = jnp.maximum(jnp.sum(d2.reshape(B, groups, -1), axis=-1) / n, 0.0)

    return mean, var


def _stats_pilot(x: Array, groups: int) -> tuple[Array, Array]:
    r"""Single-pass shifted moments: moments of ``x - pilot`` where the pilot
    is the first spatial row per channel. Exact for any shift, and every term
    of the recombination below is O(n * var), so no catastrophic cancellation.
    As a plain XLA reduction this fuses with the producer of ``x`` — in model
    code the statistics are effectively free (see the module docstring)."""

    B, HW, C = x.shape
    n = HW * (C // groups)

    xf = x.astype(jnp.float32)
    shift = xf[:, :1, :]  # (B, 1, C) pilot per channel
    d = xf - shift
    t1 = jnp.sum(d, axis=1)  # (B, C)
    t2 = jnp.sum(jnp.square(d), axis=1)  # (B, C)

    Kg = shift.reshape(B, groups, -1)  # (B, G, C/G)
    t1g = t1.reshape(B, groups, -1)
    t2g = t2.reshape(B, groups, -1)

    mean = jnp.sum(t1g + HW * Kg, axis=-1) / n  # (B, G)

    # sum (x - mean)^2 = sum d^2 + 2 sum_c e_c t1_c + HW sum_c e_c^2
    # with e_c = K_c - mean (all on the small (B, G, C/G) fold).
    e = Kg - mean[..., None]
    var = (
        jnp.sum(t2g, axis=-1)
        + 2 * jnp.sum(e * t1g, axis=-1)
        + HW * jnp.sum(jnp.square(e), axis=-1)
    ) / n

    return mean, jnp.maximum(var, 0.0)


def _stats_block(HW: int, C: int) -> int | None:
    r"""Spatial tile size: large enough to amortize the grid, small enough
    that the bf16 tile plus its float32 image fit comfortably in VMEM.

    Returns either ``HW`` itself when the whole row fits the VMEM cap (single
    block — block dims equal to the array dims are legal regardless of
    alignment), a multiple-of-8 divisor of ``HW`` under the cap, or ``None``
    when no VMEM-safe tiling exists (e.g. odd ``HW`` beyond the cap): the
    caller must fall back to an XLA path, never a full-row block.
    """

    cap = max(128, (1 << 19) // C)
    if HW <= cap:
        return HW

    # Largest sublane-aligned divisor of HW not exceeding the VMEM cap. The
    # scan is trace-time only (at most cap/8 ~ 512 iterations).
    for s in range(cap - cap % 8, 7, -8):
        if HW % s == 0:
            return s

    return None


def _stats_pallas(x: Array, groups: int) -> tuple[Array, Array]:
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
        m2 = jnp.sum(d * d, axis=0, keepdims=True)  # (1, C)
        # The (8, C) output tile keeps the sublane dim aligned; stats are
        # replicated across its 8 rows and row 0 is read back below.
        mean_ref[0, 0] = jnp.broadcast_to(mu, (8, C))
        m2_ref[0, 0] = jnp.broadcast_to(m2, (8, C))

    mean_bc, m2_bc = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, S_BLK, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, C), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, C), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nblk, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, 8, C), jnp.float32),
        ],
    )(x)

    # Chan et al. combine on the small (B, nblk, C) partials.
    mg = mean_bc[:, :, 0, :].reshape(B, nblk, groups, -1)
    mean = jnp.mean(mg, axis=(1, 3))  # (B, G) — uniform blocks
    dev = mg - mean[:, None, :, None]
    m2 = jnp.sum(m2_bc[:, :, 0, :].reshape(B, nblk, groups, -1), axis=(1, 3))
    m2 = m2 + S_BLK * jnp.sum(jnp.square(dev), axis=(1, 3))
    var = jnp.maximum(m2 / n, 0.0)

    return mean, var


def stats_kernel_eligible(shape: tuple[int, ...]) -> bool:
    r"""Whether the Pallas statistics kernel covers a ``(B, HW, C)`` shape
    (regardless of backend). Exposed so tests can assert the kernel path is
    actually exercised at production shapes rather than silently falling back."""

    B, HW, C = shape
    S_BLK = _stats_block(HW, C)

    return (
        C % 128 == 0
        and S_BLK is not None
        and (S_BLK == HW or (S_BLK % 8 == 0 and HW % S_BLK == 0))
    )


def _stats_fwd_impl(x: Array, groups: int, implementation: str) -> tuple[Array, Array]:
    if implementation == "auto" or implementation == "pilot":
        return _stats_pilot(x, groups)

    if implementation == "twopass":
        return _stats_twopass(x, groups)

    if implementation == "pallas":
        if not stats_kernel_eligible(x.shape):
            return _stats_twopass(x, groups)

        # Dispatch on the platform actually being lowered for (not the process
        # default backend), so jit(..., backend='cpu') on a TPU host — and the
        # CPU test suite — take an XLA path (ADVICE r3).
        return jax.lax.platform_dependent(
            x,
            tpu=functools.partial(_stats_pallas, groups=groups),
            default=functools.partial(_stats_pilot, groups=groups),
        )

    raise ValueError(f"unknown group_stats implementation '{implementation}'")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def group_stats(
    x: Array, groups: int, implementation: str = "auto"
) -> tuple[Array, Array]:
    r"""Per-(batch, group) float32 (mean, variance) of a channels-last tensor.

    Arguments:
        x: The input, with shape :math:`(B, HW, C)`.
        groups: The number of groups :math:`G` (must divide :math:`C`).
        implementation: One of ``'auto'`` (= ``'pilot'``, best end-to-end in
            model code), ``'pilot'``, ``'pallas'`` (best standalone on TPU;
            falls back off-TPU or on uncovered shapes), ``'twopass'``. See the
            module docstring for the measurements behind the default.

    Returns:
        Arrays ``(mean, var)``, each with shape :math:`(B, G)`.
    """

    return _stats_fwd_impl(x, groups, implementation)


def _stats_fwd(x, groups, implementation):
    mean, var = _stats_fwd_impl(x, groups, implementation)
    return (mean, var), (x, mean)


def _stats_bwd(groups, implementation, residuals, cotangents):
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

    # Statistics per (batch, group) — one fused-with-producer XLA pass (see
    # module docstring) — then the normalization applied as one fused
    # multiply-add: the full-size tensor is never materialized in float32,
    # halving HBM traffic for bf16 activations. The channel (lane) axis stays
    # intact throughout: reducing a (B, HW, G, C/G) view over its split minor
    # dims forces XLA into layout copies that dominate the UNet profile
    # (measured ~50% of the ADM-256 forward on v5e).
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
    a = a.reshape(shape)
    b = b.reshape(shape)

    # The affine application runs in float32 *inside* the fused elementwise
    # pass: reads and writes stay in the activation dtype (same HBM traffic,
    # measured cost-free in tools/norm_micro.py), but the x·a + b cancellation
    # — O(|mean|) terms meeting an O(std) result — happens at f32 precision.
    # Applying in bf16 loses ~|mean|·2^-8 of the output, which at ADM
    # activation scales exceeds the normalized std.
    return (x.astype(jnp.float32) * a + b).astype(dtype)


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

r"""Normalization kernels.

TPU-native replacement for the reference's GroupNorm/SiLU call sites
(`azula/plugins/adm/_src/nn.py:80-87`, `azula/nn/unet.py:78-83`). XLA already
fuses normalization chains well; these helpers keep the math in float32
regardless of the activation dtype (matching the reference's GroupNorm32) and
provide the channels-last group-norm used by the UNet and the ADM port.

Statistics implementations, all robust to |mean| >> std (the raw
E[x^2] - E[x]^2 fold cancels catastrophically in float32 — ADVICE r2):

- ``auto`` (default) = ``lazy``: the raw one-pass fold plus a *lazy* exact
  rescue. The raw reductions are pure maps of ``x``, so XLA fuses them into
  the producer op's epilogue and the statistics are nearly free; the mean is
  always exact. The raw variance is accepted only when every group clears a
  conservative cancellation floor (``var > 1e-3 * mean^2``, i.e.
  |mean|/std < ~32, keeping its relative error under ~1e-3); otherwise a
  `lax.cond` branch re-reads ``x`` once and computes the centered second
  moment about the exact mean. Typical model activations never trigger the
  rescue, so the default runs at raw speed with a worst case of two-pass
  cost and two-pass accuracy.
- ``raw``: the bare one-pass E[x^2] - E[x]^2 fold. Fastest by construction,
  but its variance dies below ~eps * mean^2 (the ADVICE-r2 failure). Opt-in
  for users who know their activation scales.
- ``pilot``: a single XLA pass computing *shifted* moments, where the shift
  is a per-channel pilot row (the first spatial element). The shift identity
  is exact for any shift and every term stays O(n * var) — exact at every
  activation scale in one read — but the x-dependent shift operand breaks
  the producer fusion that makes raw/lazy free in model code.

  The full r4 on-chip bisect (BENCH_NOTES): adm256 DDIM-64 runs 1.133 img/s
  with raw, 1.07 with pilot, 0.962 with a raw+subsample-guard hybrid (the
  strided subsample wrecks fusion outright), 0.94 with the Pallas stats
  kernel (a pallas_call can never fuse with an XLA producer), and an
  in-chain conv->gn_silu->conv micro puts even a fully fused two-phase
  Pallas kernel (2 reads + 1 write) at 9.7 ms vs raw's 7.6 ms. ``lazy``
  keeps raw's fusion (its rescue branch is never taken at model scales)
  while restoring exactness where raw would cancel.
- ``guarded``: raw plus a noise-floor detector with a strided-subsample
  rescue — kept for reference; measured both slower than pilot in-model and
  weaker than it numerically, so never dispatched automatically.
- ``pallas``: a VMEM-resident TPU kernel; each program loads one (S_BLK, C)
  tile *once*, computes per-channel mean and centered sum of squares
  in-register, and a tiny XLA fold combines block moments with the Chan et al.
  parallel-variance formula. Fastest *standalone* (one HBM read, exact
  centering) — use it when the stats input is already materialized rather
  than produced by fused model code. The per-block partials are emitted as
  (B, nblk, 8, C), each program owning an aligned (8, C) sublane tile: Mosaic
  requires the last two block dims to be divisible by (8, 128) or equal to
  the array dims, so a (1, 1, C) block over (B, nblk, C) would be illegal at
  every production nblk > 1 (the r3 regression).
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
import os

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


def _stats_guarded(x: Array, groups: int, stride: int = 16) -> tuple[Array, Array]:
    r"""Raw fused moments with a cancellation guard (see module docstring).

    Three fused reductions, all pure maps of ``x`` so they fuse with the
    producer: full-input sum and raw sum of squares, plus shifted moments of a
    ``stride``-subsampled view. The raw variance is kept where it clears its
    float32 noise floor; the subsample estimate replaces it where raw
    cancellation would have destroyed it.
    """

    B, HW, C = x.shape
    n = HW * (C // groups)

    xf = x.astype(jnp.float32)

    # Raw fold: exact mean; variance valid only above the noise floor.
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(jnp.square(xf), axis=1)
    g1 = jnp.sum(s1.reshape(B, groups, -1), axis=-1)
    g2 = jnp.sum(s2.reshape(B, groups, -1), axis=-1)
    mean = g1 / n
    var_raw = g2 / n - jnp.square(mean)

    # Strided-subsample shifted re-estimate (pilot fold on x[:, ::stride]).
    xs = xf[:, ::stride, :]
    m_rows = xs.shape[1]
    m = m_rows * (C // groups)
    shift = xs[:, :1, :]
    d = xs - shift
    t1 = jnp.sum(d, axis=1).reshape(B, groups, -1)
    t2 = jnp.sum(jnp.square(d), axis=1).reshape(B, groups, -1)
    Kg = shift.reshape(B, groups, -1)
    mean_sub = jnp.sum(t1 + m_rows * Kg, axis=-1) / m
    e = Kg - mean_sub[..., None]
    var_sub = (
        jnp.sum(t2, axis=-1)
        + 2 * jnp.sum(e * t1, axis=-1)
        + m_rows * jnp.sum(jnp.square(e), axis=-1)
    ) / m

    # Noise floor: |raw var error| <~ E[x^2] * eps * O(log n); 1e-5 leaves a
    # ~160x margin over eps = 2^-24 while still accepting every activation
    # with |mean|/std < ~300.
    floor = 1e-5 * jnp.square(mean)
    var = jnp.where(var_raw > floor, var_raw, jnp.maximum(var_sub, 0.0))

    return mean, jnp.maximum(var, 0.0)


def _stats_raw(x: Array, groups: int) -> tuple[Array, Array]:
    r"""One-pass raw moments (module docstring): fastest, cancellation-prone."""

    B, HW, C = x.shape
    n = HW * (C // groups)

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(jnp.square(xf), axis=1)
    mean = jnp.sum(s1.reshape(B, groups, -1), axis=-1) / n
    g2 = jnp.sum(s2.reshape(B, groups, -1), axis=-1)

    return mean, jnp.maximum(g2 / n - jnp.square(mean), 0.0)


# Rescue threshold for the lazy fold: recompute exactly whenever any group has
# var <= RESCUE * mean^2, i.e. |mean|/std >= ~32. Every *accepted* raw variance
# then has relative error <= ~log2(n) * eps * (1 + 1/RESCUE) ~ 1e-3 worst case
# (f32 tree-reduction bound), and in the diffusion model zoo the rescue branch
# never fires in practice (GroupNorm inputs are conv outputs with O(1)
# mean/std ratios), so the common-case cost is exactly the raw fold.
_RESCUE_FLOOR = 1e-3

# What 'auto' resolves to. The env override exists for benchmarking bisects
# and for users who have pinned their activation scales (e.g. via the digest
# contract) and want the bare raw fold.
_AUTO_IMPL = os.environ.get("AZULA_GN_STATS", "lazy")


# Below this input size the adaptive lazy fold uses the pilot-shifted pass
# instead of raw + `lax.cond`: a TPU conditional costs ~30 us regardless of
# size, while pilot's only cost is one unfused read of the input — at v5e-class
# HBM bandwidth (~800 GB/s) the two break even around 24 MB. Measured on the
# flagship: per-site conds at ~90 ADM GN sites cost 2.6 ms/step (2.3%); the
# cutoff keeps conds only at the handful of large-spatial sites where they
# protect real bandwidth.
_LAZY_MIN_BYTES = int(os.environ.get("AZULA_GN_LAZY_MIN_BYTES", 1 << 24))


def _stats_lazy(x: Array, groups: int) -> tuple[Array, Array]:
    r"""Adaptive exact statistics (see module docstring).

    Large inputs: raw fused moments with a *lazy* exact rescue. The raw fold
    runs first — a pure reduction of ``x``, so XLA fuses it into the producer
    op's epilogue and the statistics are nearly free. The mean is always exact
    (no cancellation in a plain sum); the variance is kept only if every group
    clears its float32 cancellation floor. Otherwise a `lax.cond` branch
    re-reads ``x`` once and computes the centered second moment about the
    (exact) raw mean — so pathological scales pay one extra HBM read, and
    typical model code pays nothing.

    Small inputs (below ``_LAZY_MIN_BYTES``): the pilot-shifted single pass —
    exact at any scale with no conditional, because a TPU `cond`'s fixed
    ~30 us dispatch exceeds the cost of simply re-reading a small array.

    Under `vmap`, `lax.cond` degrades to `select` (both branches execute):
    still exact, at two-pass cost.
    """

    if x.size * x.dtype.itemsize < _LAZY_MIN_BYTES:
        return _stats_pilot(x, groups)

    mean, var_raw = _stats_raw(x, groups)

    B, HW, C = x.shape
    n = HW * (C // groups)

    def rescue(mean):
        mc = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]  # (B, 1, C)
        d2 = jnp.sum(jnp.square(x.astype(jnp.float32) - mc), axis=1)  # (B, C)
        return jnp.maximum(jnp.sum(d2.reshape(B, groups, -1), axis=-1) / n, 0.0)

    ok = jnp.all(var_raw > _RESCUE_FLOOR * jnp.square(mean))
    var = jax.lax.cond(ok, lambda m: var_raw, rescue, mean)

    return mean, var


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
    if implementation == "auto":
        implementation = _AUTO_IMPL

    if implementation == "lazy":
        return _stats_lazy(x, groups)

    if implementation == "pilot":
        return _stats_pilot(x, groups)

    if implementation == "raw":
        return _stats_raw(x, groups)

    if implementation == "guarded":
        return _stats_guarded(x, groups)

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
        implementation: One of ``'auto'`` (= ``'lazy'``: raw-speed fused fold
            with a `lax.cond` exact rescue below the cancellation floor),
            ``'raw'`` (fastest, opt-in, cancellation-prone), ``'pilot'``
            (exact in one read, breaks producer fusion), ``'guarded'``,
            ``'pallas'`` (best standalone on TPU; falls back off-TPU or on
            uncovered shapes), ``'twopass'``. See the module docstring for
            the measurements behind the default.

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



# --- fused group norm (stats + affine/modulation + optional SiLU) -----------
#
# Any GroupNorm site in the model zoo reduces to silu?(x * A + B) with
# per-(batch, channel) A, B derived from the group statistics and a composed
# per-channel / per-batch affine:
#
#     gn      = (x - mu) * rsqrt(var + eps) * gamma + beta
#     mod     = gn * (1 + s) + t          (AdaLN / scale-shift-emb, optional)
#     out     = silu(mod)                 (optional)
#
# With P = gamma * (1 + s) and Q = beta * (1 + s) + t (tiny (B, C) arrays,
# composed OUTSIDE the kernel so their gradients flow through ordinary XLA):
#
#     A = inv * P,   B = Q - mu * inv * P.
#
# The Pallas kernel runs a two-phase sequential grid per batch row: phase 0
# accumulates shifted moments of each (S_BLK, C) tile into VMEM scratch (one
# HBM read), the phase transition finalizes (mean, var) -> (A, B) in-register
# (group fold via a one-hot (C, G) matmul), and phase 1 re-reads x and writes
# silu?(x * A + B) (one read + one write). Total traffic 2R + 1W — the same
# as the raw-moment XLA path (stats read + apply read/write) but with *exact*
# shifted statistics, which XLA cannot express in one fused pass (module
# docstring, BENCH_NOTES r4 bisect).


def _group_matrix(C: int, groups: int) -> jnp.ndarray:
    r"""One-hot (C, G) membership matrix: group folds become tiny matmuls,
    which Mosaic handles natively (lane-dim reshapes would not be)."""

    import numpy as np

    M = np.zeros((C, groups), dtype=np.float32)
    M[np.arange(C), np.arange(C) // (C // groups)] = 1.0

    return jnp.asarray(M)


def _gn_fused_tpu(
    x: Array, P: Array, Q: Array, groups: int, eps: float, silu: bool
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, HW, C = x.shape
    S_BLK = _stats_block(HW, C)
    nblk = HW // S_BLK
    n = HW * (C // groups)

    M = _group_matrix(C, groups)

    def kernel(x_ref, p_ref, q_ref, m_ref, o_ref, sh, s1, s2, av, bv):
        p = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(p == 0)
        def _accumulate():
            xb = x_ref[0].astype(jnp.float32)  # (S_BLK, C)

            @pl.when(j == 0)
            def _reset():
                sh[...] = jnp.broadcast_to(xb[:1], (8, C))
                s1[...] = jnp.zeros((8, C), jnp.float32)
                s2[...] = jnp.zeros((8, C), jnp.float32)

            d = xb - sh[:1]
            s1[:1] += jnp.sum(d, axis=0, keepdims=True)
            s2[:1] += jnp.sum(d * d, axis=0, keepdims=True)

        @pl.when(jnp.logical_and(p == 1, j == 0))
        def _finalize():
            K = sh[:1]  # (1, C) shift
            t1 = s1[:1]
            t2 = s2[:1]

            def gsum(v):  # (1, C) -> (1, G)
                return jax.lax.dot_general(
                    v, m_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def gbcast(v):  # (1, G) -> (1, C)
                return jax.lax.dot_general(
                    v, m_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            mean_g = gsum(t1 + HW * K) / n  # (1, G)
            mean_c = gbcast(mean_g)  # (1, C)
            e = K - mean_c
            var_g = (gsum(t2) + gsum(2.0 * e * t1) + HW * gsum(e * e)) / n
            inv_c = gbcast(jax.lax.rsqrt(var_g + eps))  # (1, C)

            a = inv_c * p_ref[0]
            b = q_ref[0] - mean_c * a
            av[...] = jnp.broadcast_to(a, (8, C))
            bv[...] = jnp.broadcast_to(b, (8, C))

        @pl.when(p == 1)
        def _apply():
            xb = x_ref[0].astype(jnp.float32)
            y = xb * av[:1] + bv[:1]
            if silu:
                y = y * jax.nn.sigmoid(y)
            o_ref[0] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, 2, nblk),
        in_specs=[
            pl.BlockSpec((1, S_BLK, C), lambda b, p, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, p, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, p, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, groups), lambda b, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # Phase 0 parks on block 0 (never written, so never flushed with
            # garbage: Mosaic only copies out when the index changes, and the
            # first change happens after phase 1 writes block 0 for real).
            (1, S_BLK, C),
            lambda b, p, j: (b, p * j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32) for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(x, P, Q, M)

    return out


def _gn_fused_xla(
    x: Array, P: Array, Q: Array, groups: int, eps: float, silu: bool
) -> Array:
    mean, var = group_stats(x, groups)  # (B, G) f32, lazy fold (module docstring)
    inv = jax.lax.rsqrt(var + eps)

    inv_c = jnp.repeat(inv, x.shape[-1] // groups, axis=-1)[:, None, :]  # (B, 1, C)
    mean_c = jnp.repeat(mean, x.shape[-1] // groups, axis=-1)[:, None, :]

    a = inv_c * P
    b = Q - mean_c * a

    # f32 inside the fused elementwise pass; reads/writes stay in x.dtype
    # (same HBM traffic, no |mean| * 2^-8 loss from a bf16 fma).
    y = x.astype(jnp.float32) * a + b
    if silu:
        y = y * jax.nn.sigmoid(y)

    return y.astype(x.dtype)


def _gn_fused_impl(x, P, Q, groups, eps, silu, implementation="auto"):
    # 'auto' is the XLA path: in model code its statistics reduction fuses
    # with the producer op, which no pallas_call can (in-chain micro, module
    # docstring): conv->gn_silu->conv at the flagship stage runs 7.8 ms via
    # XLA vs 9.7 ms via the kernel. The kernel ('pallas') wins only
    # *standalone*, where there is no producer to fuse with.
    if implementation == "pallas" and stats_kernel_eligible(x.shape):
        return jax.lax.platform_dependent(
            x,
            P,
            Q,
            tpu=functools.partial(_gn_fused_tpu, groups=groups, eps=eps, silu=silu),
            default=functools.partial(_gn_fused_xla, groups=groups, eps=eps, silu=silu),
        )

    return _gn_fused_xla(x, P, Q, groups, eps, silu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_fused(
    x: Array,
    P: Array,
    Q: Array,
    groups: int,
    eps: float,
    silu: bool,
    implementation: str = "auto",
) -> Array:
    return _gn_fused_impl(x, P, Q, groups, eps, silu, implementation)


def _gn_fused_fwd(x, P, Q, groups, eps, silu, implementation):
    y = _gn_fused_impl(x, P, Q, groups, eps, silu, implementation)
    mean, var = group_stats(x, groups)
    return y, (x, P, Q, mean, var)


def _gn_fused_bwd(groups, eps, silu, implementation, residuals, g):
    x, P, Q, mean, var = residuals

    B, HW, C = x.shape
    n = HW * (C // groups)

    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    inv_c = jnp.repeat(inv, C // groups, axis=-1)[:, None, :]  # (B, 1, C)
    mean_c = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]

    xf = x.astype(jnp.float32)
    u = (xf - mean_c) * inv_c  # normalized activations
    g = g.astype(jnp.float32)

    if silu:
        yv = P * u + Q
        sig = jax.nn.sigmoid(yv)
        g = g * sig * (1.0 + yv * (1.0 - sig))  # d silu / d y

    # y = P u + Q: straight-through parts.
    g_P = jnp.sum(g * u, axis=1, keepdims=True)  # (B, 1, C)
    g_Q = jnp.sum(g, axis=1, keepdims=True)

    # u = (x - mu) inv with group statistics: standard GN input gradient.
    gu = g * P

    def gmean(v):  # mean over each (batch, group)
        s = jnp.sum(v, axis=1)  # (B, C)
        s = jnp.sum(s.reshape(B, groups, -1), axis=-1) / n  # (B, G)
        return jnp.repeat(s, C // groups, axis=-1)[:, None, :]  # (B, 1, C)

    g_x = inv_c * (gu - gmean(gu) - u * gmean(gu * u))

    return g_x.astype(x.dtype), g_P.astype(P.dtype), g_Q.astype(Q.dtype)


_gn_fused.defvjp(_gn_fused_fwd, _gn_fused_bwd)


def _compose_affine(
    x: Array,
    groups: int,
    scale: Array | None,
    bias: Array | None,
    mod_scale: Array | None,
    mod_shift: Array | None,
) -> tuple[Array, Array, Array]:
    r"""Flattens ``x`` to (B, HW, C) and composes the per-(batch, channel)
    affine P, Q from the layer parameters and optional AdaLN-style modulation
    (each (B, C)-broadcastable)."""

    B, *spatial, C = x.shape

    assert C % groups == 0, f"channels ({C}) must be divisible by groups ({groups})"

    P = jnp.ones((1, 1, C), jnp.float32)
    Q = jnp.zeros((1, 1, C), jnp.float32)

    if scale is not None:
        P = P * scale.astype(jnp.float32)
    if bias is not None:
        Q = Q + bias.astype(jnp.float32)

    if mod_scale is not None:
        m = (1.0 + mod_scale.astype(jnp.float32)).reshape(B, 1, C)
        P = P * m
        Q = Q * m
    if mod_shift is not None:
        Q = Q + mod_shift.astype(jnp.float32).reshape(B, 1, C)

    P = jnp.broadcast_to(P, (B, 1, C))
    Q = jnp.broadcast_to(Q, (B, 1, C))

    return x.reshape(B, -1, C), P, Q


def group_norm(
    x: Array,
    groups: int,
    eps: float = 1e-5,
    scale: Array | None = None,
    bias: Array | None = None,
    mod_scale: Array | None = None,
    mod_shift: Array | None = None,
    implementation: str = "auto",
) -> Array:
    r"""Channels-last group normalization with float32 statistics.

    Arguments:
        x: The input, with shape :math:`(B, *, C)` (channels last).
        groups: The number of groups :math:`G` (must divide :math:`C`).
        eps: A numerical stability term.
        scale: Optional per-channel scale :math:`\gamma`, with shape :math:`(C,)`.
        bias: Optional per-channel bias :math:`\beta`, with shape :math:`(C,)`.
        mod_scale: Optional per-batch modulation :math:`s` (AdaLN /
            scale-shift-emb): the output becomes :math:`\mathrm{gn}(x)(1+s)+t`.
            Shape broadcastable to :math:`(B, C)`.
        mod_shift: Optional per-batch modulation shift :math:`t`.
        implementation: ``'auto'`` (fused XLA pass — fastest in model code) or
            ``'pallas'`` (the two-phase VMEM kernel — fastest standalone).

    Returns:
        The normalized tensor, with shape :math:`(B, *, C)`.
    """

    shape = x.shape
    xf, P, Q = _compose_affine(x, groups, scale, bias, mod_scale, mod_shift)

    return _gn_fused(xf, P, Q, groups, eps, False, implementation).reshape(shape)


def group_norm_silu(
    x: Array,
    groups: int,
    eps: float = 1e-5,
    scale: Array | None = None,
    bias: Array | None = None,
    mod_scale: Array | None = None,
    mod_shift: Array | None = None,
    implementation: str = "auto",
) -> Array:
    r"""Fused GroupNorm (+ optional AdaLN modulation) + SiLU — the ADM ResBlock
    prologue and scale-shift-norm epilogue in one elementwise pass."""

    shape = x.shape
    xf, P, Q = _compose_affine(x, groups, scale, bias, mod_scale, mod_shift)

    return _gn_fused(xf, P, Q, groups, eps, True, implementation).reshape(shape)

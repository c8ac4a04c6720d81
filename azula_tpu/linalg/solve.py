r"""Fixed-iteration Krylov solvers.

Both solvers run a *static* number of iterations with no convergence test, so
the whole solve compiles to one XLA program with zero host round-trips — the
natural TPU shape for the guidance solvers (DiffPIR/JFPS/MMPS), where each
matrix-vector product is itself a backbone JVP/VJP. Functional parity target:
``azula/linalg/solve.py`` (reference), whose fixed-iteration contract these
functions keep; the implementations here are written for JAX from the update
equations.

TPU-first deviation: the reference defaults its scalar recurrences to float64.
float64 is emulated (slow) on TPU, so the default working precision here is
float32; pass ``dtype=jnp.float64`` under ``jax.experimental.enable_x64`` when
host-grade accuracy matters more than speed.
"""

__all__ = [
    "cg",
    "gmres",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable
from jax import Array


def _rowdot(u: Array, v: Array) -> Array:
    r"""Batched inner product over the trailing axis: ``(*, D) -> (*,)``."""

    return jnp.sum(u * v, axis=-1)


def cg(
    A: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    iterations: int = 1,
    dtype: jnp.dtype | None = None,
) -> Array:
    r"""Runs :math:`n` conjugate-gradient iterations on :math:`Ax = b`.

    CG requires :math:`A \in \mathbb{R}^{D \times D}` to act as a symmetric
    PSD operator. The recurrence is the textbook one (Hestenes & Stiefel):
    step length :math:`\alpha_k = \frac{r_k^\top r_k}{d_k^\top A d_k}` along the
    search direction, then a residual update and a new conjugate direction with
    mixing factor :math:`\beta_k = \frac{r_{k+1}^\top r_{k+1}}{r_k^\top r_k}`.
    Denominators are floored at machine epsilon so an early exact solve yields
    harmless zero-length steps instead of NaNs. The loop body is iteration
    independent, so it lowers to a single :func:`jax.lax.fori_loop`.

    Arguments:
        A: The linear operator :math:`x \mapsto Ax`.
        b: The right-hand side :math:`b`, with shape :math:`(*, D)`.
        x0: An optional warm start with shape :math:`(*, D)`; zero when omitted.
        iterations: The number of iterations :math:`n` (static).
        dtype: Working precision of the recurrence (default float32; see the
            module docstring).

    Returns:
        The iterate :math:`x_n`, with shape :math:`(*, D)`, cast back to
        ``b.dtype``.
    """

    if dtype is None:
        dtype = jnp.float32

    tiny = jnp.finfo(dtype).eps
    io_dtype = b.dtype

    if x0 is None:
        sol = jnp.zeros_like(b, dtype=dtype)
        resid = b.astype(dtype)
    else:
        sol = x0.astype(dtype)
        resid = (b - A(x0)).astype(dtype)

    def body(_, state):
        sol, resid, resid_sq, dirn = state

        # The operator is evaluated in the caller's dtype (it may be a bf16
        # backbone JVP); only the scalar recurrence runs at working precision.
        op_dir = A(dirn.astype(io_dtype)).astype(dtype)
        step = resid_sq / jnp.clip(_rowdot(dirn, op_dir), min=tiny)

        sol = sol + step[..., None] * dirn
        resid = resid - step[..., None] * op_dir

        new_sq = _rowdot(resid, resid)
        mix = new_sq / jnp.clip(resid_sq, min=tiny)
        dirn = resid + mix[..., None] * dirn

        return sol, resid, new_sq, dirn

    state = (sol, resid, _rowdot(resid, resid), resid)
    sol, *_ = jax.lax.fori_loop(0, iterations, body, state)

    return sol.astype(io_dtype)


def gmres(
    A: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    iterations: int = 1,
    dtype: jnp.dtype | None = None,
) -> Array:
    r"""Runs :math:`m` GMRES iterations on :math:`Ax = b`.

    Works for any square operator (no symmetry assumption). The method builds
    an orthonormal Krylov basis by modified Gram-Schmidt (Arnoldi) and keeps
    the growing Hessenberg matrix rotated into upper-triangular form with one
    new Givens rotation per column, so the least-squares problem at the end is
    a single small triangular solve. Because ``iterations`` is static and
    small (guidance uses 1-8), the outer loop is unrolled at trace time; each
    column of the Hessenberg lives as a plain Python list of batched scalars,
    which XLA constant-folds into straight-line code.

    Arguments:
        A: The linear operator :math:`x \mapsto Ax`.
        b: The right-hand side :math:`b`, with shape :math:`(*, D)`.
        x0: An optional warm start with shape :math:`(*, D)`; zero when omitted.
        iterations: The Krylov subspace dimension :math:`m` (static).
        dtype: Working precision of the recurrence (default float32; see the
            module docstring).

    Returns:
        The iterate :math:`x_m`, with shape :math:`(*, D)`, cast back to
        ``b.dtype``.
    """

    if dtype is None:
        dtype = jnp.float32

    tiny = jnp.finfo(dtype).eps
    io_dtype = b.dtype
    m = iterations

    resid = b if x0 is None else b - A(x0)
    resid = resid.astype(dtype)

    def unit(v):
        length = jnp.linalg.norm(v, axis=-1)
        return v / jnp.clip(length[..., None], min=tiny), length

    def make_rotation(a, h):
        # Plane rotation zeroing h against a: returns (cos, sin) with the
        # sign convention  [c -s; s c] [a; h] = [hypot(a, h); 0].
        hyp = jnp.clip(jnp.sqrt(a * a + h * h), min=tiny)
        return a / hyp, -h / hyp

    q0, resid_len = unit(resid)

    basis = [q0]  # orthonormal Krylov vectors, each (*, D)
    upper = []  # rotated (triangular) Hessenberg columns, col j has j+1 entries
    rhs = [resid_len]  # rotated residual projections, grows by one per column
    rotations = []

    for j in range(m):
        w = A(basis[j].astype(io_dtype)).astype(dtype)

        # Modified Gram-Schmidt against every basis vector so far.
        col = []
        for q in basis:
            proj = _rowdot(w, q)
            w = w - proj[..., None] * q
            col.append(proj)
        w, spill = unit(w)
        col.append(spill)
        basis.append(w)

        # Keep the column triangular: replay the accumulated rotations, then
        # generate one more to annihilate the subdiagonal entry.
        for i, (c, s) in enumerate(rotations):
            hi, lo = col[i], col[i + 1]
            col[i] = c * hi - s * lo
            col[i + 1] = s * hi + c * lo

        c, s = make_rotation(col[j], col[j + 1])
        rotations.append((c, s))
        col[j] = c * col[j] - s * col[j + 1]
        col[j + 1] = jnp.zeros_like(col[j])

        # The same rotation acts on the residual projection vector.
        rhs.append(s * rhs[j])
        rhs[j] = c * rhs[j]

        upper.append(col)

    # Assemble the (m, m) triangular system R y = g. Column j only has j+1
    # meaningful entries; the rest are zero-padded to stack.
    zero = jnp.zeros_like(rhs[0])
    R = jnp.stack(
        [jnp.stack(col[:m] + [zero] * (m - len(col[:m])), axis=-1) for col in upper],
        axis=-1,
    )  # (*, m, m), column j in R[..., :, j]
    g = jnp.stack(rhs[:m], axis=-1)

    y = jax.scipy.linalg.solve_triangular(
        R + tiny * jnp.eye(m, dtype=dtype),
        g[..., None],
        lower=False,
    )[..., 0]

    span = jnp.stack(basis[:m], axis=-2)  # (*, m, D)
    update = jnp.einsum("...i,...ij->...j", y, span)

    sol = update if x0 is None else x0 + update

    return sol.astype(io_dtype)

r"""Linear system solvers.

Fixed-iteration conjugate gradient and GMRES, matching the reference's
"no convergence check" design (`azula/linalg/solve.py:29-32`), which is already
XLA-shaped: a fixed number of iterations means a static compute graph with no
host-device synchronization.

TPU-first deviation: the reference promotes intermediate math to float64
(`solve.py:46-47`). On TPU float64 is emulated and slow, so the default
intermediate dtype here is float32; pass `dtype=jnp.float64` (under
`jax.experimental.enable_x64`) to reproduce the reference exactly.
"""

__all__ = [
    "cg",
    "gmres",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable
from jax import Array


def cg(
    A: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    iterations: int = 1,
    dtype: jnp.dtype | None = None,
) -> Array:
    r"""Solves a linear system :math:`Ax = b` with conjugate gradient (CG) iterations.

    The matrix :math:`A \in \mathbb{R}^{D \times D}` must be symmetric positive
    (semi)definite. All iterations are performed regardless of convergence
    (reference `azula/linalg/solve.py:14-75`), compiled to a single
    :func:`jax.lax.fori_loop`.

    Arguments:
        A: The linear operator :math:`x \mapsto Ax`.
        b: The right-hand side vector :math:`b`, with shape :math:`(*, D)`.
        x0: An initial guess :math:`x_0`, with shape :math:`(*, D)`. If :py:`None`,
            use :math:`x_0 = 0` instead.
        iterations: The number of CG iterations :math:`n`.
        dtype: The data type used for intermediate computations. If :py:`None`,
            use :class:`jnp.float32` instead (see module docstring).

    Returns:
        The :math:`n`-th iteration :math:`x_n`, with shape :math:`(*, D)`.
    """

    if dtype is None:
        dtype = jnp.float32

    epsilon = jnp.finfo(dtype).eps
    out_dtype = b.dtype

    if x0 is None:
        x = jnp.zeros_like(b, dtype=dtype)
        r = b.astype(dtype)
    else:
        x = x0.astype(dtype)
        r = (b - A(x0)).astype(dtype)

    rr = jnp.einsum("...i,...i->...", r, r)
    p = r

    def body(_, carry):
        x, r, rr, p = carry

        Ap = A(p.astype(out_dtype)).astype(dtype)
        pAp = jnp.einsum("...i,...i->...", p, Ap)
        alpha = rr / jnp.clip(pAp, min=epsilon)
        x_ = x + alpha[..., None] * p
        r_ = r - alpha[..., None] * Ap
        rr_ = jnp.einsum("...i,...i->...", r_, r_)
        beta = rr_ / jnp.clip(rr, min=epsilon)
        p_ = r_ + beta[..., None] * p

        return x_, r_, rr_, p_

    x, *_ = jax.lax.fori_loop(0, iterations, body, (x, r, rr, p))

    return x.astype(out_dtype)


def gmres(
    A: Callable[[Array], Array],
    b: Array,
    x0: Array | None = None,
    iterations: int = 1,
    dtype: jnp.dtype | None = None,
) -> Array:
    r"""Solves a linear system :math:`Ax = b` with generalized minimal residual (GMRES) iterations.

    The matrix :math:`A \in \mathbb{R}^{D \times D}` can be non-symmetric
    non-definite. Arnoldi + Givens rotations with a fixed number of iterations
    (reference `azula/linalg/solve.py:78-185`). The iteration count is small and
    static, so the loop is unrolled at trace time.

    Arguments:
        A: The linear operator :math:`x \mapsto Ax`.
        b: The right-hand side vector :math:`b`, with shape :math:`(*, D)`.
        x0: An initial guess :math:`x_0`, with shape :math:`(*, D)`. If :py:`None`,
            use :math:`x_0 = 0` instead.
        iterations: The number of GMRES iterations :math:`n`.
        dtype: The data type used for intermediate computations. If :py:`None`,
            use :class:`jnp.float32` instead (see module docstring).

    Returns:
        The :math:`n`-th iteration :math:`x_n`, with shape :math:`(*, D)`.
    """

    if dtype is None:
        dtype = jnp.float32

    epsilon = jnp.finfo(dtype).eps
    out_dtype = b.dtype

    if x0 is None:
        r = b
    else:
        r = b - A(x0)

    r = r.astype(dtype)

    def normalize(x):
        norm = jnp.linalg.norm(x, axis=-1)
        x = x / jnp.clip(norm[..., None], min=epsilon)
        return x, norm

    def rotation(a, b):
        c = jnp.clip(jnp.sqrt(a * a + b * b), min=epsilon)
        return a / c, -b / c

    V = [None for _ in range(iterations + 1)]
    B = [None for _ in range(iterations + 1)]
    H = [[None for _ in range(iterations)] for _ in range(iterations + 1)]
    cs = [None for _ in range(iterations)]
    ss = [None for _ in range(iterations)]

    V[0], B[0] = normalize(r)

    for j in range(iterations):
        w = A(V[j].astype(out_dtype)).astype(dtype)

        # Arnoldi iteration for the (j+1)-th basis vector
        for i in range(j + 1):
            H[i][j] = jnp.einsum("...i,...i->...", w, V[i])
            w = w - H[i][j][..., None] * V[i]
        w, w_norm = normalize(w)
        H[j + 1][j] = w_norm
        V[j + 1] = w

        # Givens rotations
        for i in range(j):
            tmp = cs[i] * H[i][j] - ss[i] * H[i + 1][j]
            H[i + 1][j] = cs[i] * H[i + 1][j] + ss[i] * H[i][j]
            H[i][j] = tmp

        cs[j], ss[j] = rotation(H[j][j], H[j + 1][j])
        H[j][j] = cs[j] * H[j][j] - ss[j] * H[j + 1][j]

        # Update residual vector
        B[j + 1] = ss[j] * B[j]
        B[j] = cs[j] * B[j]

        # Fill with zeros
        for i in range(j + 1, iterations + 1):
            H[i][j] = jnp.zeros_like(H[j][j])

    V, B, H = V[:-1], B[:-1], H[:-1]

    V = jnp.stack(V, axis=-2)
    B = jnp.stack(B, axis=-1)
    H = jnp.stack([jnp.stack(Hi, axis=-1) for Hi in H], axis=-2)

    y = jax.scipy.linalg.solve_triangular(
        H + epsilon * jnp.eye(iterations, dtype=dtype),
        B[..., None],
        lower=False,
    )[..., 0]

    if x0 is None:
        x = jnp.einsum("...ij,...i->...j", V, y)
    else:
        x = x0 + jnp.einsum("...ij,...i->...j", V, y)

    return x.astype(out_dtype)

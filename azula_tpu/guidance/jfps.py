r"""Jacobian-Free Posterior Sampling (JFPS) internals.

Reference: `azula/guidance/jfps.py:22-92`: covariance algebra
:math:`(\Sigma_x^{-1} + \Sigma_t^{-1})^{-1}` plus JVP/VJP closures of the
forward operator and a cg/gmres solve in observation space.
"""

from __future__ import annotations

__all__ = [
    "JFPSDenoiser",
]

import functools
import jax

from collections.abc import Callable
from jax import Array
from typing import Literal

from ..denoise import Denoiser, DiracPosterior
from ..linalg.covariance import Covariance, IsotropicCovariance
from ..linalg.solve import cg, gmres
from ..noise import Schedule


class JFPSDenoiser(Denoiser):
    r"""Creates a JFPS denoiser module.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A(x), \Sigma_y)`, with shape :math:`(*, D)`.
        A: The forward operator :math:`x \mapsto A(x)`.
        cov_y: The noise covariance :math:`\Sigma_y`.
        cov_x: The signal covariance :math:`\Sigma_x`.
        solver: The linear solver name (`'cg'` or `'gmres'`).
        iterations: The number of solver iterations.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        cov_y: Covariance,
        cov_x: Covariance,
        solver: Literal["cg", "gmres"] = "cg",
        iterations: int = 1,
    ) -> None:
        self.denoiser = denoiser

        self.y = y
        self.A = A
        self.cov_y = cov_y
        self.cov_x = cov_x

        if solver == "cg":
            self.solve = functools.partial(cg, iterations=iterations)
        elif solver == "gmres":
            self.solve = functools.partial(gmres, iterations=iterations)
        else:
            raise ValueError(f"Unknown solver '{solver}'.")

    @property
    def schedule(self) -> Schedule:
        return self.denoiser.schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)

        q = self.denoiser(x_t, t, **kwargs)
        x_hat = jax.lax.stop_gradient(q.mean)

        y_hat, vjp_A = jax.vjp(self.A, x_hat)

        def A_jvp(v):
            return jax.jvp(self.A, (x_hat,), (v,))[1]

        def At(v):
            return vjp_A(v)[0]

        cov_t = IsotropicCovariance(sigma_t**2 / alpha_t**2)
        cov_x = (self.cov_x.inv + cov_t.inv).inv

        def cov_y(v):
            return self.cov_y(v) + A_jvp(cov_x(At(v)))

        grad = self.y - y_hat
        grad = self.solve(A=cov_y, b=grad)
        grad = At(grad)
        grad = cov_x(grad)

        return DiracPosterior(mean=x_hat + grad)

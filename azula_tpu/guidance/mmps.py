r"""Moment Matching Posterior Sampling (MMPS) internals.

Reference: `azula/guidance/mmps.py:24-92`: the denoiser's Jacobian (VJP of
:math:`\hat{x}` against :math:`x_t`, `mmps.py:79-90`) defines the
:math:`\Sigma_x` action; each solver iteration re-runs a VJP through the full
backbone.

References:
    | Learning Diffusion Priors from Observations by Expectation Maximization (Rozet et al., 2024)
    | https://arxiv.org/abs/2405.13712
"""

__all__ = [
    "MMPSDenoiser",
]

import functools
import jax

from collections.abc import Callable
from jax import Array
from typing import Literal

from ..denoise import Denoiser, DiracPosterior
from ..linalg.covariance import Covariance
from ..linalg.solve import cg, gmres
from ..noise import Schedule


class MMPSDenoiser(Denoiser):
    r"""Creates a MMPS denoiser module.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A(x), \Sigma_y)`, with shape :math:`(*, D)`.
        A: The forward operator :math:`x \mapsto A(x)`.
        cov_y: The noise covariance :math:`\Sigma_y`.
        solver: The linear solver name (`'cg'` or `'gmres'`).
        iterations: The number of solver iterations.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        cov_y: Covariance,
        solver: Literal["cg", "gmres"] = "gmres",
        iterations: int = 1,
    ) -> None:
        self.denoiser = denoiser

        self.y = y
        self.A = A
        self.cov_y = cov_y

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
        gamma_t = sigma_t**2 / alpha_t

        x_hat, vjp_den = jax.vjp(lambda x: self.denoiser(x, t, **kwargs).mean, x_t)
        y_hat, vjp_A = jax.vjp(self.A, x_hat)

        def A_jvp(v):
            return jax.jvp(self.A, (x_hat,), (v,))[1]

        def At(v):
            return vjp_A(v)[0]

        def cov_x(v):
            return gamma_t * vjp_den(v)[0]

        def cov_y(v):
            return self.cov_y(v) + A_jvp(cov_x(At(v)))

        grad = self.y - y_hat
        grad = self.solve(A=cov_y, b=grad)
        grad = gamma_t * vjp_den(At(grad))[0]

        return DiracPosterior(mean=x_hat + grad)

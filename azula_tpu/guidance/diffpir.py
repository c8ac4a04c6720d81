r"""Diffusion Plug-and-Play Image Restoration (DiffPIR) internals.

Reference: `azula/guidance/diffpir.py:24-88`.

References:
    | Denoising Diffusion Models for Plug-and-Play Image Restoration (Zhu et al., 2023)
    | https://arxiv.org/abs/2305.08995
"""

__all__ = [
    "DiffPIRDenoiser",
]

import functools
import jax

from collections.abc import Callable
from jax import Array
from typing import Literal

from ..denoise import Denoiser, DiracPosterior
from ..linalg.solve import cg, gmres
from ..noise import Schedule


class DiffPIRDenoiser(Denoiser):
    r"""Creates a DiffPIR denoiser module: a proximal data-fit solve
    :math:`(A^\top \Sigma_y^{-1} A + \lambda / \rho_t)^{-1}` around the inner
    denoiser's mean.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A x, \Sigma_y)`, with shape :math:`(*, D)`.
        A: The (linear) forward operator :math:`x \mapsto A x`.
        var_y: The noise variance :math:`\Sigma_y`.
        lmbda: The regularization strength :math:`\lambda \in \mathbb{R}_+`.
        solver: The linear solver name (`'cg'` or `'gmres'`).
        iterations: The number of solver iterations.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        var_y: float | Array,
        lmbda: float = 10.0,
        solver: Literal["cg", "gmres"] = "gmres",
        iterations: int = 1,
    ) -> None:
        self.denoiser = denoiser

        self.y = y
        self.A = A
        self.var_y = var_y
        self.lmbda = lmbda

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
        rho_t = (sigma_t / alpha_t) ** 2

        q = self.denoiser(x_t, t, **kwargs)
        x_hat = jax.lax.stop_gradient(q.mean)

        y_hat, vjp_A = jax.vjp(self.A, x_hat)

        def At(v):
            return vjp_A(v)[0]

        def AtA_I(v):
            return At(self.A(v) / self.var_y) + self.lmbda * v / rho_t

        grad = (self.y - y_hat) / self.var_y
        grad = At(grad)
        grad = self.solve(A=AtA_I, b=grad)

        return DiracPosterior(mean=x_hat + grad)

r"""Tweedie Moment Projected Diffusion (TMPD) internals.

Reference: `azula/guidance/tmpd.py:21-73`: a diagonal posterior-variance estimate
via a VJP with an all-ones vector.

References:
    | Tweedie Moment Projected Diffusions For Inverse Problems (Boys et al., 2023)
    | https://arxiv.org/abs/2310.06721
"""

__all__ = [
    "TMPDenoiser",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable
from jax import Array

from ..denoise import Denoiser, DiracPosterior
from ..noise import Schedule


class TMPDenoiser(Denoiser):
    r"""Creates a TMPD denoiser module.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A x, \Sigma_y)`.
        A: The (linear) forward operator :math:`x \mapsto A x`.
        var_y: The noise variance :math:`\Sigma_y`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        var_y: float | Array,
    ) -> None:
        self.denoiser = denoiser

        self.y = y
        self.A = A
        self.var_y = var_y

    @property
    def schedule(self) -> Schedule:
        return self.denoiser.schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)
        gamma_t = sigma_t**2 / alpha_t

        x_hat, vjp_den = jax.vjp(lambda x: self.denoiser(x, t, **kwargs).mean, x_t)
        y_hat, vjp_A = jax.vjp(self.A, x_hat)

        def At(v):
            return vjp_A(v)[0]

        def cov_x(v):
            return gamma_t * vjp_den(v)[0]

        var_Ax = self.A(cov_x(At(jnp.ones_like(y_hat))))

        grad = (self.y - y_hat) / (self.var_y + var_Ax)
        grad = gamma_t * vjp_den(At(grad))[0]

        return DiracPosterior(mean=x_hat + grad)

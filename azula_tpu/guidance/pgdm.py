r"""Pseudo-inverse Guided Diffusion Model (PGDM) internals.

Reference: `azula/guidance/pgdm.py:21-69`; the VJP against the denoiser input
(`pgdm.py:66`) is a :func:`jax.vjp` closure.

References:
    | Pseudoinverse-Guided Diffusion Models for Inverse Problems (Song et al., 2023)
    | https://openreview.net/forum?id=9_gsMA8MRKQ
"""

__all__ = [
    "PGDMSampler",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable
from jax import Array

from ..denoise import Denoiser
from ..sample import DDIMSampler


class PGDMSampler(DDIMSampler):
    r"""Creates a PGDM sampler.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A(x), \Sigma_y)`.
        A: The forward operator :math:`x \mapsto A(x)`.
        A_inv: The pseudo-inverse operator :math:`y \mapsto A^\dagger(y)`.
        kwargs: Keyword arguments passed to :class:`azula_tpu.sample.DDIMSampler`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        A_inv: Callable[[Array], Array],
        **kwargs,
    ) -> None:
        super().__init__(denoiser, **kwargs)

        self.y = y
        self.A = A
        self.A_inv = A_inv

    def step(self, x_t, t, s, key=None, **kwargs):
        alpha_s, sigma_s = self.denoiser.schedule(s)
        alpha_t, sigma_t = self.denoiser.schedule(t)

        tau = 1 - (alpha_t / alpha_s * sigma_s / sigma_t) ** 2
        tau = jnp.clip(self.eta * tau, min=0, max=1)
        eps = self._noise(key, x_t)

        x_hat, vjp = jax.vjp(lambda x: self.denoiser(x, t, **kwargs).mean, x_t)

        # DDIM transition
        x_s = alpha_s * x_hat
        x_s = x_s + sigma_s * jnp.sqrt(1 - tau) / sigma_t * (x_t - alpha_t * x_hat)
        x_s = x_s + sigma_s * jnp.sqrt(tau) * eps

        # PiGDM correction
        grad = self.A_inv(self.y) - self.A_inv(self.A(x_hat))
        (grad,) = vjp(grad)

        return x_s + alpha_s * alpha_t * grad

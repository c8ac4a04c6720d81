r"""Diffusion Posterior Sampling (DPS) internals.

Reference: `azula/guidance/dps.py:21-70`. The `torch.enable_grad` island becomes
a :func:`jax.value_and_grad` closure over the denoiser.

References:
    | Diffusion Posterior Sampling for General Noisy Inverse Problems (Chung et al., 2022)
    | https://arxiv.org/abs/2209.14687
"""

__all__ = [
    "DPSSampler",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable
from jax import Array

from ..denoise import Denoiser
from ..sample import DDPMSampler


class DPSSampler(DDPMSampler):
    r"""Creates a DPS sampler.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y \sim \mathcal{N}(A(x), \Sigma_y)`.
        A: The forward operator :math:`x \mapsto A(x)`.
        zeta: The guidance strength :math:`\zeta`.
        kwargs: Keyword arguments passed to :class:`azula_tpu.sample.DDPMSampler`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        A: Callable[[Array], Array],
        zeta: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(denoiser, **kwargs)

        self.y = y
        self.A = A
        self.zeta = zeta

    def step(self, x_t, t, s, key=None, **kwargs):
        alpha_s, sigma_s = self.denoiser.schedule(s)
        alpha_t, sigma_t = self.denoiser.schedule(t)

        tau = 1 - (alpha_t / alpha_s * sigma_s / sigma_t) ** 2
        eps = self._noise(key, x_t)

        def norm_fn(x):
            x_hat = self.denoiser(x, t, **kwargs).mean
            error = self.y - self.A(x_hat)
            return jnp.linalg.norm(error.ravel()), x_hat

        (_, x_hat), grad = jax.value_and_grad(norm_fn, has_aux=True)(x_t)

        # DDPM transition
        x_s = alpha_s * x_hat
        x_s = x_s + sigma_s * jnp.sqrt(1 - tau) / sigma_t * (x_t - alpha_t * x_hat)
        x_s = x_s + sigma_s * jnp.sqrt(tau) * eps

        # DPS correction
        return x_s - self.zeta * grad

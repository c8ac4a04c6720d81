r"""RePaint internals.

Reference: `azula/guidance/repaint.py:20-63`.

References:
    | RePaint: Inpainting using Denoising Diffusion Probabilistic Models (Lugmayr et al., 2022)
    | https://arxiv.org/abs/2201.09865
"""

__all__ = [
    "RePaintSampler",
]

import jax
import jax.numpy as jnp

from jax import Array

from ..denoise import Denoiser
from ..sample import DDIMSampler


class RePaintSampler(DDIMSampler):
    r"""Creates a RePaint inpainting sampler.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        y: An observation :math:`y = m \odot x`.
        mask: The observation mask :math:`m` (boolean).
        iterations: The number of RePaint resampling iterations per step.
        kwargs: Keyword arguments passed to :class:`azula_tpu.sample.DDIMSampler`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        y: Array,
        mask: Array,
        iterations: int = 3,
        **kwargs,
    ) -> None:
        super().__init__(denoiser, **kwargs)

        self.y = y
        self.mask = mask
        self.iterations = iterations

    @property
    def requires_key(self) -> bool:
        return True

    def step(self, x_t, t, s, key=None, **kwargs):
        alpha_s, sigma_s = self.denoiser.schedule(s)
        alpha_t, sigma_t = self.denoiser.schedule(t)

        x_s = x_t

        for i in range(self.iterations):
            k0, k1, k2 = jax.random.split(jax.random.fold_in(key, i), 3)

            x_s = super().step(x_t, t, s, key=k0, **kwargs)
            x_s = jnp.where(
                self.mask,
                alpha_s * self.y
                + sigma_s * jax.random.normal(k1, self.y.shape, x_s.dtype),
                x_s,
            )

            x_t = alpha_t / alpha_s * x_s + alpha_t * jnp.sqrt(
                (sigma_t / alpha_t) ** 2 - (sigma_s / alpha_s) ** 2
            ) * jax.random.normal(k2, x_s.shape, x_s.dtype)

        return x_s

r"""Twisted Diffusion Sampling (TDS) internals.

Reference: `azula/guidance/tds.py:23-104`. The reference threads a mutable
`carry` dict of log-weights through its step loop; here the log-weights are part
of the :func:`jax.lax.scan` carry, and multinomial resampling is
:func:`jax.random.categorical`.

References:
    | Practical and Asymptotically Exact Conditional Sampling in Diffusion Models (Wu et al., 2023)
    | https://arxiv.org/abs/2306.17775
"""

__all__ = [
    "TDSSampler",
]

import jax
import jax.numpy as jnp
import math

from collections.abc import Callable
from jax import Array

from ..denoise import Denoiser
from ..sample import Sampler


def _normal_log_prob(x: Array, loc: Array, scale: Array) -> Array:
    return -(((x - loc) / scale) ** 2 + jnp.log(scale**2) + math.log(2 * math.pi)) / 2


class TDSSampler(Sampler):
    r"""Creates a TDS (twisted sequential Monte Carlo) sampler.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        twist: A twisting function :math:`\log p(y \mid \hat{x}, t)` taking
            :math:`(\hat{x}, \sigma_t / \alpha_t)`.
        kwargs: Keyword arguments passed to :class:`azula_tpu.sample.Sampler`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        twist: Callable[[Array, Array], Array],
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)

        self.denoiser = denoiser
        self.twist = twist

    @property
    def requires_key(self) -> bool:
        return True

    def _trajectory(self, x: Array, key: Array, **kwargs) -> Array:
        r"""Runs the particle system. ``x`` holds :math:`K` particles with shape
        :math:`(K, *)`."""

        time = self.timesteps.astype(x.dtype)
        K = x.shape[0]

        def body(carry, inp):
            x_t, log_w = carry
            i, t, s = inp

            k_res, k_prop = jax.random.split(jax.random.fold_in(key, i))

            alpha_s, sigma_s = self.denoiser.schedule(s)
            alpha_t, sigma_t = self.denoiser.schedule(t)

            # Twisted score through the denoiser
            def twist_fn(x):
                x_hat = self.denoiser(x, t, **kwargs).mean
                log_p_y = self.twist(x_hat, sigma_t / alpha_t)
                return jnp.sum(log_p_y), (x_hat, log_p_y)

            (_, (x_hat, log_p_y)), score_y = jax.value_and_grad(
                twist_fn, has_aux=True
            )(x_t)

            # Resample
            log_p_y = log_p_y.reshape(K, -1).sum(axis=-1)
            log_w = log_p_y + log_w

            idx = jax.random.categorical(k_res, log_w, shape=(K,))
            x_t, x_hat, log_p_y, score_y = (
                x_t[idx],
                x_hat[idx],
                log_p_y[idx],
                score_y[idx],
            )

            # Proposal (DDPM transition, optionally twisted)
            def ddpm_loc_scale(x):
                eps = (x_t - alpha_t * x) / sigma_t
                tau = (alpha_t / alpha_s * sigma_s / sigma_t) ** 2
                return alpha_s * x + sigma_s * jnp.sqrt(tau) * eps, sigma_s * jnp.sqrt(
                    1 - tau
                )

            loc, scale = ddpm_loc_scale(x_hat)
            loc_y, scale_y = ddpm_loc_scale(x_hat + sigma_t**2 / alpha_t * score_y)

            x_s = loc_y + scale_y * jax.random.normal(k_prop, x_t.shape, x_t.dtype)

            # Reweight
            log_q_xs = _normal_log_prob(x_s, loc, scale).reshape(K, -1).sum(axis=-1)
            log_q_xs_y = (
                _normal_log_prob(x_s, loc_y, scale_y).reshape(K, -1).sum(axis=-1)
            )

            log_w = log_q_xs - log_q_xs_y - log_p_y

            return (x_s, log_w), None

        log_w = jnp.zeros(K, dtype=x.dtype)

        (x, _), _ = jax.lax.scan(
            body,
            (x, log_w),
            (jnp.arange(self.steps), time[:-1], time[1:]),
        )

        return x

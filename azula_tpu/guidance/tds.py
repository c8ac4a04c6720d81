r"""Twisted Diffusion Sampling (TDS) internals.

Reference: `azula/guidance/tds.py:23-104`. The reference threads a mutable
`carry` dict of log-weights through its step loop and resamples every step;
here the log-weights are part of the :func:`jax.lax.scan` carry, multinomial
resampling is :func:`jax.random.categorical`, and resampling is *adaptive*:
it only triggers when the effective sample size drops below a threshold,
which preserves particle diversity (SMC path degeneracy — unconditional
resampling every step coalesces the ancestral lineages of coordinates the
observation says nothing about).

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


def _log_ess(log_w: Array) -> Array:
    r"""Effective sample size :math:`(\sum_k w_k)^2 / \sum_k w_k^2` in log space."""

    return 2 * jax.scipy.special.logsumexp(log_w) - jax.scipy.special.logsumexp(
        2 * log_w
    )


class TDSSampler(Sampler):
    r"""Creates a TDS (twisted sequential Monte Carlo) sampler.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        twist: A twisting function :math:`\log p(y \mid \hat{x}, t)` taking
            :math:`(\hat{x}, \sigma_t / \alpha_t)`.
        resample_threshold: Resample when the effective sample size falls below
            this fraction of the particle count. ``1.0`` reproduces the
            reference's every-step resampling; ``0.0`` disables resampling.
        return_weights: If :py:`True`, calling the sampler returns
            ``(particles, log_weights)`` instead of the bare particles, so the
            caller can form self-normalized estimates and monitor the effective
            sample size :math:`(\sum_k w_k)^2 / \sum_k w_k^2`.
        kwargs: Keyword arguments passed to :class:`azula_tpu.sample.Sampler`.
    """

    def __init__(
        self,
        denoiser: Denoiser,
        twist: Callable[[Array, Array], Array],
        resample_threshold: float = 0.5,
        return_weights: bool = False,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)

        self.denoiser = denoiser
        self.twist = twist
        self.resample_threshold = resample_threshold
        self.return_weights = return_weights

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

            # Accumulate the twist factor at the current time into the weights.
            log_p_y = log_p_y.reshape(K, -1).sum(axis=-1)
            log_w = log_p_y + log_w

            # Adaptive resampling: only when the effective sample size drops
            # below the threshold, so well-balanced weights keep their
            # ancestral diversity instead of coalescing every step.
            resample = _log_ess(log_w) < jnp.log(self.resample_threshold * K)
            idx = jnp.where(
                resample,
                jax.random.categorical(k_res, log_w, shape=(K,)),
                jnp.arange(K),
            )
            x_t, x_hat, log_p_y, score_y = (
                x_t[idx],
                x_hat[idx],
                log_p_y[idx],
                score_y[idx],
            )
            log_w = jnp.where(resample, jnp.zeros_like(log_w), log_w[idx])

            # Proposal (DDPM transition, optionally twisted)
            def ddpm_loc_scale(x):
                eps = (x_t - alpha_t * x) / sigma_t
                tau = (alpha_t / alpha_s * sigma_s / sigma_t) ** 2
                return alpha_s * x + sigma_s * jnp.sqrt(tau) * eps, sigma_s * jnp.sqrt(
                    1 - tau
                )

            # The twisted shift is dropped on the final transition: its scale
            # collapses to sigma_min there, so the proposal-mismatch weight
            # (log q - log q_y) has variance ~ (shift/scale)^2 and the
            # particle system degenerates right at the output. An untwisted
            # last proposal is an equally valid SMC choice with O(1) weights.
            shift = jnp.where(i < self.steps - 1, sigma_t**2 / alpha_t, 0.0)

            loc, scale = ddpm_loc_scale(x_hat)
            loc_y, scale_y = ddpm_loc_scale(x_hat + shift * score_y)

            x_s = loc_y + scale_y * jax.random.normal(k_prop, x_t.shape, x_t.dtype)

            # Reweight: the incremental SMC weight of the twisted proposal,
            # q(x_s | x_t) / [q_y(x_s | x_t) p(y | x_t)] — the p(y | x_s)
            # numerator term joins at the next step (or at the terminal
            # completion below), once x_s becomes the current state.
            log_q_xs = _normal_log_prob(x_s, loc, scale).reshape(K, -1).sum(axis=-1)
            log_q_xs_y = (
                _normal_log_prob(x_s, loc_y, scale_y).reshape(K, -1).sum(axis=-1)
            )

            log_w = log_w + log_q_xs - log_q_xs_y - log_p_y

            return (x_s, log_w), None

        log_w = jnp.zeros(K, dtype=x.dtype)

        (x, log_w), _ = jax.lax.scan(
            body,
            (x, log_w),
            (jnp.arange(self.steps), time[:-1], time[1:]),
        )

        if self.return_weights:
            # Complete the incremental weight with the terminal twist factor.
            # Inside the loop, p(y | x_s) joins the weight at the *next*
            # iteration; after the last step it must be folded in here, or the
            # returned weights are the (high-variance) proposal-mismatch terms
            # alone and any self-normalized estimate degenerates.
            alpha_0, sigma_0 = self.denoiser.schedule(time[-1])
            x_hat = self.denoiser(x, time[-1], **kwargs).mean
            log_p_y = self.twist(x_hat, sigma_0 / alpha_0)
            log_w = log_w + log_p_y.reshape(K, -1).sum(axis=-1)

            return x, log_w

        return x

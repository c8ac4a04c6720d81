r"""Denoisers, parametrizations and training objectives.

For a distribution :math:`p(X)` over :math:`\mathbb{R}^D` and a perturbation kernel

.. math:: p(X_t \mid X) = \mathcal{N}(X_t \mid \alpha_t X, \sigma_t^2 I) \, ,

a denoiser approximates the posterior :math:`p(X \mid X_t)`, usually through its
mean :math:`\mathbb{E}[X \mid x_t]`.

Capability parity with the reference `azula/denoise.py` (353 LoC). TPU-first
differences:

- denoisers are pytree modules; losses take an explicit PRNG ``key`` instead of
  relying on a global RNG (`denoise.py:346` uses `torch.randn_like`);
- the backbone's dtype round-trip (`denoise.py:314-320`) is preserved so bf16
  backbones coexist with fp32 sampling math.
"""

from __future__ import annotations

__all__ = [
    "Posterior",
    "DiracPosterior",
    "GaussianPosterior",
    "Denoiser",
    "GaussianDenoiser",
    "SimpleDenoiser",
    "KarrasDenoiser",
]

import abc
import jax
import jax.numpy as jnp
import math

from jax import Array

from .linalg.covariance import Covariance, IsotropicCovariance
from .nn.module import Module
from .nn.utils import get_module_dtype
from .noise import Schedule
from .utils.pytree import PyTree


def broadcast_scales(alpha_t: Array, sigma_t: Array, x: Array) -> tuple[Array, Array]:
    r"""Right-pads the scale arrays with singleton axes to broadcast against ``x``.

    Reference behavior: `azula/denoise.py:306-307`.
    """

    alpha_t, sigma_t = jnp.asarray(alpha_t), jnp.asarray(sigma_t)

    while alpha_t.ndim < x.ndim:
        alpha_t, sigma_t = alpha_t[..., None], sigma_t[..., None]

    return alpha_t, sigma_t


class Posterior(PyTree, abc.ABC):
    r"""Abstract posterior :math:`q_\phi(X \mid x_t)` (reference `denoise.py:50-53`)."""

    mean: Array


class DiracPosterior(Posterior):
    r"""Creates a Dirac delta posterior :math:`\delta(X - \mu)`.

    Reference: `azula/denoise.py:56-66`.
    """

    def __init__(self, mean: Array) -> None:
        self.mean = mean


class GaussianPosterior(Posterior):
    r"""Creates a Gaussian posterior :math:`\mathcal{N}(X \mid \mu, \sigma^2)`.

    Reference: `azula/denoise.py:69-94`.
    """

    def __init__(self, mean: Array, var: Array) -> None:
        self.mean = mean
        self.var = var

    def log_prob(self, x: Array) -> Array:
        r"""Returns the log-density :math:`\log \mathcal{N}(x \mid \mu, \sigma^2)`."""

        return (
            -((x - self.mean) ** 2 / self.var + jnp.log(self.var) + math.log(2 * math.pi))
            / 2
        )


class Denoiser(Module):
    r"""Abstract denoiser module (reference `azula/denoise.py:97-114`)."""

    schedule: Schedule

    @abc.abstractmethod
    def __call__(self, x_t: Array, t: Array, **kwargs) -> Posterior:
        r"""
        Arguments:
            x_t: A noisy tensor :math:`x_t`, with shape :math:`(B, *)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            kwargs: Optional keyword arguments (conditioning).

        Returns:
            The posterior :math:`q_\phi(X \mid x_t)`.
        """

        pass


class GaussianDenoiser(Denoiser):
    r"""Creates an analytical Gaussian denoiser.

    Let :math:`X \sim \mathcal{N}(\mu_x, \Sigma_x)` and :math:`X_t \sim \mathcal{N}(
    \alpha_t X, \sigma_t^2 I)`, then the posterior mean is closed form through the
    structured covariance algebra.

    Reference: `azula/denoise.py:117-174`. Provides analytical ground truth for
    sampler statistical tests.

    Arguments:
        mean: The mean vector :math:`\mu_x`, with shape :math:`(N_1, ..., N_d)`.
        cov: The covariance :math:`\Sigma_x`.
        schedule: A noise schedule.
    """

    def __init__(self, mean: Array, cov: Covariance, schedule: Schedule) -> None:
        self.mean = mean
        self.cov = cov
        self.schedule = schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)

        mean_t = alpha_t * self.mean
        cov_t = IsotropicCovariance(alpha_t**2) * self.cov + IsotropicCovariance(
            sigma_t**2
        )

        mean = (x_t + sigma_t**2 * cov_t.inv(mean_t - x_t)) / alpha_t

        return DiracPosterior(mean=mean)


class SimpleDenoiser(Denoiser):
    r"""Creates a denoiser with simple (:math:`x`-prediction) preconditioning.

    .. math:: \mu_\phi(x_t) = b_\phi(c_\mathrm{in}(t) \, x_t, c_\mathrm{time}(t))

    with :math:`c_\mathrm{in} = 1/\sqrt{\alpha_t^2 + \sigma_t^2}` and
    :math:`c_\mathrm{time} = \log(\sigma_t / \alpha_t)`, making the backbone
    independent of the noise schedule.

    Reference: `azula/denoise.py:177-260`.

    Arguments:
        backbone: A noise/time conditional network :math:`b_\phi(x_t, t)`.
        schedule: A noise schedule.
    """

    def __init__(self, backbone: Module, schedule: Schedule) -> None:
        self.backbone = backbone
        self.schedule = schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_time = jnp.log(sigma_t / alpha_t).reshape(jnp.shape(t))

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            (c_in * x_t).astype(dtype),
            c_time.astype(dtype),
            **kwargs,
        ).astype(x_t.dtype)

        return DiracPosterior(mean=output)

    def loss(
        self,
        x: Array,
        t: Array,
        key: Array,
        max_weight: float = 1e4,
        **kwargs,
    ) -> Array:
        r"""Returns the weighted denoising score-matching loss.

        .. math:: \frac{\alpha_t^2 + \sigma_t^2}{\sigma_t^2} || \mu_\phi(x_t) - x ||^2

        with the weight clipped at ``max_weight`` (reference `denoise.py:232-260`).

        Arguments:
            x: A clean tensor :math:`x`, with shape :math:`(B, *)`.
            t: The time :math:`t`, with shape :math:`(B)`.
            key: A PRNG key for the perturbation noise.
            kwargs: Optional keyword arguments (conditioning).
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x)

        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_t = alpha_t * x + sigma_t * z

        q = self(x_t, t, **kwargs)

        w_t = (alpha_t / sigma_t) ** 2 + 1
        w_t = jnp.clip(w_t, max=max_weight)

        return jnp.mean(w_t * jnp.square(q.mean - x))


class KarrasDenoiser(Denoiser):
    r"""Creates a Gaussian denoiser with EDM-style preconditioning.

    .. math:: \mu_\phi(x_t) = c_\mathrm{skip}(t) \, x_t +
        c_\mathrm{out}(t) \, b_\phi(c_\mathrm{in}(t) \, x_t, c_\mathrm{time}(t))

    with scale-generalized coefficients (reference `azula/denoise.py:263-353`):

    .. math::
        c_\mathrm{in} = \frac{1}{\sqrt{\alpha_t^2 + \sigma_t^2}}, \quad
        c_\mathrm{out} = \frac{\sigma_t}{\sqrt{\alpha_t^2 + \sigma_t^2}}, \quad
        c_\mathrm{skip} = \frac{\alpha_t}{\alpha_t^2 + \sigma_t^2}, \quad
        c_\mathrm{time} = \log \frac{\sigma_t}{\alpha_t}

    References:
        | Elucidating the Design Space of Diffusion-Based Generative Models (Karras et al., 2022)
        | https://arxiv.org/abs/2206.00364

    Arguments:
        backbone: A noise/time conditional network :math:`b_\phi(x_t, t)`.
        schedule: A noise schedule.
    """

    def __init__(self, backbone: Module, schedule: Schedule) -> None:
        self.backbone = backbone
        self.schedule = schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_out = sigma_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_skip = alpha_t / (alpha_t**2 + sigma_t**2)
        c_time = jnp.log(sigma_t / alpha_t).reshape(jnp.shape(t))

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            (c_in * x_t).astype(dtype),
            c_time.astype(dtype),
            **kwargs,
        ).astype(x_t.dtype)

        mean = c_skip * x_t + c_out * output

        return DiracPosterior(mean=mean)

    def loss(self, x: Array, t: Array, key: Array, **kwargs) -> Array:
        r"""Returns the weighted denoising score-matching loss
        (reference `denoise.py:326-353`).

        Arguments:
            x: A clean tensor :math:`x`, with shape :math:`(B, *)`.
            t: The time :math:`t`, with shape :math:`(B)`.
            key: A PRNG key for the perturbation noise.
            kwargs: Optional keyword arguments (conditioning).
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x)

        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_t = alpha_t * x + sigma_t * z

        q = self(x_t, t, **kwargs)

        w_t = (alpha_t / sigma_t) ** 2 + 1

        return jnp.mean(w_t * jnp.square(q.mean - x))

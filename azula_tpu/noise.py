r"""Noise schedules.

A noise schedule is a mapping from a time :math:`t \in [0, 1]` to the signal scale
:math:`\alpha_t \in \mathbb{R}_+` and the noise scale :math:`\sigma_t \in \mathbb{R}_+`
in a perturbation kernel

.. math:: p(X_t \mid X) = \mathcal{N}(X_t \mid \alpha_t X, \sigma_t^2 I)

The only constraint is for the signal-to-noise ratio :math:`\frac{\alpha_t}{\sigma_t}`
to be monotonically decreasing with respect to :math:`t`.

Capability parity with the reference `azula/noise.py:33-231`. Schedules are pytree
dataclasses of Python floats: their parameters are static under `jit`, and the
arithmetic is pure `jnp`, so schedule evaluation fuses into the surrounding
compiled program (e.g. the sampler's `lax.scan` body). Schedules also accept NumPy
inputs and then compute in NumPy — used to precompute float64 coefficient tables
on the host (see :mod:`azula_tpu.sample`), keeping emulated float64 off the TPU.
"""

__all__ = [
    "Schedule",
    "VESchedule",
    "VPSchedule",
    "CosineSchedule",
    "RectifiedSchedule",
    "DecaySchedule",
    "ElucidatedSchedule",
]

import abc
import jax.numpy as jnp
import math
import numpy as np

from jax import Array

from .utils.pytree import PyTree


def _xp(t):
    r"""Returns the array namespace (NumPy or JAX) matching the input."""

    if isinstance(t, (np.ndarray, np.generic)):
        return np
    else:
        return jnp


class Schedule(PyTree, abc.ABC):
    r"""Abstract noise schedule.

    Reference: `azula/noise.py:49-63`.
    """

    @abc.abstractmethod
    def __call__(self, t: Array) -> tuple[Array, Array]:
        r"""
        Arguments:
            t: The time :math:`t`, with shape :math:`(*)`.

        Returns:
            The signal and noise scales :math:`\alpha_t` and :math:`\sigma_t`, with
            shape :math:`(*)`.
        """

        pass


class VESchedule(Schedule):
    r"""Creates a variance exploding (VE) noise schedule.

    .. math::
        \alpha_t & = 1 \\
        \sigma_t & = \exp \big( (1 - t) \log \sigma_\min + t \log \sigma_\max \big)

    Reference: `azula/noise.py:66-96`.

    Arguments:
        sigma_min: The initial noise scale :math:`\sigma_\min \in \mathbb{R}_+`.
        sigma_max: The final noise scale :math:`\sigma_\max \in \mathbb{R}_+`.
    """

    def __init__(self, sigma_min: float = 1e-3, sigma_max: float = 1e3) -> None:
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def alpha(self, t: Array) -> Array:
        return _xp(t).ones_like(t)

    def sigma(self, t: Array) -> Array:
        return _xp(t).exp(
            (1 - t) * math.log(self.sigma_min) + t * math.log(self.sigma_max)
        )


class VPSchedule(Schedule):
    r"""Creates a variance preserving (VP) noise schedule.

    .. math::
        \alpha_t & = \exp \big( t^2 \log \alpha_\min \big) \\
        \sigma_t & = \sqrt{ 1 - \alpha_t^2 + \sigma_\min^2}

    Reference: `azula/noise.py:99-129`.

    Arguments:
        alpha_min: The final signal scale :math:`\alpha_\min \in ]0,1[`.
        sigma_min: The initial noise scale :math:`\sigma_\min \in ]0,1[`.
    """

    def __init__(self, alpha_min: float = 1e-3, sigma_min: float = 1e-3) -> None:
        self.alpha_min = alpha_min
        self.sigma_min = sigma_min

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def alpha(self, t: Array) -> Array:
        return _xp(t).exp(math.log(self.alpha_min) * t**2)

    def sigma(self, t: Array) -> Array:
        return _xp(t).sqrt(1 - self.alpha(t) ** 2 + self.sigma_min**2)


class CosineSchedule(Schedule):
    r"""Creates a cosine noise schedule.

    .. math::
        \alpha_t & = \cos \big( t \arccos \alpha_\min \big) \\
        \sigma_t & = \sqrt{ 1 - \alpha_t^2 + \sigma_\min^2}

    Reference: `azula/noise.py:132-155`.

    Arguments:
        alpha_min: The final signal scale :math:`\alpha_\min \in ]0,1[`.
        sigma_min: The initial noise scale :math:`\sigma_\min \in ]0,1[`.
    """

    def __init__(self, alpha_min: float = 1e-3, sigma_min: float = 1e-3) -> None:
        self.alpha_min = alpha_min
        self.sigma_min = sigma_min

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def alpha(self, t: Array) -> Array:
        return _xp(t).cos(math.acos(self.alpha_min) * t)

    def sigma(self, t: Array) -> Array:
        return _xp(t).sqrt(1 - self.alpha(t) ** 2 + self.sigma_min**2)


class RectifiedSchedule(Schedule):
    r"""Creates a rectified (flow matching) noise schedule.

    .. math::
        \alpha_t & = t \, \alpha_\min + (1 - t) \\
        \sigma_t & = t + (1 - t) \, \sigma_\min

    Reference: `azula/noise.py:158-188`.

    Arguments:
        alpha_min: The final signal scale :math:`\alpha_\min \in ]0,1[`.
        sigma_min: The initial noise scale :math:`\sigma_\min \in ]0,1[`.
    """

    def __init__(self, alpha_min: float = 1e-3, sigma_min: float = 1e-3) -> None:
        self.alpha_min = alpha_min
        self.sigma_min = sigma_min

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def alpha(self, t: Array) -> Array:
        return t * self.alpha_min + (1 - t)

    def sigma(self, t: Array) -> Array:
        return t + (1 - t) * self.sigma_min


class DecaySchedule(Schedule):
    r"""Creates an exponential decay schedule.

    .. math::
        \alpha_t & = \tau \, \alpha_\min + (1 - \tau) \\
        \sigma_t & = \tau + (1 - \tau) \, \sigma_\min
        \quad \text{where} \quad \tau = \frac{1 - \gamma^t}{1 - \gamma}

    Reference: `azula/noise.py:191-231` (used by Flux/Sana).

    Arguments:
        alpha_min: The final signal scale :math:`\alpha_\min \in ]0,1[`.
        sigma_min: The initial noise scale :math:`\sigma_\min \in ]0,1[`.
        gamma: The decay factor :math:`\gamma \in ]0,1[`.
    """

    def __init__(
        self, alpha_min: float = 1e-3, sigma_min: float = 1e-3, gamma: float = 0.1
    ) -> None:
        self.alpha_min = alpha_min
        self.sigma_min = sigma_min
        self.gamma = gamma

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def tau(self, t: Array) -> Array:
        return (1 - self.gamma**t) / (1 - self.gamma)

    def alpha(self, t: Array) -> Array:
        tau = self.tau(t)
        return tau * self.alpha_min + (1 - tau)

    def sigma(self, t: Array) -> Array:
        tau = self.tau(t)
        return tau + (1 - tau) * self.sigma_min


class ElucidatedSchedule(Schedule):
    r"""Creates an elucidated (EDM / Karras :math:`\rho`-) noise schedule.

    .. math::
        \alpha_t & = 1 \\
        \sigma_t & = \left( \sigma_\min^{1/\rho} + t \,
            (\sigma_\max^{1/\rho} - \sigma_\min^{1/\rho}) \right)^\rho

    Reference: `azula/plugins/edm/__init__.py:44-74`.

    Arguments:
        sigma_min: The initial noise scale :math:`\sigma_\min`.
        sigma_max: The final noise scale :math:`\sigma_\max`.
        rho: The interpolation exponent :math:`\rho`.
    """

    def __init__(
        self, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0
    ) -> None:
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.rho = rho

    def __call__(self, t: Array) -> tuple[Array, Array]:
        return self.alpha(t), self.sigma(t)

    def alpha(self, t: Array) -> Array:
        return _xp(t).ones_like(t)

    def sigma(self, t: Array) -> Array:
        lo = self.sigma_min ** (1 / self.rho)
        hi = self.sigma_max ** (1 / self.rho)

        return (lo + t * (hi - lo)) ** self.rho

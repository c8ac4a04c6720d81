r"""Time-conditioning helpers.

The reference leaves time embedding to the user (its backbones take a generic
`mod` vector; the tutorial builds a SineEncoding + MLP inline). This module
packages that pattern: :class:`TimeEmbedding` maps the denoiser's scalar
:math:`c_\mathrm{time}` to modulation features, and :class:`Modulated` adapts a
`mod`-conditioned backbone (UNet / DiT / ViT) to the denoiser's
``backbone(x_t, t, **kwargs)`` contract.
"""

from __future__ import annotations

__all__ = [
    "TimeEmbedding",
    "Modulated",
]

import jax
import jax.numpy as jnp

from jax import Array

from .layers import Linear, SineEncoding
from .module import Module


class TimeEmbedding(Module):
    r"""Sinusoidal time encoding followed by a 2-layer MLP.

    Arguments:
        features: The number of output modulation features :math:`D`.
        key: A PRNG key for parameter initialization.
    """

    def __init__(self, features: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.encoding = SineEncoding(features)
        self.lin1 = Linear(features, features, key=k1)
        self.lin2 = Linear(features, features, key=k2)

    def __call__(self, t: Array) -> Array:
        h = self.encoding(t)
        h = jax.nn.silu(self.lin1(h))
        return self.lin2(h)


class Modulated(Module):
    r"""Adapts a `mod`-conditioned backbone to the denoiser contract
    ``backbone(x_t, t, **kwargs)``.

    Arguments:
        backbone: A network taking ``(x, mod=..., **kwargs)`` (UNet/DiT/ViT).
        mod_features: The number of modulation features :math:`D`.
        key: A PRNG key for the time-embedding parameters.
    """

    def __init__(self, backbone: Module, mod_features: int, *, key: Array) -> None:
        self.backbone = backbone
        self.time_embedding = TimeEmbedding(mod_features, key=key)

    def __call__(self, x_t: Array, t: Array, **kwargs) -> Array:
        mod = self.time_embedding(t)

        if mod.ndim == 1:
            mod = jnp.broadcast_to(mod, (x_t.shape[0], mod.shape[-1]))

        return self.backbone(x_t, mod=mod, **kwargs)

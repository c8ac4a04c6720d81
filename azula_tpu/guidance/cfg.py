r"""Classifier-free guidance (CFG) internals.

Reference: `azula/guidance/cfg.py:19-65`.

References:
    | Classifier-Free Diffusion Guidance (Ho et al., 2022)
    | https://arxiv.org/abs/2207.12598
"""

__all__ = [
    "CFGDenoiser",
]

import jax
import jax.numpy as jnp

from jax import Array
from typing import Any

from ..denoise import Denoiser, DiracPosterior
from ..noise import Schedule


class CFGDenoiser(Denoiser):
    r"""Creates a CFG denoiser module.

    Arguments:
        denoiser: A denoiser :math:`q_\phi(X \mid X_t)`.
        batched: Whether to fuse the positive and negative predictions into a
            single :math:`2B`-batch backbone call instead of two :math:`B`-batch
            calls. One fused call fetches the weights from HBM once per layer
            instead of twice, which helps when the per-call batch is too small
            to saturate the chip (e.g. single-image latency); at
            chip-saturating batch sizes the two-call path is usually as fast
            or faster. Requires the positive and negative conditioning pytrees
            to have matching structures and shapes.
    """

    def __init__(self, denoiser: Denoiser, batched: bool = False) -> None:
        self.denoiser = denoiser
        self.batched = batched

    @property
    def schedule(self) -> Schedule:
        return self.denoiser.schedule

    def __call__(
        self,
        x_t: Array,
        t: Array,
        positive: dict[str, Any],
        negative: dict[str, Any] = {},  # noqa: B006
        guidance: float | Array = 1.0,
        **kwargs,
    ) -> DiracPosterior:
        r"""
        Arguments:
            x_t: A noisy tensor :math:`x_t`, with shape :math:`(B, *)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            positive: The positive label :math:`c_+` as keyword arguments.
            negative: The negative label :math:`c_-` as keyword arguments.
            guidance: The guidance strength :math:`\omega \in \mathbb{R}_+`.
            kwargs: Optional keyword arguments.

        Returns:
            The Dirac delta :math:`\delta(X - \mu)` with
            :math:`\mu = (1 + \omega) \mu_\phi(x_t \mid c_+) - \omega \mu_\phi(x_t \mid c_-)`.
        """

        if self.batched and positive.keys() == negative.keys():
            B = x_t.shape[0]

            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate([jnp.broadcast_to(t, (B,))] * 2, axis=0)
            cond = jax.tree.map(
                lambda p, n: jnp.concatenate(
                    [jnp.broadcast_to(p, (B, *p.shape[1:])), jnp.broadcast_to(n, (B, *n.shape[1:]))],
                    axis=0,
                ),
                {k: jnp.asarray(v) for k, v in positive.items()},
                {k: jnp.asarray(v) for k, v in negative.items()},
            )

            mean = self.denoiser(x2, t2, **cond, **kwargs).mean
            pos, neg = mean[:B], mean[B:]

            return DiracPosterior(mean=pos + guidance * (pos - neg))

        q_pos = self.denoiser(x_t, t, **positive, **kwargs)
        q_neg = self.denoiser(x_t, t, **negative, **kwargs)

        return DiracPosterior(
            mean=q_pos.mean + guidance * (q_pos.mean - q_neg.mean),
        )

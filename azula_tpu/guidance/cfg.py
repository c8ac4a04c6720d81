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

        if self.batched:
            # Loud contract instead of a silent two-call fallback: fusing
            # requires the positive and negative conditioning to be congruent.
            if positive.keys() != negative.keys():
                raise ValueError(
                    "CFGDenoiser(batched=True) requires positive and negative "
                    "conditioning to share keys; got "
                    f"positive={sorted(positive)} vs negative={sorted(negative)}. "
                    "Pass batched=False for asymmetric conditioning."
                )

            B = x_t.shape[0]

            def batchify(a):
                # Dim 0 in (1, B) is read as a batch axis; anything else is an
                # unbatched leaf and gets one. (A leaf whose leading dim
                # coincidentally equals B is indistinguishable from a batched
                # one — document rather than guess further.)
                if a.ndim == 0 or a.shape[0] not in (1, B):
                    a = a[None]
                return jnp.broadcast_to(a, (B, *a.shape[1:]))

            def fuse(name, p, n):
                p, n = batchify(jnp.asarray(p)), batchify(jnp.asarray(n))
                if p.shape != n.shape:
                    raise ValueError(
                        f"CFGDenoiser(batched=True): conditioning '{name}' has "
                        f"incompatible shapes {p.shape} vs {n.shape} after "
                        "batch broadcasting"
                    )
                return jnp.concatenate([p, n], axis=0)

            x2 = jnp.concatenate([x_t, x_t], axis=0)
            t2 = jnp.concatenate([jnp.broadcast_to(t, (B,))] * 2, axis=0)
            cond = {
                k: jax.tree.map(lambda p, n, _k=k: fuse(_k, p, n), positive[k], negative[k])
                for k in positive
            }

            mean = self.denoiser(x2, t2, **cond, **kwargs).mean
            pos, neg = mean[:B], mean[B:]

            return DiracPosterior(mean=pos + guidance * (pos - neg))

        q_pos = self.denoiser(x_t, t, **positive, **kwargs)
        q_neg = self.denoiser(x_t, t, **negative, **kwargs)

        return DiracPosterior(
            mean=q_pos.mean + guidance * (q_pos.mean - q_neg.mean),
        )

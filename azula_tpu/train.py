r"""Training utilities.

The reference deliberately ships no trainer — the user writes the loop
(README.md:50-59). This module keeps that philosophy but packages the
boilerplate the JAX version needs: partitioned parameters, an optax optimizer,
and a jitted, mesh-aware train step.
"""

from __future__ import annotations

__all__ = [
    "TrainState",
    "make_train_step",
    "ema_update",
]

import jax

from jax import Array
from typing import Any

from .denoise import Denoiser
from .utils.pytree import PyTree, Static, combine, partition


class TrainState(PyTree):
    r"""Bundles the dynamic training state: denoiser parameters, optimizer state
    and step counter. The static module structure travels alongside.

    Arguments:
        denoiser: The denoiser to train.
        optimizer: An optax gradient transformation.
    """

    def __init__(self, denoiser: Denoiser, optimizer: Any) -> None:
        params, static = partition(denoiser)

        self.params = params
        self.opt_state = optimizer.init(params)
        self.step = 0

        self.static = static  # hashable, rides the static side of the pytree

    @property
    def denoiser(self) -> Denoiser:
        return combine(self.params, self.static)


def make_train_step(static: Static, optimizer: Any, donate: bool = True):
    r"""Builds a jitted denoising score-matching train step.

    .. code-block:: python

        params, static = partition(denoiser)
        step = make_train_step(static, optimizer)
        params, opt_state, loss = step(params, opt_state, x, t, key)

    Under a sharded mesh, pass `params` placed by
    :func:`azula_tpu.parallel.tp.shard_module` and `x` sharded by
    :func:`azula_tpu.parallel.shard_batch`; XLA emits the data-parallel gradient
    all-reduce and tensor-parallel collectives automatically.

    Arguments:
        static: The static half of the partitioned denoiser.
        optimizer: An optax gradient transformation.
        donate: Whether to donate the parameter/optimizer buffers (halves peak
            memory on TPU).
    """

    import optax

    def step(params, opt_state, x: Array, t: Array, key: Array, **kwargs):
        def loss_fn(params):
            denoiser = combine(params, static)
            return denoiser.loss(x, t, key=key, **kwargs)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def ema_update(ema_params, params, rate: float = 0.999):
    r"""Exponential-moving-average update of a parameter pytree.

    Functional equivalent of the reference's vendored `update_ema`
    (`azula/plugins/adm/_src/nn.py:42-52`):
    :math:`\theta_\mathrm{ema} \gets r \, \theta_\mathrm{ema} + (1 - r) \, \theta`.
    """

    return jax.tree.map(lambda e, p: rate * e + (1 - rate) * p, ema_params, params)

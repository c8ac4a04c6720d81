r"""Elucidated diffusion model (EDM) family.

Capability parity with the reference `azula/plugins/edm/__init__.py`: the
:class:`~azula_tpu.noise.ElucidatedSchedule` (Karras rho-schedule) and the
`ElucidatedDenoiser` x-prediction wrapper (:math:`c_\mathrm{in} = 1/\alpha`,
:math:`c_\mathrm{time} = \sigma/\alpha`).

The NVlabs checkpoints are **pickled PyTorch modules** that require the
external `NVlabs/edm` repository to deserialize (reference
`edm/__init__.py:1-22`); `load_model` therefore needs `torch` plus that
repository on the Python path, and returns a denoiser whose backbone must be
bridged or converted by the caller. The wrapper itself works with any JAX
backbone following the EDM conventions.

References:
    | Elucidating the Design Space of Diffusion-Based Generative Models (Karras et al., 2022)
    | https://arxiv.org/abs/2206.00364
"""

from __future__ import annotations

__all__ = [
    "ElucidatedSchedule",
    "ElucidatedDenoiser",
    "load_model",
]

import jax.numpy as jnp

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...hub import download
from ...nn.utils import get_module_dtype
from ...noise import ElucidatedSchedule, Schedule
from ..utils import load_cards


class ElucidatedDenoiser(Denoiser):
    r"""Creates an elucidated denoiser (reference `edm/__init__.py:95-130`).

    Arguments:
        backbone: A noise conditional network with the EDM calling convention
            `backbone(x, sigma, class_labels=...)`.
        schedule: A noise schedule. Defaults to :class:`ElucidatedSchedule`.
    """

    def __init__(self, backbone, schedule: Schedule | None = None) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = ElucidatedSchedule()
        else:
            self.schedule = schedule

    def __call__(
        self,
        x_t: Array,
        t: Array,
        label: Array | None = None,
        **kwargs,
    ) -> DiracPosterior:
        r"""
        Arguments:
            x_t: A noisy tensor, channels-last, with shape :math:`(B, H, W, 3)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            label: The class label as a one-hot vector, with shape :math:`(*, N)`.

        Returns:
            The Dirac delta :math:`\delta(X - \mu_\phi(x_t \mid c))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = 1 / alpha_t
        c_time = (sigma_t / alpha_t).reshape(jnp.shape(t))

        dtype = get_module_dtype(self.backbone)

        mean = self.backbone(
            (c_in * x_t).astype(dtype),
            c_time.astype(dtype),
            class_labels=None if label is None else label.astype(dtype),
            **kwargs,
        ).astype(x_t.dtype)

        return DiracPosterior(mean=mean)


def load_model(name: str, dtype=None) -> ElucidatedDenoiser:
    r"""Loads a pretrained EDM denoiser with a native JAX backbone.

    The NVlabs pickle is read with a stub module namespace — no NVlabs source
    tree needed, torch only for tensor storages at conversion time
    (:mod:`azula_tpu.models.edm.convert`). The architecture hyperparameters
    come from the pickle itself. Reference behavior:
    `azula/plugins/edm/__init__.py:133-153` (which returns the raw torch
    module; here it is converted to a jittable channels-last module).

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: Optional dtype to cast the backbone to (e.g. `jnp.bfloat16`).
    """

    from .convert import build_from_pickle

    card = load_cards(__name__)[name]

    path = download(card.url, hash_prefix=card.hash)

    backbone = build_from_pickle(path)

    if dtype is not None:
        backbone = backbone.astype(dtype)

    return ElucidatedDenoiser(backbone=backbone)

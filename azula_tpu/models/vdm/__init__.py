r"""Velocity diffusion model (VDM / crowsonkb v-diffusion) family.

Capability parity with the reference `azula/plugins/vdm/__init__.py`: the
`VelocityDenoiser` (v-prediction preconditioning,
:math:`c_\mathrm{time} = \mathrm{atan2}(\sigma, \alpha) \cdot 2 / \pi`),
`load_model(name)` over `cards.yaml`, and a PyTorch-to-JAX weight converter.

References:
    | https://github.com/crowsonkb/v-diffusion-pytorch
"""

from __future__ import annotations

__all__ = [
    "VelocityDenoiser",
    "VDMUNet",
    "load_model",
    "make_model",
]

import jax
import jax.numpy as jnp
import math

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...hub import download
from ...nn.utils import get_module_dtype
from ...noise import Schedule, VPSchedule
from ..utils import load_cards
from .backbone import SPECS, VDMUNet


class VelocityDenoiser(Denoiser):
    r"""Creates a velocity (v-prediction) denoiser.

    Reference preconditioning (`vdm/__init__.py:54-75`):
    :math:`c_\mathrm{in} = 1/\sqrt{\alpha^2+\sigma^2}`,
    :math:`c_\mathrm{out} = -\sigma/\sqrt{\alpha^2+\sigma^2}`,
    :math:`c_\mathrm{skip} = \alpha/\sqrt{\alpha^2+\sigma^2}`.

    Arguments:
        backbone: A time conditional network.
        schedule: A noise schedule. Defaults to `VPSchedule(1e-2, 1e-2)`.
    """

    def __init__(self, backbone, schedule: Schedule | None = None) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = VPSchedule(alpha_min=1e-2, sigma_min=1e-2)
        else:
            self.schedule = schedule

    def __call__(self, x_t: Array, t: Array, **kwargs) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_out = -sigma_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_skip = alpha_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_time = jnp.arctan2(sigma_t, alpha_t).ravel() / math.pi * 2

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            (c_in * x_t).astype(dtype),
            c_time.astype(dtype),
            **kwargs,
        ).astype(x_t.dtype)

        mean = c_skip * x_t + c_out * output

        return DiracPosterior(mean=mean)


def make_model(model: str = "imagenet_128", *, key: Array | None = None) -> VelocityDenoiser:
    r"""Initializes a VDM denoiser from its declarative spec (or the dedicated
    CLIP-conditioned cc12m architecture)."""

    if key is None:
        key = jax.random.key(0)

    if model in ("cc12m_1", "cc12m_1_cfg"):
        from .cc12m import CC12M1Model

        backbone = CC12M1Model(key=key)
    else:
        backbone = VDMUNet(SPECS[model], key=key)

    return VelocityDenoiser(backbone)


def load_model(name: str, dtype=None) -> VelocityDenoiser:
    r"""Loads a pretrained VDM denoiser, converting the PyTorch checkpoint."""

    from .convert import convert_state_dict
    from ...utils.pytree import load_state_dict

    card = load_cards(__name__)[name]

    path = download(card.url, hash_prefix=card.hash)

    from ..ptread import load_pt

    state = load_pt(path)

    # Skip-init: abstract construction, all leaves come from the checkpoint
    from ...utils.pytree import filter_eval_shape

    denoiser = filter_eval_shape(make_model, **card.config)

    from ..utils import check_manifest

    check_manifest(state, "vdm", name, "model")

    sd = convert_state_dict(state)
    backbone = load_state_dict(denoiser.backbone, sd)

    if dtype is not None:
        backbone = backbone.astype(dtype)

    return denoiser.tree_replace(backbone=backbone)

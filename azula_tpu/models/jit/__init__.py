r"""Just Image Transformer (JiT) family.

Capability parity with the reference `azula/plugins/jit/__init__.py`: the
`JITDenoiser` (x-prediction on pixels, rectified-flow preconditioning with
:math:`c_\mathrm{in} = 1/(\alpha+\sigma)`, :math:`c_\mathrm{time} =
\alpha/(\alpha+\sigma)`, null label = `num_classes`), `load_model(name)` over
`cards.yaml`, and a PyTorch-to-JAX weight converter.

References:
    | Back to Basics: Let Denoising Generative Models Denoise (Li et al., 2025)
    | https://arxiv.org/abs/2511.13720
"""

from __future__ import annotations

__all__ = [
    "JITDenoiser",
    "JiT",
    "load_model",
    "make_model",
]

import jax
import jax.numpy as jnp
import os

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...hub import download
from ...nn.utils import get_module_dtype
from ...noise import RectifiedSchedule, Schedule
from ..utils import load_cards
from .backbone import JIT_CONFIGS, JiT


class JITDenoiser(Denoiser):
    r"""Creates a JiT denoiser (reference `jit/__init__.py:59-101`).

    Arguments:
        backbone: A time conditional network.
        schedule: A noise schedule. Defaults to :class:`RectifiedSchedule`.
        num_classes: The number of classes (the null label index).
    """

    def __init__(
        self,
        backbone: JiT,
        schedule: Schedule | None = None,
        num_classes: int = 1000,
    ) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = RectifiedSchedule()
        else:
            self.schedule = schedule

        self.num_classes = num_classes

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
            label: The class label as an integer, with shape :math:`(B)`.

        Returns:
            The Dirac delta :math:`\delta(X - \mu_\phi(x_t \mid c))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = 1 / (alpha_t + sigma_t)
        c_time = (alpha_t / (alpha_t + sigma_t)).ravel()

        B = x_t.shape[0]

        dtype = get_module_dtype(self.backbone)

        if label is None:
            label = jnp.full((B,), self.num_classes, dtype=jnp.int32)
        else:
            label = jnp.broadcast_to(label, (B,))

        output = self.backbone(
            (c_in * x_t).astype(dtype),
            jnp.broadcast_to(c_time, (B,)).astype(dtype),
            y=label,
            **kwargs,
        ).astype(x_t.dtype)

        return DiracPosterior(mean=output)


def make_model(model: str = "JiT-B/16", *, key: Array | None = None, **kwargs) -> JITDenoiser:
    r"""Initializes a JiT denoiser from its config name."""

    if key is None:
        key = jax.random.key(0)

    backbone = JiT(**JIT_CONFIGS[model], key=key, **kwargs)

    return JITDenoiser(backbone, num_classes=backbone.num_classes)


def load_model(name: str, ema: bool = True, dtype=None) -> JITDenoiser:
    r"""Loads a pretrained JiT denoiser, converting the PyTorch checkpoint
    (a Dropbox archive containing `checkpoint-last.pth`)."""

    from .convert import convert_state_dict
    from ...utils.pytree import load_state_dict

    card = load_cards(__name__)[name]

    archive = download(card.url, hash_prefix=card.hash, extract=True)

    from ..ptread import load_pt

    state = load_pt(os.path.join(archive, "checkpoint-last.pth"))

    state = state["model_ema1" if ema else "model"]
    state = {k.removeprefix("net."): v for k, v in state.items()}

    # Skip-init: abstract construction; RoPE tables are recomputed on the host
    from ...utils.pytree import filter_eval_shape

    denoiser = filter_eval_shape(make_model, **card.config)

    from ..utils import check_manifest

    check_manifest(state, "jit", name, "model")

    sd = convert_state_dict(denoiser.backbone, state)
    backbone = load_state_dict(denoiser.backbone, sd)

    if dtype is not None:
        backbone = backbone.astype(dtype)

    return denoiser.tree_replace(backbone=backbone)

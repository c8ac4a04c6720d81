r"""Elucidated latent diffusion model (ELDM / EDM2) family.

Capability parity with the reference `azula/plugins/eldm/__init__.py`: the
`ElucidatedLatentDenoiser` (same EDM preconditioning in latent space) and an
`AutoEncoder` wrapper with per-channel shift/scale buffers.

The EDM2 checkpoints are pickled torch modules (same constraint as
:mod:`azula_tpu.models.edm`); the VAE is `stabilityai/sd-vae-ft-mse` through
`diffusers` (optional).
"""

from __future__ import annotations

__all__ = [
    "AutoEncoder",
    "ElucidatedLatentDenoiser",
    "load_model",
]

import jax
import jax.numpy as jnp

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...hub import download
from ...nn.module import Module
from ...nn.utils import get_module_dtype
from ...noise import ElucidatedSchedule, Schedule
from ..utils import load_cards


class AutoEncoder(Module):
    r"""Auto-encoder wrapper with per-channel shift/scale buffers
    (reference `eldm/__init__.py:52-102`).

    Arguments:
        vae: A module with `encode(x) -> (mean, std)` and `decode(z) -> x`.
        shift: The per-channel latent shift, with shape :math:`(C,)`.
        scale: The per-channel latent scale, with shape :math:`(C,)`.
    """

    def __init__(self, vae, shift: Array, scale: Array) -> None:
        self.vae = vae
        self.shift = jnp.asarray(shift)
        self.scale = jnp.asarray(scale)

    def encode(self, x: Array, key: Array) -> Array:
        mean, std = self.vae.encode(x)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)

        return z * self.scale + self.shift

    def decode(self, z: Array) -> Array:
        z = (z - self.shift) / self.scale

        return self.vae.decode(z)


class ElucidatedLatentDenoiser(Denoiser):
    r"""Creates an elucidated latent denoiser (reference `eldm/__init__.py:105-164`).

    Arguments:
        backbone: A noise conditional network (EDM2 convention).
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
        z_t: Array,
        t: Array,
        label: Array | None = None,
        **kwargs,
    ) -> DiracPosterior:
        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, z_t)

        c_in = 1 / alpha_t
        c_time = (sigma_t / alpha_t).reshape(jnp.shape(t))

        dtype = get_module_dtype(self.backbone)

        mean = self.backbone(
            (c_in * z_t).astype(dtype),
            c_time.astype(dtype),
            class_labels=None if label is None else label.astype(dtype),
            **kwargs,
        ).astype(z_t.dtype)

        return DiracPosterior(mean=mean)


def load_model(name: str, dtype=None):
    r"""Loads a pretrained ELDM (EDM2) latent denoiser with native JAX
    backbones (reference `eldm/__init__.py:164-200`, minus the NVlabs-repo and
    diffusers dependencies).

    The EDM2 pickle is read with the stub persistence namespace
    (:mod:`azula_tpu.models.edm.convert`); the VAE is the native
    :class:`~azula_tpu.models.autoencoder.AutoencoderKL` converted from
    `stabilityai/sd-vae-ft-mse`.

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: Optional dtype for the backbones (e.g. `jnp.bfloat16`).

    Returns:
        A `(denoiser, autoencoder)` pair.
    """

    from safetensors import numpy as st

    from ...utils.pytree import filter_eval_shape, load_state_dict
    from ..autoencoder import AutoencoderKL, convert_vae_state_dict
    from .convert import build_from_pickle

    card = load_cards(__name__)[name]

    path = download(card.url, hash_prefix=card.hash)

    backbone, shift, scale = build_from_pickle(path)

    if shift is None or scale is None:
        raise RuntimeError(
            f"checkpoint '{name}' carries no latent encoder statistics "
            "(expected an 'encoder' entry with bias/scale buffers)"
        )

    if dtype is not None:
        backbone = backbone.astype(dtype)

    denoiser = ElucidatedLatentDenoiser(backbone=backbone)

    vae_sd = st.load_file(
        download(
            "https://huggingface.co/stabilityai/sd-vae-ft-mse/resolve/main/"
            "diffusion_pytorch_model.safetensors"
        )
    )
    vae = filter_eval_shape(AutoencoderKL, key=jax.random.key(0))
    vae = load_state_dict(vae, convert_vae_state_dict(vae, vae_sd))

    if dtype is not None:
        vae = vae.astype(dtype)

    autoencoder = AutoEncoder(vae=vae, shift=shift, scale=scale)

    return denoiser, autoencoder

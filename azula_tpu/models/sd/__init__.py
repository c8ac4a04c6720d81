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
    "make_backbone",
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


# Architecture hyperparameters of the two SD checkpoint generations. The
# reference gets these from the diffusers pipeline config
# (`sd/__init__.py:240-252`); they are fixed per generation, so the native
# loader carries them directly.
ARCHS = {
    "sd1": dict(  # noqa: C408
        unet=dict(  # noqa: C408
            cross_attention_dim=768,
            attention_head_dim=8,
            use_linear_projection=False,
        ),
        clip=dict(hidden=768, layers=12, heads=12, intermediate=3072, act="quick_gelu"),  # noqa: C408
        scale=0.18215,
    ),
    "sd2": dict(  # noqa: C408
        unet=dict(  # noqa: C408
            cross_attention_dim=1024,
            attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True,
        ),
        clip=dict(hidden=1024, layers=23, heads=16, intermediate=4096, act="gelu"),  # noqa: C408
        scale=0.18215,
    ),
}


def _arch(name: str) -> dict:
    return ARCHS["sd2" if name.startswith("sd_2") else "sd1"]


def make_backbone(name: str = "sd_1.5", *, key: Array | None = None):
    r"""Initializes the native SD UNet matching a checkpoint generation.

    Arguments:
        name: A card name (`'sd_1.5'`, `'sd_2'`, ...) or generation (`'sd1'`/`'sd2'`).
        key: PRNG key for initialization.
    """

    from .backbone import SDUNet

    if key is None:
        key = jax.random.key(0)

    arch = ARCHS[name] if name in ARCHS else _arch(name)

    return SDUNet(**arch["unet"], key=key)


def _hub_file(repo: str, sub: str) -> str:
    from ...hub import download

    return download(f"https://huggingface.co/{repo}/resolve/main/{sub}")


def load_model(name: str, dtype=jnp.bfloat16):
    r"""Loads a pretrained SD denoiser with native JAX backbones
    (reference `sd/__init__.py:226-273`, minus the diffusers dependency).

    Downloads the UNet/VAE/CLIP safetensors from the checkpoint repository,
    converts them to the native channels-last modules, and returns the same
    triple as the reference.

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: The backbone dtype (bfloat16 is TPU-native; the checkpoints
            ship float16).

    Returns:
        A `(denoiser, autoencoder, textencoder)` triple.
    """

    from safetensors import numpy as st

    from ...utils.pytree import filter_eval_shape, load_state_dict
    from ..autoencoder import AutoencoderKL, convert_vae_state_dict
    from ..clip import CLIPTextEncoder, convert_clip_state_dict
    from .backbone import SDUNet
    from .convert import convert_unet_state_dict

    card = load_cards(__name__)[name]
    arch = _arch(name)
    variant = f".{card.variant}" if getattr(card, "variant", None) else ""

    from ..autoencoder import canonicalize_vae_keys
    from ..clip import canonicalize_clip_keys
    from ..utils import check_manifest

    # UNet
    unet_sd = st.load_file(
        _hub_file(card.repo, f"unet/diffusion_pytorch_model{variant}.safetensors")
    )
    check_manifest(unet_sd, "sd", name, "unet")
    unet = filter_eval_shape(SDUNet, **arch["unet"], key=jax.random.key(0))
    unet = load_state_dict(unet, convert_unet_state_dict(unet, unet_sd))
    unet = unet.astype(dtype)

    denoiser = StableDenoiser(backbone=unet, **card.config)

    # VAE
    vae_sd = st.load_file(
        _hub_file(card.repo, f"vae/diffusion_pytorch_model{variant}.safetensors")
    )
    check_manifest(vae_sd, "sd", name, "vae", canonicalize=canonicalize_vae_keys)
    vae = filter_eval_shape(AutoencoderKL, key=jax.random.key(0))
    vae = load_state_dict(vae, convert_vae_state_dict(vae, vae_sd))
    autoencoder = AutoEncoder(vae=vae.astype(dtype), scale=arch["scale"])

    # Text encoder
    clip_sd = st.load_file(_hub_file(card.repo, f"text_encoder/model{variant}.safetensors"))
    check_manifest(clip_sd, "sd", name, "text_encoder", canonicalize=canonicalize_clip_keys)
    clip = filter_eval_shape(CLIPTextEncoder, **arch["clip"], key=jax.random.key(0))
    clip = load_state_dict(clip, convert_clip_state_dict(clip, clip_sd))

    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer(
        vocab_file=_hub_file(card.repo, "tokenizer/vocab.json"),
        merges_file=_hub_file(card.repo, "tokenizer/merges.txt"),
    )

    textencoder = TextEncoder(clip=clip.astype(dtype), tokenizer=tokenizer)

    return denoiser, autoencoder, textencoder

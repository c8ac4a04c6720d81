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
import numpy as np
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
        if jnp.ndim(clip_out) == 3:  # native encoder: pool at the EOS token
            ids = jnp.asarray(clip_tokens.input_ids)
            clip_out = jnp.asarray(clip_out)[
                jnp.arange(ids.shape[0]), jnp.argmax(ids, axis=-1)
            ]

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
    def coordinates(H: int, W: int) -> np.ndarray:
        r"""Cached (0, y, x) image-coordinate ids (reference
        `flux/__init__.py:179-195`). Computed host-side in NumPy — caching
        device arrays would leak tracers across `jit`/`scan` traces."""

        z = np.zeros(1, dtype=np.float32)
        y = np.arange(H, dtype=np.float32)
        x = np.arange(W, dtype=np.float32)

        grid = np.stack(np.meshgrid(z, y, x, indexing="ij"), axis=-1)

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

        img_ids = jnp.asarray(self.coordinates(H, W), dtype=dtype)
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


def load_model(name: str = "flux_1_dev", dtype=jnp.bfloat16):
    r"""Loads a pretrained Flux denoiser with native JAX backbones
    (reference `flux/__init__.py:260-303`, minus the diffusers dependency).

    Downloads the (sharded) transformer, VAE, CLIP and T5 safetensors from the
    checkpoint repository and converts them to the native channels-last
    modules.

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: The backbone dtype (the checkpoints ship bfloat16).

    Returns:
        A `(denoiser, autoencoder, textencoder)` triple.
    """

    from transformers import CLIPTokenizer, T5TokenizerFast

    from ...hub import download
    from ...utils.pytree import filter_eval_shape, load_state_dict
    from ..autoencoder import AutoencoderKL, convert_vae_state_dict
    from ..clip import CLIPTextEncoder, convert_clip_state_dict
    from ..t5 import T5Encoder, convert_t5_state_dict
    from ..utils import load_hub_safetensors
    from .backbone import FluxTransformer
    from .convert import convert_flux_state_dict

    card = load_cards(__name__)[name]
    repo = card.repo
    variant = getattr(card, "variant", None)
    base = f"https://huggingface.co/{repo}/resolve/main"

    guidance = "schnell" not in name  # dev is guidance-distilled

    from ..autoencoder import canonicalize_vae_keys
    from ..clip import canonicalize_clip_keys
    from ..t5 import canonicalize_t5_keys
    from ..utils import check_manifest

    # Transformer (sharded bf16)
    sd = load_hub_safetensors(repo, "transformer/diffusion_pytorch_model", variant)
    check_manifest(sd, "flux", name, "transformer")
    transformer = filter_eval_shape(
        FluxTransformer, guidance_embeds=guidance, key=jax.random.key(0)
    )
    transformer = load_state_dict(transformer, convert_flux_state_dict(transformer, sd))

    denoiser = FluxDenoiser(backbone=transformer.astype(dtype))

    # VAE: 16 latent channels, no quant convs; latents are 2x2-packed by the
    # wrapper (shift/scale factors of the published config)
    vae_sd = load_hub_safetensors(repo, "vae/diffusion_pytorch_model", variant)
    check_manifest(vae_sd, "flux", name, "vae", canonicalize=canonicalize_vae_keys)
    vae = filter_eval_shape(
        AutoencoderKL, latent_channels=16, use_quant_conv=False, key=jax.random.key(0)
    )
    vae = load_state_dict(vae, convert_vae_state_dict(vae, vae_sd))
    autoencoder = AutoEncoder(vae=vae.astype(dtype), shift=0.1159, scale=0.3611)

    # Text encoders: CLIP (pooled) + T5-XXL (sequence)
    clip_sd = load_hub_safetensors(repo, "text_encoder/model", variant)
    check_manifest(clip_sd, "flux", name, "text_encoder", canonicalize=canonicalize_clip_keys)
    clip = filter_eval_shape(CLIPTextEncoder, key=jax.random.key(0))
    clip = load_state_dict(clip, convert_clip_state_dict(clip, clip_sd))

    t5_sd = load_hub_safetensors(repo, "text_encoder_2/model", variant)
    check_manifest(t5_sd, "flux", name, "text_encoder_2", canonicalize=canonicalize_t5_keys)
    t5 = filter_eval_shape(T5Encoder, key=jax.random.key(0))
    t5 = load_state_dict(t5, convert_t5_state_dict(t5, t5_sd))

    clip_tokenizer = CLIPTokenizer(
        vocab_file=download(f"{base}/tokenizer/vocab.json"),
        merges_file=download(f"{base}/tokenizer/merges.txt"),
    )
    t5_tokenizer = T5TokenizerFast(
        tokenizer_file=download(f"{base}/tokenizer_2/tokenizer.json")
    )

    textencoder = TextEncoder(
        clip=clip.astype(dtype),
        clip_tokenizer=clip_tokenizer,
        t5=t5.astype(dtype),
        t5_tokenizer=t5_tokenizer,
    )

    return denoiser, autoencoder, textencoder

r"""Sana family.

Capability parity with the reference `azula/plugins/sana/__init__.py`: the
`SanaDenoiser` (rectified-flow preconditioning with
:math:`c_\mathrm{time} \times 1000`), the DC-AE (32x downsample) `AutoEncoder`
wrapper, and the Gemma `TextEncoder` with the hardcoded prompt-enhancement
instruction prefix and last-token selection.

Backbone-agnostic; pretrained loading is fully native (linear-attention DiT,
Gemma 2 encoder, and DC-AE latent autoencoder all convert from safetensors
without torch or diffusers).
"""

from __future__ import annotations

__all__ = [
    "AutoEncoder",
    "TextEncoder",
    "SanaDenoiser",
    "load_model",
]

import jax
import jax.numpy as jnp

from collections.abc import Sequence
from jax import Array

from ...denoise import Denoiser, DiracPosterior, broadcast_scales
from ...nn.module import Module
from ...nn.utils import get_module_dtype
from ...noise import DecaySchedule, Schedule
from ..utils import load_cards

# The reference's prompt-enhancement instruction prefix
# (`sana/__init__.py:110-119`), reproduced verbatim for checkpoint parity.
DEFAULT_INSTRUCTIONS = (
    "Given a user prompt, generate an 'Enhanced prompt' that provides detailed visual descriptions suitable for image generation. Evaluate the level of detail in the user prompt:",
    "- If the prompt is simple, focus on adding specifics about colors, shapes, sizes, textures, and spatial relationships to create vivid and concrete scenes.",
    "- If the prompt is already detailed, refine and enhance the existing details slightly without overcomplicating.",
    "Here are examples of how to transform or refine prompts:",
    "- User Prompt: A cat sleeping -> Enhanced: A small, fluffy white cat curled up in a round shape, sleeping peacefully on a warm sunny windowsill, surrounded by pots of blooming red flowers.",
    "- User Prompt: A busy city street -> Enhanced: A bustling city street scene at dusk, featuring glowing street lamps, a diverse crowd of people in colorful clothing, and a double-decker bus passing by towering glass skyscrapers.",
    "Please generate only the enhanced description for the prompt below and avoid including any additional commentary or evaluations:",
    "User Prompt: ",
)


class AutoEncoder(Module):
    r"""DC-AE auto-encoder wrapper (32x downsample, deterministic encoder;
    reference `sana/__init__.py:40-86`).

    Arguments:
        ae: A module with `encode(x) -> z` and `decode(z) -> x`.
        scale: The latent scaling factor.
    """

    def __init__(self, ae, scale: float = 1.0) -> None:
        self.ae = ae
        self.scale = scale

    def encode(self, x: Array) -> Array:
        r"""Encodes images (pixel values in [-1, 1]) to scaled latents."""

        return self.ae.encode(x) * self.scale

    def decode(self, z: Array) -> Array:
        return self.ae.decode(z / self.scale)


class TextEncoder(Module):
    r"""Gemma text encoder with instruction prefix and last-`max_length`-token
    selection (reference `sana/__init__.py:89-163`).

    Arguments:
        gemma: A Gemma language model (host-side).
        tokenizer: The matching tokenizer.
        max_length: The number of prompt tokens kept.
    """

    def __init__(self, gemma, tokenizer, max_length: int = 300) -> None:
        self.gemma = gemma
        self.tokenizer = tokenizer
        self.tokenizer.padding_side = "right"
        self.max_length = max_length

    def __call__(
        self,
        prompt: str | Sequence[str],
        instructions: Sequence[str] = DEFAULT_INSTRUCTIONS,
    ) -> dict[str, Array]:
        if isinstance(prompt, str):
            prompt = [prompt]

        prompt = [text.lower().strip() for text in prompt]

        if instructions:
            chi = "\n".join(instructions)
            prompt = [chi + text if text else "" for text in prompt]
            max_length_all = self.max_length + len(self.tokenizer.encode(chi)) - 2
        else:
            max_length_all = self.max_length

        tokens = self.tokenizer(
            prompt,
            add_special_tokens=True,
            truncation=True,
            max_length=max_length_all,
            padding="max_length",
            return_tensors="np",
        )

        prompt_embeds = self.gemma(
            tokens.input_ids, attention_mask=tokens.attention_mask
        )
        if hasattr(prompt_embeds, "last_hidden_state"):  # transformers output
            prompt_embeds = prompt_embeds.last_hidden_state
        if hasattr(prompt_embeds, "detach"):
            prompt_embeds = prompt_embeds.detach().cpu().numpy()
        prompt_embeds = jnp.asarray(prompt_embeds)
        prompt_mask = jnp.asarray(tokens.attention_mask)

        select = [0, *range(-self.max_length + 1, 0)]

        return {
            "prompt_embeds": prompt_embeds[:, select],
            "prompt_mask": prompt_mask[:, select].astype(prompt_embeds.dtype),
        }


class SanaDenoiser(Denoiser):
    r"""Creates a Sana denoiser (reference `sana/__init__.py:165-230`).

    Arguments:
        backbone: A time conditional network (diffusers Sana convention).
        schedule: A noise schedule. Defaults to :class:`DecaySchedule`.
    """

    def __init__(self, backbone, schedule: Schedule | None = None) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = DecaySchedule()
        else:
            self.schedule = schedule

    def __call__(
        self,
        z_t: Array,
        t: Array,
        prompt_embeds: Array,
        prompt_mask: Array,
        **kwargs,
    ) -> DiracPosterior:
        r"""
        Arguments:
            z_t: A noisy latent, channels-last, with shape :math:`(B, H, W, C)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            prompt_embeds: Gemma-encoded prompt, with shape :math:`(B, L, D)`.
            prompt_mask: Text attention mask, with shape :math:`(B, L)`.

        Returns:
            The Dirac delta :math:`\delta(Z - \mu_\phi(z_t \mid y))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, z_t)

        c_in = 1 / (alpha_t + sigma_t)
        c_out = -sigma_t / (alpha_t + sigma_t)
        c_skip = 1 / (alpha_t + sigma_t)
        c_time = 1000 * (sigma_t / (alpha_t + sigma_t)).ravel()

        B = z_t.shape[0]
        L, D = prompt_embeds.shape[-2:]

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            timestep=jnp.broadcast_to(c_time, (B,)).astype(dtype),
            hidden_states=(c_in * z_t).astype(dtype),
            encoder_hidden_states=jnp.broadcast_to(prompt_embeds.astype(dtype), (B, L, D)),
            encoder_attention_mask=jnp.broadcast_to(prompt_mask.astype(dtype), (B, L)),
            **kwargs,
        ).astype(z_t.dtype)

        mean = c_skip * z_t + c_out * output

        return DiracPosterior(mean=mean)


# Architecture hyperparameters per model size (the diffusers transformer
# config of the published checkpoints). SANA 1.5 adds across-heads q/k RMS
# normalization; the 4.8B model scales depth (20 -> 60 layers) at the same
# width, per the SANA-1.5 depth-growth recipe.
ARCHS = {
    "0.6b": dict(  # noqa: C408
        num_attention_heads=36,
        attention_head_dim=32,
        num_cross_attention_heads=16,
        cross_attention_head_dim=72,
        num_layers=28,
        mlp_ratio=2.5,
    ),
    "1.6b": dict(  # noqa: C408
        num_attention_heads=70,
        attention_head_dim=32,
        num_cross_attention_heads=20,
        cross_attention_head_dim=112,
        num_layers=20,
        mlp_ratio=2.5,
    ),
    "1.5-1.6b": dict(  # noqa: C408
        num_attention_heads=70,
        attention_head_dim=32,
        num_cross_attention_heads=20,
        cross_attention_head_dim=112,
        num_layers=20,
        mlp_ratio=2.5,
        qk_norm=True,
    ),
    "1.5-4.8b": dict(  # noqa: C408
        num_attention_heads=70,
        attention_head_dim=32,
        num_cross_attention_heads=20,
        cross_attention_head_dim=112,
        num_layers=60,
        mlp_ratio=2.5,
        qk_norm=True,
    ),
}


# Exact card-name -> architecture mapping (every registry entry); free-form
# names fall back to size-token heuristics.
CARD_ARCHS = {
    "sana_0.6b_512": "0.6b",
    "sana_0.6b_1024": "0.6b",
    "sana_1.6b_512": "1.6b",
    "sana_1.6b_1024": "1.6b",
    "sana_1.6b_2048": "1.6b",
    "sana_1.6b_4096": "1.6b",
    "sana_1.5_1.6b_1024": "1.5-1.6b",
    "sana_1.5_4.8b_1024": "1.5-4.8b",
}


def _arch(name: str) -> dict:
    if name in CARD_ARCHS:
        return ARCHS[CARD_ARCHS[name]]
    if "4.8b" in name:
        return ARCHS["1.5-4.8b"]
    if "1.5_" in name or name.startswith("sana_1.5"):
        return ARCHS["1.5-1.6b"]
    if "0.6b" in name:
        return ARCHS["0.6b"]
    return ARCHS["1.6b"]


def load_model(name: str, dtype=jnp.bfloat16):
    r"""Loads a pretrained Sana denoiser with native JAX backbones
    (reference `sana/__init__.py:237-277`, minus the diffusers dependency).

    The transformer, the Gemma text encoder, and the DC-AE latent autoencoder
    all convert natively from the checkpoint safetensors.

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: The backbone dtype.

    Returns:
        A `(denoiser, autoencoder, textencoder)` triple.
    """

    from transformers import GemmaTokenizerFast

    from ...hub import download
    from ...utils.pytree import filter_eval_shape, load_state_dict
    from ..gemma import Gemma2TextModel, convert_gemma_state_dict
    from ..utils import load_hub_safetensors
    from .autoencoder import AutoencoderDC, convert_dcae_state_dict
    from .backbone import SanaTransformer
    from .convert import convert_sana_state_dict

    card = load_cards(__name__)[name]
    repo = card.repo
    variant = getattr(card, "variant", None)
    base = f"https://huggingface.co/{repo}/resolve/main"

    arch = _arch(name)

    from ..gemma import canonicalize_gemma_keys
    from ..utils import check_manifest

    sd = load_hub_safetensors(repo, "transformer/diffusion_pytorch_model", variant)
    check_manifest(sd, "sana", name, "transformer")
    transformer = filter_eval_shape(SanaTransformer, **arch, key=jax.random.key(0))
    transformer = load_state_dict(
        transformer, convert_sana_state_dict(transformer, sd)
    )

    denoiser = SanaDenoiser(backbone=transformer.astype(dtype))

    dtype_map = getattr(card, "dtype_map", None) or {}

    gemma_sd = load_hub_safetensors(repo, "text_encoder/model", None)
    check_manifest(gemma_sd, "sana", name, "text_encoder", canonicalize=canonicalize_gemma_keys)
    gemma = filter_eval_shape(Gemma2TextModel, key=jax.random.key(0))
    gemma = load_state_dict(gemma, convert_gemma_state_dict(gemma, gemma_sd))

    tokenizer = GemmaTokenizerFast(
        tokenizer_file=download(f"{base}/tokenizer/tokenizer.json")
    )

    textencoder = TextEncoder(
        gemma=gemma.astype(dtype_map.get("text_encoder", jnp.bfloat16)),
        tokenizer=tokenizer,
    )

    ae_sd = load_hub_safetensors(repo, "vae/diffusion_pytorch_model", None)
    check_manifest(ae_sd, "sana", name, "vae")
    dcae = filter_eval_shape(AutoencoderDC, key=jax.random.key(0))
    dcae = load_state_dict(dcae, convert_dcae_state_dict(dcae, ae_sd))

    autoencoder = AutoEncoder(
        ae=dcae.astype(dtype_map.get("vae", jnp.float32)), scale=0.41407
    )

    return denoiser, autoencoder, textencoder

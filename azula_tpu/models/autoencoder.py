r"""Variational image autoencoder (AutoencoderKL), TPU-native.

A channels-last JAX reimplementation of the diffusers ``AutoencoderKL`` — the
latent codec of the SD, ELDM (sd-vae-ft-mse) and Flux families (reference load
paths: `azula/plugins/sd/__init__.py:263-266`,
`azula/plugins/eldm/__init__.py:176-200`, `azula/plugins/flux/__init__.py`).
Encoder/decoder resnet towers with a single-head attention mid block; moments
are returned as `(mean, std)`.

Structure and naming are kept isomorphic to the checkpoint layout
(``encoder.down_blocks.N.resnets.M...``) so the weight converter
(:func:`convert_vae_state_dict`) is a mechanical walk.
"""

from __future__ import annotations

__all__ = [
    "AutoencoderKL",
    "convert_vae_state_dict",
]

import jax
import jax.numpy as jnp

from collections.abc import Sequence
from jax import Array

from ..nn.layers import Conv, GroupNorm, Linear
from ..nn.module import Module
from .convert_utils import Converter


def _conv(in_ch: int, out_ch: int, k: int = 3, stride: int = 1, pad: int | None = None, *, key: Array) -> Conv:
    if pad is None:
        pad = (k - 1) // 2
    return Conv(
        in_ch,
        out_ch,
        kernel_size=(k, k),
        stride=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        key=key,
    )


class VAEResnetBlock(Module):
    r"""GN-SiLU-conv x2 with 1x1 shortcut (no time conditioning), eps 1e-6."""

    def __init__(self, in_channels: int, out_channels: int, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.norm1 = GroupNorm(32, in_channels, eps=1e-6, affine=True)
        self.conv1 = _conv(in_channels, out_channels, key=k1)
        self.norm2 = GroupNorm(32, out_channels, eps=1e-6, affine=True)
        self.conv2 = _conv(out_channels, out_channels, key=k2)

        if in_channels != out_channels:
            self.conv_shortcut = Conv(in_channels, out_channels, kernel_size=(1, 1), key=k3)
        else:
            self.conv_shortcut = None

    def __call__(self, x: Array) -> Array:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))

        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)

        return skip + h


class VAEAttention(Module):
    r"""Single-head attention over spatial positions with GroupNorm and
    residual (the diffusers VAE mid-block attention)."""

    def __init__(self, channels: int, *, key: Array) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.group_norm = GroupNorm(32, channels, eps=1e-6, affine=True)
        self.to_q = Linear(channels, channels, key=k1)
        self.to_k = Linear(channels, channels, key=k2)
        self.to_v = Linear(channels, channels, key=k3)
        self.to_out = Linear(channels, channels, key=k4)

    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape

        h = self.group_norm(x).reshape(B, H * W, C)

        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)

        logits = jnp.einsum("bld,bsd->bls", q, k) / jnp.sqrt(C)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        a = jnp.einsum("bls,bsd->bld", weights, v)

        return x + self.to_out(a).reshape(B, H, W, C)


class VAEMidBlock(Module):
    def __init__(self, channels: int, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.resnets = [
            VAEResnetBlock(channels, channels, key=k1),
            VAEResnetBlock(channels, channels, key=k3),
        ]
        self.attentions = [VAEAttention(channels, key=k2)]

    def __call__(self, x: Array) -> Array:
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        x = self.resnets[1](x)

        return x


class VAEDownBlock(Module):
    r"""`layers` resnets + optional stride-2 downsampler with asymmetric
    (0, 1) padding (diffusers `DownEncoderBlock2D`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        layers: int,
        add_downsample: bool,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, layers + 1)

        self.resnets = [
            VAEResnetBlock(in_channels if i == 0 else out_channels, out_channels, key=keys[i])
            for i in range(layers)
        ]

        if add_downsample:
            self.downsamplers = [
                _conv(out_channels, out_channels, stride=2, pad=0, key=keys[-1])
            ]
        else:
            self.downsamplers = None

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)

        if self.downsamplers is not None:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = self.downsamplers[0](x)

        return x


class VAEUpBlock(Module):
    r"""`layers` resnets + optional nearest-x2 upsampler
    (diffusers `UpDecoderBlock2D`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        layers: int,
        add_upsample: bool,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, layers + 1)

        self.resnets = [
            VAEResnetBlock(in_channels if i == 0 else out_channels, out_channels, key=keys[i])
            for i in range(layers)
        ]

        if add_upsample:
            self.upsamplers = [_conv(out_channels, out_channels, key=keys[-1])]
        else:
            self.upsamplers = None

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)

        if self.upsamplers is not None:
            x = jnp.repeat(x, 2, axis=-3)
            x = jnp.repeat(x, 2, axis=-2)
            x = self.upsamplers[0](x)

        return x


class VAEEncoder(Module):
    def __init__(
        self,
        in_channels: int,
        latent_channels: int,
        block_out_channels: Sequence[int],
        layers_per_block: int,
        *,
        key: Array,
    ) -> None:
        n = len(block_out_channels)
        keys = jax.random.split(key, n + 3)

        self.conv_in = _conv(in_channels, block_out_channels[0], key=keys[0])

        self.down_blocks = []
        ch = block_out_channels[0]
        for i, out_ch in enumerate(block_out_channels):
            self.down_blocks.append(
                VAEDownBlock(
                    ch,
                    out_ch,
                    layers_per_block,
                    add_downsample=i < n - 1,
                    key=keys[1 + i],
                )
            )
            ch = out_ch

        self.mid_block = VAEMidBlock(ch, key=keys[-2])
        self.conv_norm_out = GroupNorm(32, ch, eps=1e-6, affine=True)
        self.conv_out = _conv(ch, 2 * latent_channels, key=keys[-1])

    def __call__(self, x: Array) -> Array:
        h = self.conv_in(x)

        for block in self.down_blocks:
            h = block(h)

        h = self.mid_block(h)
        h = jax.nn.silu(self.conv_norm_out(h))

        return self.conv_out(h)


class VAEDecoder(Module):
    def __init__(
        self,
        out_channels: int,
        latent_channels: int,
        block_out_channels: Sequence[int],
        layers_per_block: int,
        *,
        key: Array,
    ) -> None:
        n = len(block_out_channels)
        keys = jax.random.split(key, n + 3)

        reversed_out = tuple(reversed(block_out_channels))

        self.conv_in = _conv(latent_channels, reversed_out[0], key=keys[0])
        self.mid_block = VAEMidBlock(reversed_out[0], key=keys[1])

        self.up_blocks = []
        ch = reversed_out[0]
        for i, out_ch in enumerate(reversed_out):
            self.up_blocks.append(
                VAEUpBlock(
                    ch,
                    out_ch,
                    layers_per_block + 1,
                    add_upsample=i < n - 1,
                    key=keys[2 + i],
                )
            )
            ch = out_ch

        self.conv_norm_out = GroupNorm(32, ch, eps=1e-6, affine=True)
        self.conv_out = _conv(ch, out_channels, key=keys[-1])

    def __call__(self, z: Array) -> Array:
        h = self.conv_in(z)
        h = self.mid_block(h)

        for block in self.up_blocks:
            h = block(h)

        h = jax.nn.silu(self.conv_norm_out(h))

        return self.conv_out(h)


class AutoencoderKL(Module):
    r"""The KL-regularized image autoencoder.

    Defaults correspond to the SD VAE (f8, 4 latent channels); Flux uses
    ``latent_channels=16``.

    Arguments:
        in_channels: Image channels.
        latent_channels: Latent channels.
        block_out_channels: Channels per resolution level.
        layers_per_block: Encoder resnets per level (the decoder uses one more).
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        in_channels: int = 3,
        latent_channels: int = 4,
        block_out_channels: Sequence[int] = (128, 256, 512, 512),
        layers_per_block: int = 2,
        use_quant_conv: bool = True,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.encoder = VAEEncoder(
            in_channels, latent_channels, block_out_channels, layers_per_block, key=k1
        )
        self.decoder = VAEDecoder(
            in_channels, latent_channels, block_out_channels, layers_per_block, key=k2
        )

        if use_quant_conv:  # Flux drops the quant convs
            self.quant_conv = Conv(
                2 * latent_channels, 2 * latent_channels, kernel_size=(1, 1), key=k3
            )
            self.post_quant_conv = Conv(
                latent_channels, latent_channels, kernel_size=(1, 1), key=k4
            )
        else:
            self.quant_conv = None
            self.post_quant_conv = None

    def encode(self, x: Array) -> tuple[Array, Array]:
        r"""Encodes images to latent moments `(mean, std)`, channels-last."""

        moments = self.encoder(x)

        if self.quant_conv is not None:
            moments = self.quant_conv(moments)

        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)

        return mean, jnp.exp(0.5 * logvar)

    def decode(self, z: Array) -> Array:
        r"""Decodes latents to images, channels-last."""

        if self.post_quant_conv is not None:
            z = self.post_quant_conv(z)

        return self.decoder(z)


def canonicalize_vae_keys(torch_sd) -> dict:
    r"""Renames diffusers `AutoencoderKL` keys to the converter's canonical
    space, covering both attention key generations (`to_q/to_k/to_v/to_out.0`
    and the legacy `query/key/value/proj_attn`). Key-only; values pass
    through."""

    legacy = {
        "query": "to_q",
        "key": "to_k",
        "value": "to_v",
        "proj_attn": "to_out.0",
    }

    sd = {}
    for k, v in torch_sd.items():
        parts = k.split(".")
        if len(parts) >= 2 and parts[-2] in legacy:
            k = ".".join(parts[:-2] + [legacy[parts[-2]], parts[-1]])
        # downsamplers.0.conv -> downsamplers.0 (ours is the bare conv)
        k = k.replace("downsamplers.0.conv.", "downsamplers.0.")
        k = k.replace("upsamplers.0.conv.", "upsamplers.0.")
        sd[k] = v

    return sd


def convert_vae_state_dict(module: AutoencoderKL, torch_sd) -> dict:
    r"""Converts a diffusers `AutoencoderKL` state dict
    (`vae/diffusion_pytorch_model.safetensors`)."""

    sd = None if torch_sd is None else canonicalize_vae_keys(torch_sd)

    converter = Converter(
        sd, renames={("VAEAttention", "to_out"): "to_out.0"}
    )
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

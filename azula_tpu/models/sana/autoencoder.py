r"""DC-AE (deep-compression autoencoder), TPU-native.

A channels-last JAX reimplementation of the 32x-downsampling latent codec of
the Sana checkpoints (diffusers ``AutoencoderDC`` semantics, itself a
conversion of MIT-HAN-LAB efficientvit's ``dc-ae-f32c32-sana`` — the module
the reference loads through diffusers, `azula/plugins/sana/__init__.py:40-86`
and `:237-277`):

- ResBlock towers (conv-SiLU-conv with channel RMSNorm) at high resolution;
- EfficientViT blocks at low resolution: multiscale ReLU *linear* attention
  (O(L) in sequence length, fused-QKV channel grouping) followed by a gated
  MobileNet conv FFN (GLUMBConv);
- strided-conv downsampling with pixel-unshuffle channel-averaging shortcuts;
- nearest-interpolate + conv upsampling in the decoder (the Sana variant;
  pixel-shuffle with channel-duplicating shortcut is also supported);
- residual latent projections (group-average in, channel-duplicate out).

The encoder is deterministic (no KL posterior). Structure and naming are kept
isomorphic to the checkpoint layout (``encoder.down_blocks.N.M...``) so the
weight converter (:func:`convert_dcae_state_dict`) is a mechanical walk.

Without a local diffusers/efficientvit oracle, fidelity is established by the
fused-QKV weight-slicing relationship between the two public implementations
(diffusers' `to_q`/`to_k`/`to_v` are row-slices of efficientvit's fused
projection; the `(B, -1, 3 d, HW)` regrouping defines the channel semantics)
and enforced by the strict converter: any structural drift from a real
checkpoint fails loudly with unconverted/missing keys.
"""

from __future__ import annotations

__all__ = [
    "AutoencoderDC",
    "convert_dcae_state_dict",
]

import jax
import jax.numpy as jnp

from collections.abc import Sequence
from jax import Array

from ...nn.layers import Conv, Linear
from ...nn.module import Module
from ..convert_utils import Converter


def _conv(in_ch: int, out_ch: int, k: int = 3, stride: int = 1, bias: bool = True, *, key: Array) -> Conv:
    pad = (k - 1) // 2
    return Conv(
        in_ch,
        out_ch,
        kernel_size=(k, k),
        stride=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        bias=bias,
        key=key,
    )


def _pixel_unshuffle(x: Array, r: int) -> Array:
    r"""Channels-last pixel unshuffle: :math:`(B, Hr, Wr, C) \to (B, H, W, Cr^2)`
    with torch's channel order :math:`c r^2 + i r + j`."""

    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(B, H, W, C * r * r)


def _pixel_shuffle(x: Array, r: int) -> Array:
    r"""Channels-last pixel shuffle: :math:`(B, H, W, Cr^2) \to (B, Hr, Wr, C)`."""

    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, H * r, W * r, C)


class RMSNorm2d(Module):
    r"""Channel RMSNorm with learned scale and bias (diffusers `RMSNorm` with
    ``elementwise_affine=True, bias=True``; efficientvit's ``trms2d``).

    Statistics are computed in float32 over the channel (last) axis.
    """

    def __init__(self, dim: int, eps: float = 1e-5) -> None:
        self.scale = jnp.ones(dim)
        self.bias = jnp.zeros(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)
        h = h.astype(x.dtype)

        return h * self.scale.astype(x.dtype) + self.bias.astype(x.dtype)


class DCResBlock(Module):
    r"""conv3x3 - SiLU - conv3x3(no bias) - RMSNorm, with identity residual."""

    def __init__(self, in_channels: int, out_channels: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.conv1 = _conv(in_channels, in_channels, key=k1)
        self.conv2 = _conv(in_channels, out_channels, bias=False, key=k2)
        self.norm = RMSNorm2d(out_channels)

    def __call__(self, x: Array) -> Array:
        h = self.conv1(x)
        h = jax.nn.silu(h)
        h = self.conv2(h)
        h = self.norm(h)

        return x + h


class DCGLUMBConv(Module):
    r"""Gated MobileNet conv FFN with trailing RMSNorm and residual: 1x1
    expansion (4x), 3x3 depthwise, SiLU-gated GLU, 1x1 projection (no bias),
    RMSNorm. The autoencoder variant of the Sana DiT's GLUMBConv."""

    def __init__(self, dim: int, expand_ratio: float = 4.0, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        hidden = int(dim * expand_ratio)

        self.conv_inverted = Conv(dim, 2 * hidden, kernel_size=(1, 1), key=k1)
        # depthwise: kernel (3, 3, 1, 2*hidden), applied with feature_group_count
        self.conv_depth = Conv(
            1, 2 * hidden, kernel_size=(3, 3), padding=((1, 1), (1, 1)), key=k2
        )
        self.conv_point = Conv(hidden, dim, kernel_size=(1, 1), bias=False, key=k3)
        self.norm = RMSNorm2d(dim)

    def __call__(self, x: Array) -> Array:
        h = jax.nn.silu(self.conv_inverted(x))

        C = h.shape[-1]
        h = jax.lax.conv_general_dilated(
            h,
            self.conv_depth.weight.astype(h.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        h = h + self.conv_depth.bias.astype(h.dtype)

        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.silu(gate)

        h = self.conv_point(h)
        h = self.norm(h)

        return x + h


class SanaMultiscaleAttentionProjection(Module):
    r"""One aggregation scale of the multiscale attention: a k x k depthwise
    conv over the fused QKV channels followed by a grouped (per d-block) 1x1
    conv; both bias-free."""

    def __init__(self, inner_dim: int, num_heads: int, kernel_size: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)
        channels = 3 * inner_dim
        pad = kernel_size // 2

        self.groups = 3 * num_heads
        self.pad = pad
        # depthwise k x k: kernel (k, k, 1, 3*inner)
        self.proj_in = Conv(
            1,
            channels,
            kernel_size=(kernel_size, kernel_size),
            padding=((pad, pad), (pad, pad)),
            bias=False,
            key=k1,
        )
        # grouped 1x1 (groups = 3*heads): kernel (1, 1, d, 3*inner)
        self.proj_out = Conv(
            channels // self.groups, channels, kernel_size=(1, 1), bias=False, key=k2
        )

    def __call__(self, qkv: Array) -> Array:
        C = qkv.shape[-1]

        h = jax.lax.conv_general_dilated(
            qkv,
            self.proj_in.weight.astype(qkv.dtype),
            window_strides=(1, 1),
            padding=[(self.pad, self.pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        h = jax.lax.conv_general_dilated(
            h,
            self.proj_out.weight.astype(qkv.dtype),
            window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )

        return h


class SanaMultiscaleLinearAttention(Module):
    r"""Multiscale ReLU linear attention (diffusers
    `SanaMultiscaleLinearAttention`, efficientvit `LiteMLA`).

    Q, K, V are computed as one fused channel block ``[q | k | v]``; each
    aggregation scale appends a depthwise + grouped-1x1 filtered copy. The
    concatenated tensor is regrouped into blocks of :math:`3 d` channels and
    each block is split into thirds — the channel semantics of efficientvit's
    fused projection, which diffusers' ``to_q``/``to_k``/``to_v`` row-slices
    reproduce. Linear attention when :math:`HW > d`, quadratic otherwise.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        head_dim: int = 32,
        mult: float = 1.0,
        kernel_sizes: Sequence[int] = (5,),
        eps: float = 1e-15,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4, *ks = jax.random.split(key, 4 + len(kernel_sizes))

        heads = int(in_channels // head_dim * mult)
        inner = heads * head_dim

        self.head_dim = head_dim
        self.eps = eps

        self.to_q = Linear(in_channels, inner, bias=False, key=k1)
        self.to_k = Linear(in_channels, inner, bias=False, key=k2)
        self.to_v = Linear(in_channels, inner, bias=False, key=k3)

        self.to_qkv_multiscale = [
            SanaMultiscaleAttentionProjection(inner, heads, k, key=kk)
            for k, kk in zip(kernel_sizes, ks)
        ]

        self.to_out = Linear(inner * (1 + len(kernel_sizes)), out_channels, bias=False, key=k4)
        self.norm_out = RMSNorm2d(out_channels)

    def __call__(self, x: Array) -> Array:
        B, H, W, _ = x.shape
        d = self.head_dim
        L = H * W

        qkv = jnp.concatenate([self.to_q(x), self.to_k(x), self.to_v(x)], axis=-1)

        multiscale = [qkv]
        for block in self.to_qkv_multiscale:
            multiscale.append(block(qkv))
        qkv = jnp.concatenate(multiscale, axis=-1)

        # regroup: channels -> (groups, 3d), split each group into thirds
        n = qkv.shape[-1] // (3 * d)
        qkv = qkv.reshape(B, L, n, 3 * d)
        q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]

        q = jax.nn.relu(q)
        k = jax.nn.relu(k)

        if L > d:  # linear attention: O(L d^2)
            v1 = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
            scores = jnp.einsum(
                "blnd,blne->bnde", k, v1, preferred_element_type=jnp.float32
            )
            out = jnp.einsum(
                "blnd,bnde->blne", q, scores, preferred_element_type=jnp.float32
            )
            out = out[..., :-1] / (out[..., -1:] + self.eps)
        else:  # quadratic attention: O(L^2 d)
            att = jnp.einsum(
                "bmnd,blnd->bnml", k, q, preferred_element_type=jnp.float32
            )
            att = att / (jnp.sum(att, axis=2, keepdims=True) + self.eps)
            out = jnp.einsum(
                "bmnd,bnml->blnd", v.astype(jnp.float32), att
            )

        out = out.reshape(B, H, W, -1).astype(x.dtype)
        out = self.to_out(out)
        out = self.norm_out(out)

        return x + out


class EfficientViTBlock(Module):
    r"""Multiscale linear attention + GLUMBConv, each with its own residual."""

    def __init__(
        self,
        in_channels: int,
        head_dim: int = 32,
        qkv_multiscales: Sequence[int] = (5,),
        *,
        key: Array,
    ) -> None:
        k1, k2 = jax.random.split(key)

        self.attn = SanaMultiscaleLinearAttention(
            in_channels, in_channels, head_dim=head_dim, kernel_sizes=qkv_multiscales, key=k1
        )
        self.conv_out = DCGLUMBConv(in_channels, key=k2)

    def __call__(self, x: Array) -> Array:
        return self.conv_out(self.attn(x))


class DCDownBlock2d(Module):
    r"""2x downsample: stride-2 conv plus a pixel-unshuffle channel-averaging
    shortcut (the Sana `downsample_block_type='conv'` variant)."""

    def __init__(self, in_channels: int, out_channels: int, *, key: Array) -> None:
        self.conv = _conv(in_channels, out_channels, stride=2, key=key)
        self.group_size = in_channels * 4 // out_channels
        self.out_channels = out_channels

    def __call__(self, x: Array) -> Array:
        h = self.conv(x)

        y = _pixel_unshuffle(x, 2)
        y = y.reshape(*y.shape[:-1], self.out_channels, self.group_size).mean(-1)

        return h + y


class DCUpBlock2d(Module):
    r"""2x upsample with a channel-duplicating pixel-shuffle shortcut. The Sana
    variant (`interpolate=True`) is nearest-neighbor interpolation followed by
    a conv; the pixel-shuffle variant is a conv to :math:`4 C_o` channels,
    pixel-shuffled. In both modes the shortcut (efficientvit's
    ``upsample_shortcut='duplicating'`` residual wrapper) adds
    ``pixel_shuffle(repeat_interleave(x))``."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        interpolate: bool = True,
        shortcut: bool = True,
        *,
        key: Array,
    ) -> None:
        self.interpolate = interpolate
        self.shortcut = shortcut
        self.repeats = out_channels * 4 // in_channels

        if interpolate:
            self.conv = _conv(in_channels, out_channels, key=key)
        else:
            self.conv = _conv(in_channels, out_channels * 4, key=key)

    def __call__(self, x: Array) -> Array:
        if self.interpolate:
            h = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            h = self.conv(h)
        else:
            h = _pixel_shuffle(self.conv(x), 2)

        if self.shortcut:
            y = jnp.repeat(x, self.repeats, axis=-1)
            h = h + _pixel_shuffle(y, 2)

        return h


def _make_block(
    block_type: str,
    channels: int,
    head_dim: int,
    qkv_multiscales: Sequence[int],
    *,
    key: Array,
) -> Module:
    if block_type == "ResBlock":
        return DCResBlock(channels, channels, key=key)
    elif block_type == "EfficientViTBlock":
        return EfficientViTBlock(
            channels, head_dim=head_dim, qkv_multiscales=qkv_multiscales, key=key
        )
    else:
        raise ValueError(f"unknown block type '{block_type}'")


class DCEncoder(Module):
    r"""conv-in, staged blocks with 2x downsamples, group-averaged residual
    projection to the latent channels."""

    def __init__(
        self,
        in_channels: int,
        latent_channels: int,
        block_types: Sequence[str],
        block_out_channels: Sequence[int],
        layers_per_block: Sequence[int],
        qkv_multiscales: Sequence[Sequence[int]],
        head_dim: int = 32,
        *,
        key: Array,
    ) -> None:
        assert layers_per_block[0] > 0, "depth-0 first stages are not supported"

        n = len(block_out_channels)

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.conv_in = _conv(in_channels, block_out_channels[0], key=next_key())

        self.down_blocks = []
        for i, (ch, depth) in enumerate(zip(block_out_channels, layers_per_block)):
            stage = [
                _make_block(block_types[i], ch, head_dim, qkv_multiscales[i], key=next_key())
                for _ in range(depth)
            ]
            if i < n - 1 and depth > 0:
                stage.append(
                    DCDownBlock2d(ch, block_out_channels[i + 1], key=next_key())
                )
            self.down_blocks.append(stage)

        self.conv_out = _conv(block_out_channels[-1], latent_channels, key=next_key())
        self.group_size = block_out_channels[-1] // latent_channels
        self.latent_channels = latent_channels

    def __call__(self, x: Array) -> Array:
        h = self.conv_in(x)

        for stage in self.down_blocks:
            for block in stage:
                h = block(h)

        y = h.reshape(*h.shape[:-1], self.latent_channels, self.group_size).mean(-1)

        return self.conv_out(h) + y


class DCDecoder(Module):
    r"""conv-in with channel-duplicating residual, staged blocks with 2x
    upsamples (run deep-to-shallow), RMSNorm-ReLU-conv head."""

    def __init__(
        self,
        in_channels: int,
        latent_channels: int,
        block_types: Sequence[str],
        block_out_channels: Sequence[int],
        layers_per_block: Sequence[int],
        qkv_multiscales: Sequence[Sequence[int]],
        head_dim: int = 32,
        upsample_interpolate: bool = True,
        *,
        key: Array,
    ) -> None:
        assert layers_per_block[0] > 0, "depth-0 first stages are not supported"

        n = len(block_out_channels)

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.conv_in = _conv(latent_channels, block_out_channels[-1], key=next_key())
        self.repeats = block_out_channels[-1] // latent_channels

        # up_blocks[i] = [upsample (from stage i+1), blocks...]; run reversed
        self.up_blocks = []
        for i, (ch, depth) in enumerate(zip(block_out_channels, layers_per_block)):
            stage = []
            if i < n - 1 and depth > 0:
                stage.append(
                    DCUpBlock2d(
                        block_out_channels[i + 1],
                        ch,
                        interpolate=upsample_interpolate,
                        key=next_key(),
                    )
                )
            stage.extend(
                _make_block(block_types[i], ch, head_dim, qkv_multiscales[i], key=next_key())
                for _ in range(depth)
            )
            self.up_blocks.append(stage)

        self.norm_out = RMSNorm2d(block_out_channels[0])
        self.conv_out = _conv(block_out_channels[0], in_channels, key=next_key())

    def __call__(self, z: Array) -> Array:
        h = self.conv_in(z) + jnp.repeat(z, self.repeats, axis=-1)

        for stage in reversed(self.up_blocks):
            for block in stage:
                h = block(h)

        h = self.norm_out(h)
        h = jax.nn.relu(h)

        return self.conv_out(h)


class AutoencoderDC(Module):
    r"""The deep-compression autoencoder (diffusers ``AutoencoderDC``
    semantics; defaults are the ``dc-ae-f32c32-sana-1.x`` configuration of the
    Sana checkpoints: 32x spatial downsampling into 32 latent channels).

    The encoder is deterministic: :meth:`encode` returns the latent directly
    (no posterior). Latent scaling lives in the plugin wrapper
    (:class:`azula_tpu.models.sana.AutoEncoder`), as in the reference.

    Arguments:
        in_channels: Image channels.
        latent_channels: Latent channels.
        block_types: Per-stage block type (`'ResBlock'`/`'EfficientViTBlock'`).
        block_out_channels: Per-stage widths.
        encoder_layers_per_block / decoder_layers_per_block: Per-stage depths.
        qkv_multiscales: Per-stage attention aggregation kernel sizes.
        head_dim: Attention head dimension.
        upsample_interpolate: Decoder upsample variant (Sana uses interpolate).
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        in_channels: int = 3,
        latent_channels: int = 32,
        block_types: Sequence[str] = (
            "ResBlock",
            "ResBlock",
            "ResBlock",
            "EfficientViTBlock",
            "EfficientViTBlock",
            "EfficientViTBlock",
        ),
        block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024, 1024),
        encoder_layers_per_block: Sequence[int] = (2, 2, 2, 3, 3, 3),
        decoder_layers_per_block: Sequence[int] = (3, 3, 3, 3, 3, 3),
        qkv_multiscales: Sequence[Sequence[int]] = ((), (), (), (5,), (5,), (5,)),
        head_dim: int = 32,
        upsample_interpolate: bool = True,
        *,
        key: Array,
    ) -> None:
        k1, k2 = jax.random.split(key)

        self.encoder = DCEncoder(
            in_channels,
            latent_channels,
            block_types,
            block_out_channels,
            encoder_layers_per_block,
            qkv_multiscales,
            head_dim,
            key=k1,
        )
        self.decoder = DCDecoder(
            in_channels,
            latent_channels,
            block_types,
            block_out_channels,
            decoder_layers_per_block,
            qkv_multiscales,
            head_dim,
            upsample_interpolate,
            key=k2,
        )

    def encode(self, x: Array) -> Array:
        r"""Encodes images to latents, :math:`(B, H, W, 3) \to (B, H/32, W/32, 32)`."""

        return self.encoder(x)

    def decode(self, z: Array) -> Array:
        r"""Decodes latents to images, :math:`(B, h, w, 32) \to (B, 32h, 32w, 3)`."""

        return self.decoder(z)


def convert_dcae_state_dict(module: AutoencoderDC, torch_sd) -> dict:
    r"""Converts a diffusers `AutoencoderDC` state dict (the `vae/` safetensors
    of Sana checkpoints) to :class:`AutoencoderDC` arrays. Strict: unconsumed
    checkpoint keys fail loudly."""

    converter = Converter(torch_sd, norm_types=(RMSNorm2d,))
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

r"""ADM (guided-diffusion) UNet backbone, TPU-native.

A channels-last JAX reimplementation of the architecture consumed by the
OpenAI guided-diffusion checkpoints (reference vendored copy at
`azula/plugins/adm/_src/unet.py:387-634`): ResBlocks with scale-shift GroupNorm
conditioning, spatial attention at selected downsampling rates (both QKV head
orders), residual up/down-sampling blocks, and class embeddings.

Structure and naming are kept isomorphic to the checkpoint layout so the
PyTorch-to-JAX weight converter (:mod:`azula_tpu.models.adm.convert`) is a
mechanical walk.
"""

from __future__ import annotations

__all__ = [
    "ADMUNet",
    "timestep_embedding",
]

import jax
import jax.numpy as jnp
import math
import numpy as np

from collections.abc import Sequence
from jax import Array

from ...nn.layers import Conv, Dropout, GroupNorm, Linear
from ...nn.module import Module
from ...ops.attention import dot_product_attention
from ...ops.norm import group_norm_silu


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    r"""Sinusoidal timestep embedding, cosine components first (matching
    guided-diffusion, reference `adm/_src/nn.py:90-108`).

    Arguments:
        t: Timestep indices (may be fractional), with shape :math:`(B,)`.
        dim: The embedding dimension.

    Returns:
        Embeddings with shape :math:`(B, \text{dim})`, float32.
    """

    half = dim // 2

    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[..., None].astype(jnp.float32) * freqs

    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)

    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)

    return emb


def _conv3(in_ch: int, out_ch: int, *, stride: int = 1, key: Array) -> Conv:
    return Conv(
        in_ch,
        out_ch,
        kernel_size=(3, 3),
        stride=(stride, stride),
        padding=((1, 1), (1, 1)),
        key=key,
    )


def _zero(conv_or_linear):
    conv_or_linear.weight = jnp.zeros_like(conv_or_linear.weight)
    if conv_or_linear.bias is not None:
        conv_or_linear.bias = jnp.zeros_like(conv_or_linear.bias)
    return conv_or_linear


def _norm(channels: int) -> GroupNorm:
    # guided-diffusion GroupNorm32: 32 groups, affine, float32 statistics
    return GroupNorm(32, channels, eps=1e-5, affine=True)


def _upsample2(x: Array) -> Array:
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def _avgpool2(x: Array) -> Array:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


class ADMUpsample(Module):
    r"""Nearest x2 upsampling with optional 3x3 convolution
    (reference `adm/_src/unet.py:82-109`)."""

    def __init__(
        self, channels: int, use_conv: bool, out_channels: int | None = None, *, key: Array
    ) -> None:
        out_channels = out_channels or channels
        self.conv = _conv3(channels, out_channels, key=key) if use_conv else None

    def __call__(self, x: Array, emb: Array | None = None, key=None) -> Array:
        x = _upsample2(x)
        if self.conv is not None:
            x = self.conv(x)
        return x


class ADMDownsample(Module):
    r"""Stride-2 convolution or average pooling
    (reference `adm/_src/unet.py:112-138`)."""

    def __init__(
        self, channels: int, use_conv: bool, out_channels: int | None = None, *, key: Array
    ) -> None:
        out_channels = out_channels or channels
        self.op = _conv3(channels, out_channels, stride=2, key=key) if use_conv else None

    def __call__(self, x: Array, emb: Array | None = None, key=None) -> Array:
        if self.op is not None:
            return self.op(x)
        return _avgpool2(x)


class ADMResBlock(Module):
    r"""Residual block with timestep-embedding conditioning
    (reference `adm/_src/unet.py:141-247`).

    With `use_scale_shift_norm`, the embedding modulates the second GroupNorm
    FiLM-style: :math:`h \gets \mathrm{norm}(h) (1 + s) + b`.
    """

    def __init__(
        self,
        channels: int,
        emb_channels: int,
        dropout: float = 0.0,
        out_channels: int | None = None,
        use_conv: bool = False,
        use_scale_shift_norm: bool = False,
        up: bool = False,
        down: bool = False,
        *,
        key: Array,
    ) -> None:
        out_channels = out_channels or channels

        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.use_scale_shift_norm = use_scale_shift_norm
        self.updown = "up" if up else "down" if down else None

        self.in_norm = _norm(channels)
        self.in_conv = _conv3(channels, out_channels, key=k1)

        self.emb_lin = Linear(
            emb_channels,
            2 * out_channels if use_scale_shift_norm else out_channels,
            key=k2,
        )

        self.out_norm = _norm(out_channels)
        self.drop = Dropout(dropout)
        self.out_conv = _zero(_conv3(out_channels, out_channels, key=k3))

        if out_channels == channels:
            self.skip = None
        elif use_conv:
            self.skip = _conv3(channels, out_channels, key=k4)
        else:
            self.skip = Conv(
                channels, out_channels, kernel_size=(1, 1), key=k4
            )

    def _split_in(self, parts: tuple[Array, ...]) -> Array:
        r"""Applies `in_norm -> SiLU -> in_conv` to a *virtual concatenation*
        without materializing it: the 32 GroupNorm groups never straddle the
        skip boundary here (both halves are multiples of the group size), so
        the norm factorizes per part, and the convolution becomes a
        split-weight accumulation — measured faster than conv-of-concat on
        v5e, and it saves the concat's HBM round trip."""

        sizes = [p.shape[-1] for p in parts]
        group = sum(sizes) // self.in_norm.groups

        w = self.in_conv.weight
        offsets = [0, *list(np.cumsum(sizes))]

        h = None
        for p, lo, hi in zip(parts, offsets[:-1], offsets[1:]):
            g = group_norm_silu(
                p,
                (hi - lo) // group,
                eps=self.in_norm.eps,
                scale=self.in_norm.scale[lo:hi],
                bias=self.in_norm.bias[lo:hi],
            )
            y = jax.lax.conv_general_dilated(
                g,
                w[:, :, lo:hi].astype(g.dtype),
                window_strides=self.in_conv.stride,
                padding=list(self.in_conv.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = y if h is None else h + y

        return h + self.in_conv.bias.astype(h.dtype)

    def _split_skip(self, parts: tuple[Array, ...]) -> Array:
        sizes = [p.shape[-1] for p in parts]
        offsets = [0, *list(np.cumsum(sizes))]
        w = self.skip.weight

        h = None
        for p, lo, hi in zip(parts, offsets[:-1], offsets[1:]):
            y = jax.lax.conv_general_dilated(
                p,
                w[..., lo:hi, :].astype(p.dtype),
                window_strides=self.skip.stride,
                padding=list(self.skip.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = y if h is None else h + y

        return h + self.skip.bias.astype(h.dtype)

    def __call__(
        self, x: Array | tuple[Array, ...], emb: Array, key: Array | None = None
    ) -> Array:
        r"""`x` may be a tuple of channel parts — a virtual concatenation along
        the channel axis (the UNet skip pathway) that is never materialized."""

        group = self.in_norm.scale.shape[0] // self.in_norm.groups if self.in_norm.scale is not None else 0

        if (
            isinstance(x, tuple)
            and self.updown is None
            and self.skip is not None
            and group > 0
            and all(p.shape[-1] % group == 0 for p in x)
        ):
            h = self._split_in(x)
            skip_parts = x
        else:
            if isinstance(x, tuple):
                x = jnp.concatenate(x, axis=-1)
            skip_parts = None

            h = group_norm_silu(
                x,
                self.in_norm.groups,
                eps=self.in_norm.eps,
                scale=self.in_norm.scale,
                bias=self.in_norm.bias,
            )

            if self.updown == "up":
                h, x = _upsample2(h), _upsample2(x)
            elif self.updown == "down":
                h, x = _avgpool2(h), _avgpool2(x)

            h = self.in_conv(h)

        emb_out = self.emb_lin(jax.nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out[:, None, None, :]  # broadcast over spatial (channels-last)

        # GroupNorm + scale-shift modulation + SiLU in one fused op (on TPU at
        # eligible shapes: a single elementwise pass after the statistics).
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, 0, 0, :], 2, axis=-1)
            h = group_norm_silu(
                h,
                self.out_norm.groups,
                eps=self.out_norm.eps,
                scale=self.out_norm.scale,
                bias=self.out_norm.bias,
                mod_scale=scale,
                mod_shift=shift,
            )
        else:
            h = group_norm_silu(
                h + emb_out,
                self.out_norm.groups,
                eps=self.out_norm.eps,
                scale=self.out_norm.scale,
                bias=self.out_norm.bias,
            )

        h = self.drop(h, key)
        h = self.out_conv(h)

        if skip_parts is not None:
            skip = self._split_skip(skip_parts)
        else:
            skip = x if self.skip is None else self.skip(x)

        return skip + h


class ADMAttentionBlock(Module):
    r"""Spatial self-attention over flattened positions
    (reference `adm/_src/unet.py:250-313`), both QKV channel orders:

    - legacy (`use_new_attention_order=False`): channels grouped head-major,
      `H x (q, k, v)` (reference `QKVAttentionLegacy`, `unet.py:351-384`);
    - new: grouped qkv-major, `(q, k, v) x H` (reference `QKVAttention`).

    The attention product runs through the shared flash-attention dispatch.
    """

    def __init__(
        self,
        channels: int,
        num_heads: int = 1,
        num_head_channels: int = -1,
        use_new_attention_order: bool = False,
        *,
        key: Array,
    ) -> None:
        if num_head_channels == -1:
            self.heads = num_heads
        else:
            assert channels % num_head_channels == 0
            self.heads = channels // num_head_channels

        self.new_order = use_new_attention_order

        k1, k2 = jax.random.split(key)

        self.norm = _norm(channels)
        self.qkv = Linear(channels, 3 * channels, key=k1)
        self.proj = _zero(Linear(channels, channels, key=k2))

    def __call__(self, x: Array, emb: Array | None = None, key=None) -> Array:
        B, *spatial, C = x.shape
        H = self.heads
        ch = C // H

        t = x.reshape(B, -1, C)
        T = t.shape[1]

        qkv = self.qkv(self.norm(t))

        if self.new_order:
            qkv = qkv.reshape(B, T, 3, H, ch)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            qkv = qkv.reshape(B, T, H, 3, ch)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]

        # (B, T, H, ch) -> (B, H, T, ch)
        q, k, v = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))

        a = dot_product_attention(q, k, v)

        a = jnp.swapaxes(a, 1, 2).reshape(B, T, C)
        a = self.proj(a)

        return (t + a).reshape(B, *spatial, C)


class ADMUNet(Module):
    r"""The full ADM UNet with attention and timestep embedding, channels-last.

    Mirrors the constructor semantics of the guided-diffusion `UNetModel`
    (reference `adm/_src/unet.py:418-600`); container indices match the
    checkpoint's parameter paths for mechanical weight conversion.

    Arguments:
        in_channels: Input channels.
        model_channels: Base channel count.
        out_channels: Output channels.
        num_res_blocks: Residual blocks per downsampling level.
        attention_resolutions: Downsample *rates* (`ds` values) at which
            attention runs.
        dropout: Dropout rate.
        channel_mult: Channel multiplier per level.
        conv_resample: Learned convs for up/downsampling.
        num_classes: If set, class-conditional with this many classes.
        num_heads / num_head_channels / num_heads_upsample: Attention head config.
        use_scale_shift_norm: FiLM-style conditioning.
        resblock_updown: Residual blocks for up/downsampling.
        use_new_attention_order: QKV channel order (see :class:`ADMAttentionBlock`).
        checkpointing: Rematerialize each input/middle/output stage.
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        image_size: int,
        in_channels: int,
        model_channels: int,
        out_channels: int,
        num_res_blocks: int,
        attention_resolutions: Sequence[int],
        dropout: float = 0.0,
        channel_mult: Sequence[int] = (1, 2, 4, 8),
        conv_resample: bool = True,
        num_classes: int | None = None,
        num_heads: int = 1,
        num_head_channels: int = -1,
        num_heads_upsample: int = -1,
        use_scale_shift_norm: bool = False,
        resblock_updown: bool = False,
        use_new_attention_order: bool = False,
        checkpointing: bool = False,
        *,
        key: Array,
    ) -> None:
        if num_heads_upsample == -1:
            num_heads_upsample = num_heads

        self.model_channels = model_channels
        self.num_classes = num_classes
        self.checkpointing = checkpointing

        attention_resolutions = set(attention_resolutions)

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        time_embed_dim = model_channels * 4
        self.time_embed = [
            Linear(model_channels, time_embed_dim, key=next_key()),
            Linear(time_embed_dim, time_embed_dim, key=next_key()),
        ]

        if num_classes is not None:
            self.label_emb = jax.random.normal(
                next_key(), (num_classes, time_embed_dim)
            )
        else:
            self.label_emb = None

        res_kwargs = dict(  # noqa: C408
            emb_channels=time_embed_dim,
            dropout=dropout,
            use_scale_shift_norm=use_scale_shift_norm,
        )

        def attn(ch, heads):
            return ADMAttentionBlock(
                ch,
                num_heads=heads,
                num_head_channels=num_head_channels,
                use_new_attention_order=use_new_attention_order,
                key=next_key(),
            )

        ch = input_ch = int(channel_mult[0] * model_channels)
        self.input_blocks = [[_conv3(in_channels, ch, key=next_key())]]
        input_block_chans = [ch]
        ds = 1

        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers = [
                    ADMResBlock(
                        ch,
                        out_channels=int(mult * model_channels),
                        key=next_key(),
                        **res_kwargs,
                    )
                ]
                ch = int(mult * model_channels)
                if ds in attention_resolutions:
                    layers.append(attn(ch, num_heads))
                self.input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                out_ch = ch
                self.input_blocks.append([
                    ADMResBlock(ch, out_channels=out_ch, down=True, key=next_key(), **res_kwargs)
                    if resblock_updown
                    else ADMDownsample(ch, conv_resample, out_channels=out_ch, key=next_key())
                ])
                ch = out_ch
                input_block_chans.append(ch)
                ds *= 2

        self.middle_block = [
            ADMResBlock(ch, key=next_key(), **res_kwargs),
            attn(ch, num_heads),
            ADMResBlock(ch, key=next_key(), **res_kwargs),
        ]

        self.output_blocks = []
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                ich = input_block_chans.pop()
                layers = [
                    ADMResBlock(
                        ch + ich,
                        out_channels=int(model_channels * mult),
                        key=next_key(),
                        **res_kwargs,
                    )
                ]
                ch = int(model_channels * mult)
                if ds in attention_resolutions:
                    layers.append(attn(ch, num_heads_upsample))
                if level and i == num_res_blocks:
                    out_ch = ch
                    layers.append(
                        ADMResBlock(ch, out_channels=out_ch, up=True, key=next_key(), **res_kwargs)
                        if resblock_updown
                        else ADMUpsample(ch, conv_resample, out_channels=out_ch, key=next_key())
                    )
                    ds //= 2
                self.output_blocks.append(layers)

        self.out_norm = _norm(ch)
        self.out_conv = _zero(_conv3(input_ch, out_channels, key=next_key()))

    def __call__(
        self,
        x: Array,
        timesteps: Array,
        y: Array | None = None,
        key: Array | None = None,
    ) -> Array:
        r"""
        Arguments:
            x: Input images, channels-last, with shape :math:`(B, H, W, C)`.
            timesteps: Timestep indices (fractional ok), with shape :math:`(B,)`
                or :math:`()`.
            y: Class labels, with shape :math:`(B,)` (class-conditional only).
            key: PRNG key; enables dropout (training).

        Returns:
            The output tensor, with shape :math:`(B, H, W, C_o)`.
        """

        assert (y is not None) == (self.num_classes is not None), (
            "y must be given iff the model is class-conditional"
        )

        timesteps = jnp.broadcast_to(jnp.atleast_1d(timesteps), (x.shape[0],))

        emb = timestep_embedding(timesteps, self.model_channels).astype(x.dtype)
        emb = self.time_embed[1](jax.nn.silu(self.time_embed[0](emb)))

        if self.num_classes is not None:
            emb = emb + self.label_emb[y].astype(emb.dtype)

        def run(layers, h, key):
            def stage(h, emb):
                k = key
                for layer in layers:
                    k, sub = (None, None) if k is None else jax.random.split(k)
                    h = layer(h, emb, key=sub)
                return h

            if self.checkpointing:
                return jax.checkpoint(stage)(h, emb)
            else:
                return stage(h, emb)

        hs = []
        h = x

        for i, layers in enumerate(self.input_blocks):
            sub = None if key is None else jax.random.fold_in(key, i)
            h = run(layers, h, sub) if i > 0 else layers[0](h)
            hs.append(h)

        h = run(self.middle_block, h, None if key is None else jax.random.fold_in(key, -1))

        for i, layers in enumerate(self.output_blocks):
            sub = None if key is None else jax.random.fold_in(key, 1000 + i)
            # virtual concatenation: the first resblock of the group consumes
            # the tuple without materializing the concat (see ADMResBlock)
            h = run(layers, (h, hs.pop()), sub)

        h = h.astype(x.dtype)
        h = jax.nn.silu(self.out_norm(h))

        return self.out_conv(h)

r"""Stable Diffusion UNet backbone, TPU-native.

A channels-last JAX reimplementation of the architecture consumed by the
SD 1.x / 2 checkpoints (diffusers ``UNet2DConditionModel`` semantics — the
backbone the reference loads through `diffusers`,
`azula/plugins/sd/__init__.py:240-252`): ResNet blocks with additive timestep
conditioning, cross-attention transformer stages conditioned on CLIP prompt
embeddings, and skip connections collected per-layer.

Structure and naming are kept isomorphic to the checkpoint layout
(``down_blocks.N.resnets.M...``) so the weight converter
(:mod:`azula_tpu.models.sd.convert`) is a mechanical walk. Differences from
diffusers are layout-only: tensors are :math:`(B, H, W, C)` and attention runs
through the shared flash-attention dispatch.
"""

from __future__ import annotations

__all__ = [
    "SDUNet",
    "sinusoidal_timestep_embedding",
]

import jax
import jax.numpy as jnp
import math

from collections.abc import Sequence
from jax import Array

from ...nn.layers import Conv, GroupNorm, Linear
from ...nn.module import Module
from ...ops.attention import dot_product_attention


def sinusoidal_timestep_embedding(
    t: Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
) -> Array:
    r"""Sinusoidal timestep embedding with diffusers' conventions
    (`get_timestep_embedding`): exponents :math:`-\log(P) i / (d/2 - s)`, sine
    components first unless flipped (SD uses ``flip_sin_to_cos=True``).

    Arguments:
        t: Timestep values (may be fractional), with shape :math:`(B,)`.
        dim: The embedding dimension.

    Returns:
        Embeddings with shape :math:`(B, \text{dim})`, float32.
    """

    half = dim // 2

    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = t[..., None].astype(jnp.float32) * freqs

    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)

    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)

    return emb


class AffineLayerNorm(Module):
    r"""Layer normalization with learned scale/bias over the last dimension
    (equivalent of `torch.nn.LayerNorm`), float32 statistics."""

    def __init__(self, dim: int, eps: float = 1e-5) -> None:
        self.scale = jnp.ones(dim)
        self.bias = jnp.zeros(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        m = jnp.mean(h, axis=-1, keepdims=True)
        v = jnp.var(h, axis=-1, keepdims=True)
        h = (h - m) * jax.lax.rsqrt(v + self.eps)

        h = h * self.scale.astype(jnp.float32) + self.bias.astype(jnp.float32)

        return h.astype(x.dtype)


def _conv(in_ch: int, out_ch: int, k: int = 3, stride: int = 1, *, key: Array) -> Conv:
    pad = (k - 1) // 2
    return Conv(
        in_ch,
        out_ch,
        kernel_size=(k, k),
        stride=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        key=key,
    )


class ResnetBlock2D(Module):
    r"""Diffusers-style residual block: GN-SiLU-conv + additive time embedding,
    GN-SiLU-conv, 1x1 shortcut on channel change."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int | None = None,
        eps: float = 1e-5,
        groups: int = 32,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.norm1 = GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = _conv(in_channels, out_channels, key=k1)

        if temb_channels is not None:
            self.time_emb_proj = Linear(temb_channels, out_channels, key=k2)
        else:
            self.time_emb_proj = None

        self.norm2 = GroupNorm(groups, out_channels, eps=eps, affine=True)
        self.conv2 = _conv(out_channels, out_channels, key=k3)

        if in_channels != out_channels:
            self.conv_shortcut = Conv(in_channels, out_channels, kernel_size=(1, 1), key=k4)
        else:
            self.conv_shortcut = None

    def __call__(self, x: Array, temb: Array | None = None) -> Array:
        h = jax.nn.silu(self.norm1(x))
        h = self.conv1(h)

        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(jax.nn.silu(temb)).astype(h.dtype)
            h = h + t[:, None, None, :]

        h = jax.nn.silu(self.norm2(h))
        h = self.conv2(h)

        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)

        return skip + h


class CrossAttention(Module):
    r"""Multi-head attention with optional cross-attention context
    (diffusers `Attention`): unbiased q/k/v projections, biased output."""

    def __init__(
        self,
        query_dim: int,
        context_dim: int | None = None,
        heads: int = 8,
        dim_head: int | None = None,
        *,
        key: Array,
    ) -> None:
        context_dim = context_dim or query_dim
        inner = heads * (dim_head if dim_head is not None else query_dim // heads)

        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.heads = heads
        self.to_q = Linear(query_dim, inner, bias=False, key=k1)
        self.to_k = Linear(context_dim, inner, bias=False, key=k2)
        self.to_v = Linear(context_dim, inner, bias=False, key=k3)
        self.to_out = Linear(inner, query_dim, key=k4)

    def __call__(self, x: Array, context: Array | None = None) -> Array:
        context = x if context is None else context

        B, L, _ = x.shape
        S = context.shape[-2]

        q = self.to_q(x).reshape(B, L, self.heads, -1)
        k = self.to_k(context).reshape(B, S, self.heads, -1)
        v = self.to_v(context).reshape(B, S, self.heads, -1)

        q, k, v = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))

        a = dot_product_attention(q, k, v)

        a = jnp.swapaxes(a, 1, 2).reshape(B, L, -1)

        return self.to_out(a)


class GEGLUFeedForward(Module):
    r"""GEGLU feed-forward (diffusers `FeedForward` with `geglu` activation):
    :math:`h, g = W x`; :math:`y = W_o (h \cdot \mathrm{gelu}(g))`."""

    def __init__(self, dim: int, mult: int = 4, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)
        inner = dim * mult

        self.proj = Linear(dim, 2 * inner, key=k1)
        self.out = Linear(inner, dim, key=k2)

    def __call__(self, x: Array) -> Array:
        h, gate = jnp.split(self.proj(x), 2, axis=-1)

        return self.out(h * jax.nn.gelu(gate, approximate=False))


class BasicTransformerBlock(Module):
    r"""LayerNorm / self-attention / LayerNorm / cross-attention / LayerNorm /
    GEGLU feed-forward, all with residuals."""

    def __init__(
        self,
        dim: int,
        context_dim: int,
        heads: int,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.norm1 = AffineLayerNorm(dim)
        self.attn1 = CrossAttention(dim, heads=heads, key=k1)
        self.norm2 = AffineLayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim=context_dim, heads=heads, key=k2)
        self.norm3 = AffineLayerNorm(dim)
        self.ff = GEGLUFeedForward(dim, key=k3)

    def __call__(self, x: Array, context: Array) -> Array:
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))

        return x


class Transformer2DModel(Module):
    r"""Spatial transformer: GroupNorm, (conv or linear) in-projection, flatten
    to tokens, transformer blocks, out-projection, residual.

    SD 1.x uses 1x1-conv projections; SD 2 uses linear ones
    (`use_linear_projection`).
    """

    def __init__(
        self,
        channels: int,
        context_dim: int,
        heads: int,
        depth: int = 1,
        use_linear_projection: bool = False,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, depth + 2)

        self.linear = use_linear_projection
        self.norm = GroupNorm(32, channels, eps=1e-6, affine=True)

        if use_linear_projection:
            self.proj_in = Linear(channels, channels, key=keys[0])
            self.proj_out = Linear(channels, channels, key=keys[1])
        else:
            self.proj_in = Conv(channels, channels, kernel_size=(1, 1), key=keys[0])
            self.proj_out = Conv(channels, channels, kernel_size=(1, 1), key=keys[1])

        self.transformer_blocks = [
            BasicTransformerBlock(channels, context_dim, heads, key=k)
            for k in keys[2:]
        ]

    def __call__(self, x: Array, context: Array) -> Array:
        B, H, W, C = x.shape
        residual = x

        h = self.norm(x)

        if self.linear:
            h = h.reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.reshape(B, H * W, C)

        for block in self.transformer_blocks:
            h = block(h, context)

        if self.linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = self.proj_out(h)

        return h + residual


class Downsample2D(Module):
    r"""3x3 stride-2 convolution (named ``downsamplers.0.conv`` in checkpoints)."""

    def __init__(self, channels: int, out_channels: int | None = None, *, key: Array) -> None:
        self.conv = _conv(channels, out_channels or channels, stride=2, key=key)

    def __call__(self, x: Array) -> Array:
        return self.conv(x)


class Upsample2D(Module):
    r"""Nearest x2 upsampling followed by a 3x3 convolution."""

    def __init__(self, channels: int, out_channels: int | None = None, *, key: Array) -> None:
        self.conv = _conv(channels, out_channels or channels, key=key)

    def __call__(self, x: Array) -> Array:
        x = jnp.repeat(x, 2, axis=-3)
        x = jnp.repeat(x, 2, axis=-2)

        return self.conv(x)


class DownBlock2D(Module):
    r"""`layers_per_block` resnets (+ optional cross-attention transformers)
    followed by an optional downsampler; every intermediate state is collected
    as a skip."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int,
        context_dim: int | None = None,
        heads: int = 8,
        add_downsample: bool = True,
        use_linear_projection: bool = False,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, 2 * num_layers + 1)

        self.resnets = [
            ResnetBlock2D(
                in_channels if i == 0 else out_channels,
                out_channels,
                temb_channels,
                key=keys[i],
            )
            for i in range(num_layers)
        ]

        if context_dim is not None:
            self.attentions = [
                Transformer2DModel(
                    out_channels,
                    context_dim,
                    heads,
                    use_linear_projection=use_linear_projection,
                    key=keys[num_layers + i],
                )
                for i in range(num_layers)
            ]
        else:
            self.attentions = None

        if add_downsample:
            self.downsamplers = [Downsample2D(out_channels, key=keys[-1])]
        else:
            self.downsamplers = None

    def __call__(self, x: Array, temb: Array, context: Array) -> tuple[Array, list]:
        states = []

        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
            states.append(x)

        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states.append(x)

        return x, states


class UpBlock2D(Module):
    r"""`layers_per_block + 1` resnets, each consuming one skip state, followed
    by an optional upsampler."""

    def __init__(
        self,
        in_channels: int,
        prev_output_channel: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int,
        context_dim: int | None = None,
        heads: int = 8,
        add_upsample: bool = True,
        use_linear_projection: bool = False,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, 2 * num_layers + 1)

        self.resnets = []
        for i in range(num_layers):
            res_skip = in_channels if i == num_layers - 1 else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            self.resnets.append(
                ResnetBlock2D(res_in + res_skip, out_channels, temb_channels, key=keys[i])
            )

        if context_dim is not None:
            self.attentions = [
                Transformer2DModel(
                    out_channels,
                    context_dim,
                    heads,
                    use_linear_projection=use_linear_projection,
                    key=keys[num_layers + i],
                )
                for i in range(num_layers)
            ]
        else:
            self.attentions = None

        if add_upsample:
            self.upsamplers = [Upsample2D(out_channels, key=keys[-1])]
        else:
            self.upsamplers = None

    def __call__(
        self, x: Array, skips: list, temb: Array, context: Array
    ) -> Array:
        for i, resnet in enumerate(self.resnets):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)

        if self.upsamplers is not None:
            x = self.upsamplers[0](x)

        return x


class MidBlock2DCrossAttn(Module):
    r"""Resnet, cross-attention transformer, resnet."""

    def __init__(
        self,
        channels: int,
        temb_channels: int,
        context_dim: int,
        heads: int,
        use_linear_projection: bool = False,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.resnets = [
            ResnetBlock2D(channels, channels, temb_channels, key=k1),
            ResnetBlock2D(channels, channels, temb_channels, key=k3),
        ]
        self.attentions = [
            Transformer2DModel(
                channels,
                context_dim,
                heads,
                use_linear_projection=use_linear_projection,
                key=k2,
            )
        ]

    def __call__(self, x: Array, temb: Array, context: Array) -> Array:
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        x = self.resnets[1](x, temb)

        return x


class SDUNet(Module):
    r"""The SD UNet (diffusers ``UNet2DConditionModel`` semantics), channels-last.

    Defaults correspond to SD 1.x; SD 2 differs by ``cross_attention_dim=1024``,
    ``attention_head_dim=(5, 10, 20, 20)`` and ``use_linear_projection=True``.

    Arguments:
        in_channels: Input (latent) channels.
        out_channels: Output channels.
        block_out_channels: Channel count per resolution level.
        layers_per_block: ResNet blocks per down level.
        cross_attention_dim: The prompt-embedding dimension.
        attention_head_dim: Heads per level (int or per-level sequence; for SD
            checkpoints this config field holds the *head count*, matching the
            diffusers naming quirk).
        cross_attention_levels: Levels with cross-attention transformers
            (``down_block_types``: `True` = `CrossAttnDownBlock2D`).
        use_linear_projection: Linear (SD 2) vs 1x1-conv (SD 1) transformer
            projections.
        freq_shift: Timestep-embedding frequency shift.
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        in_channels: int = 4,
        out_channels: int = 4,
        block_out_channels: Sequence[int] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        cross_attention_dim: int = 768,
        attention_head_dim: int | Sequence[int] = 8,
        cross_attention_levels: Sequence[bool] = (True, True, True, False),
        use_linear_projection: bool = False,
        freq_shift: float = 0.0,
        *,
        key: Array,
    ) -> None:
        n_levels = len(block_out_channels)

        if isinstance(attention_head_dim, int):
            attention_head_dim = (attention_head_dim,) * n_levels
        attention_head_dim = tuple(attention_head_dim)

        self.freq_shift = freq_shift
        self.model_channels = block_out_channels[0]

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        temb_dim = 4 * block_out_channels[0]

        self.time_embedding = [
            Linear(block_out_channels[0], temb_dim, key=next_key()),
            Linear(temb_dim, temb_dim, key=next_key()),
        ]

        self.conv_in = _conv(in_channels, block_out_channels[0], key=next_key())

        self.down_blocks = []
        ch = block_out_channels[0]
        for i, out_ch in enumerate(block_out_channels):
            self.down_blocks.append(
                DownBlock2D(
                    ch,
                    out_ch,
                    temb_dim,
                    num_layers=layers_per_block,
                    context_dim=cross_attention_dim if cross_attention_levels[i] else None,
                    heads=attention_head_dim[i],
                    add_downsample=i < n_levels - 1,
                    use_linear_projection=use_linear_projection,
                    key=next_key(),
                )
            )
            ch = out_ch

        self.mid_block = MidBlock2DCrossAttn(
            block_out_channels[-1],
            temb_dim,
            cross_attention_dim,
            heads=attention_head_dim[-1],
            use_linear_projection=use_linear_projection,
            key=next_key(),
        )

        self.up_blocks = []
        reversed_out = tuple(reversed(block_out_channels))
        reversed_attn = tuple(reversed(cross_attention_levels))
        reversed_heads = tuple(reversed(attention_head_dim))
        out_ch = reversed_out[0]
        for i in range(n_levels):
            prev_out = out_ch
            out_ch = reversed_out[i]
            in_ch = reversed_out[min(i + 1, n_levels - 1)]
            self.up_blocks.append(
                UpBlock2D(
                    in_ch,
                    prev_out,
                    out_ch,
                    temb_dim,
                    num_layers=layers_per_block + 1,
                    context_dim=cross_attention_dim if reversed_attn[i] else None,
                    heads=reversed_heads[i],
                    add_upsample=i < n_levels - 1,
                    use_linear_projection=use_linear_projection,
                    key=next_key(),
                )
            )

        self.conv_norm_out = GroupNorm(32, block_out_channels[0], eps=1e-5, affine=True)
        self.conv_out = _conv(block_out_channels[0], out_channels, key=next_key())

    def __call__(
        self,
        sample: Array,
        timestep: Array,
        encoder_hidden_states: Array,
        **kwargs,
    ) -> Array:
        r"""
        Arguments:
            sample: Noisy latents, channels-last, with shape :math:`(B, H, W, C)`.
            timestep: Timestep indices, with shape :math:`(B,)` or :math:`()`.
            encoder_hidden_states: Prompt embeddings, with shape :math:`(B, L, D)`.

        Returns:
            The predicted noise/velocity, with shape :math:`(B, H, W, C_o)`.
        """

        timestep = jnp.broadcast_to(jnp.atleast_1d(timestep), (sample.shape[0],))

        temb = sinusoidal_timestep_embedding(
            timestep, self.model_channels, freq_shift=self.freq_shift
        ).astype(sample.dtype)
        temb = self.time_embedding[1](jax.nn.silu(self.time_embedding[0](temb)))

        context = encoder_hidden_states

        h = self.conv_in(sample)

        skips = [h]
        for block in self.down_blocks:
            h, states = block(h, temb, context)
            skips.extend(states)

        h = self.mid_block(h, temb, context)

        for block in self.up_blocks:
            h = block(h, skips, temb, context)

        h = jax.nn.silu(self.conv_norm_out(h))

        return self.conv_out(h)

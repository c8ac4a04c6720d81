r"""Sana linear-attention DiT, TPU-native.

A channels-last JAX reimplementation of the architecture consumed by the Sana
checkpoints (diffusers ``SanaTransformer2DModel`` semantics — the backbone the
reference loads through diffusers, `azula/plugins/sana/__init__.py:237-277`):
ReLU linear self-attention (O(L) in sequence length), softmax cross-attention
over Gemma prompt embeddings, MobileNet-style gated conv feed-forward
(GLUMBConv), and PixArt-style single AdaLN with per-block learned
scale-shift tables.

Structure and naming are kept isomorphic to the checkpoint layout so the
weight converter (:mod:`azula_tpu.models.sana.convert`) is a mechanical walk.
"""

from __future__ import annotations

__all__ = [
    "SanaTransformer",
]

import jax
import jax.numpy as jnp

from jax import Array

from ...nn.layers import Conv, Linear
from ...nn.module import Module
from ...ops.attention import dot_product_attention
from ..flux.backbone import LayerNorm, MLPEmbedder
from ..sd.backbone import sinusoidal_timestep_embedding


class AffineRMSNorm(Module):
    r"""RMSNorm with learned scale (diffusers `RMSNorm`, elementwise affine)."""

    def __init__(self, dim: int, eps: float = 1e-5) -> None:
        self.scale = jnp.ones(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)

        return h.astype(x.dtype) * self.scale.astype(x.dtype)


class CaptionProjection(Module):
    r"""Prompt-embedding projection (diffusers `PixArtAlphaTextProjection`
    with its default ``act_fn='gelu_tanh'`` — unlike the SiLU time embedder)."""

    def __init__(self, in_dim: int, dim: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.linear_1 = Linear(in_dim, dim, key=k1)
        self.linear_2 = Linear(dim, dim, key=k2)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.gelu(self.linear_1(x), approximate=True))


class SanaLinearAttention(Module):
    r"""ReLU linear attention (diffusers `SanaLinearAttnProcessor2_0`):
    :math:`\mathrm{out} = \frac{\phi(q) (\phi(k)^T v)}{\phi(q) \sum_l \phi(k_l)}`
    with :math:`\phi = \mathrm{relu}`, computed in float32. SANA 1.5
    checkpoints add across-heads RMS q/k normalization
    (diffusers ``qk_norm='rms_norm_across_heads'``)."""

    def __init__(
        self, dim: int, heads: int, head_dim: int, qk_norm: bool = False, *, key: Array
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        inner = heads * head_dim

        self.heads = heads
        self.to_q = Linear(dim, inner, bias=False, key=k1)
        self.to_k = Linear(dim, inner, bias=False, key=k2)
        self.to_v = Linear(dim, inner, bias=False, key=k3)
        self.to_out = Linear(inner, dim, key=k4)

        if qk_norm:
            self.norm_q = AffineRMSNorm(inner, eps=1e-5)
            self.norm_k = AffineRMSNorm(inner, eps=1e-5)
        else:
            self.norm_q = None
            self.norm_k = None

    def __call__(self, x: Array) -> Array:
        B, L, _ = x.shape
        H = self.heads

        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)

        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)

        q = jax.nn.relu(q).reshape(B, L, H, -1).astype(jnp.float32)
        k = jax.nn.relu(k).reshape(B, L, H, -1).astype(jnp.float32)
        v = v.reshape(B, L, H, -1).astype(jnp.float32)

        # k^T v and k^T 1 in one contraction (ones channel appended to v)
        v1 = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
        scores = jnp.einsum("blhd,blhe->bhde", k, v1)  # (B, H, d, d+1)
        out = jnp.einsum("blhd,bhde->blhe", q, scores)  # (B, L, H, d+1)

        out = out[..., :-1] / (out[..., -1:] + 1e-15)
        out = out.reshape(B, L, -1).astype(x.dtype)

        return self.to_out(out)


class SanaCrossAttention(Module):
    r"""Softmax cross-attention over prompt embeddings, with additive mask and
    optional across-heads RMS q/k normalization (SANA 1.5)."""

    def __init__(
        self, dim: int, heads: int, head_dim: int, qk_norm: bool = False, *, key: Array
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        inner = heads * head_dim

        self.heads = heads
        self.to_q = Linear(dim, inner, key=k1)
        self.to_k = Linear(dim, inner, key=k2)
        self.to_v = Linear(dim, inner, key=k3)
        self.to_out = Linear(inner, dim, key=k4)

        if qk_norm:
            self.norm_q = AffineRMSNorm(inner, eps=1e-5)
            self.norm_k = AffineRMSNorm(inner, eps=1e-5)
        else:
            self.norm_q = None
            self.norm_k = None

    def __call__(self, x: Array, context: Array, mask: Array | None = None) -> Array:
        B, L, _ = x.shape
        S = context.shape[1]
        H = self.heads

        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)

        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)

        q = jnp.swapaxes(q.reshape(B, L, H, -1), 1, 2)
        k = jnp.swapaxes(k.reshape(B, S, H, -1), 1, 2)
        v = jnp.swapaxes(v.reshape(B, S, H, -1), 1, 2)

        if mask is not None:
            # additive bias: -10000 on masked-out positions (diffusers)
            bias = (1.0 - mask.astype(jnp.float32)) * -10000.0
            logits = jnp.einsum("bhld,bhsd->bhls", q, k) / jnp.sqrt(q.shape[-1])
            logits = logits + bias[:, None, None, :]
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            a = jnp.einsum("bhls,bhsd->bhld", weights, v)
        else:
            a = dot_product_attention(q, k, v)

        a = jnp.swapaxes(a, 1, 2).reshape(B, L, -1)

        return self.to_out(a)


class GLUMBConv(Module):
    r"""MobileNet-style gated conv feed-forward: 1x1 expansion, 3x3 depthwise,
    GLU gate, 1x1 projection (no bias on the projection)."""

    def __init__(self, dim: int, mlp_ratio: float = 2.5, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        hidden = int(dim * mlp_ratio)

        self.conv_inverted = Conv(dim, 2 * hidden, kernel_size=(1, 1), key=k1)
        # depthwise: kernel (3, 3, 1, 2*hidden) with feature_group_count
        self.conv_depth = Conv(
            1, 2 * hidden, kernel_size=(3, 3), padding=((1, 1), (1, 1)), key=k2
        )
        self.conv_point = Conv(hidden, dim, kernel_size=(1, 1), bias=False, key=k3)

    def __call__(self, x: Array) -> Array:
        r"""x: (B, H, W, C) channels-last."""

        h = jax.nn.silu(self.conv_inverted(x))
        h = self._depthwise(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.silu(gate)

        return self.conv_point(h)

    def _depthwise(self, h: Array) -> Array:
        C = h.shape[-1]
        # diffusers stores the depthwise conv as groups=C: kernel (3, 3, 1, C)
        w = self.conv_depth.weight

        y = jax.lax.conv_general_dilated(
            h,
            w.astype(h.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

        return y + self.conv_depth.bias.astype(h.dtype)


class SanaTransformerBlock(Module):
    def __init__(
        self,
        dim: int,
        heads: int,
        head_dim: int,
        cross_heads: int,
        cross_head_dim: int,
        mlp_ratio: float = 2.5,
        qk_norm: bool = False,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.norm1 = LayerNorm(eps=1e-6)
        self.attn1 = SanaLinearAttention(dim, heads, head_dim, qk_norm, key=k1)
        self.attn2 = SanaCrossAttention(dim, cross_heads, cross_head_dim, qk_norm, key=k2)
        self.norm2 = LayerNorm(eps=1e-6)
        self.ff = GLUMBConv(dim, mlp_ratio, key=k3)

        self.scale_shift_table = jax.random.normal(k4, (6, dim)) / dim**0.5

    def __call__(
        self,
        x: Array,
        context: Array,
        context_mask: Array | None,
        timestep: Array,
        H: int,
        W: int,
    ) -> Array:
        B, L, C = x.shape

        table = self.scale_shift_table[None] + timestep.reshape(B, 6, -1)
        table = table.astype(x.dtype)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            table[:, i : i + 1] for i in range(6)
        )

        h = self.norm1(x) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h)

        x = x + self.attn2(x, context, context_mask)

        h = self.norm2(x) * (1 + scale_mlp) + shift_mlp
        h = self.ff(h.reshape(B, H, W, C)).reshape(B, L, C)
        x = x + gate_mlp * h

        return x


class SanaTransformer(Module):
    r"""The Sana linear DiT (diffusers ``SanaTransformer2DModel`` semantics).

    Defaults correspond to Sana 1.6B; the 0.6B variant uses
    ``num_layers=28, num_attention_heads=36`` (inner 1152) etc.

    Arguments:
        in_channels: Latent channels (DC-AE, 32).
        out_channels: Output channels.
        num_attention_heads / attention_head_dim: Linear self-attention shape.
        num_cross_attention_heads / cross_attention_head_dim: Cross-attention shape.
        caption_channels: Gemma embedding width.
        num_layers: Transformer depth.
        patch_size: Latent patchification (1 for the 1024px models).
        mlp_ratio: GLUMBConv expansion.
        qk_norm: Across-heads RMS q/k normalization (SANA 1.5 checkpoints).
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        in_channels: int = 32,
        out_channels: int = 32,
        num_attention_heads: int = 70,
        attention_head_dim: int = 32,
        num_cross_attention_heads: int = 20,
        cross_attention_head_dim: int = 112,
        caption_channels: int = 2304,
        num_layers: int = 20,
        patch_size: int = 1,
        mlp_ratio: float = 2.5,
        qk_norm: bool = False,
        *,
        key: Array,
    ) -> None:
        dim = num_attention_heads * attention_head_dim

        self.patch_size = patch_size
        self.dim = dim

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.patch_embed = Conv(
            in_channels,
            dim,
            kernel_size=(patch_size, patch_size),
            stride=(patch_size, patch_size),
            key=next_key(),
        )

        # AdaLayerNormSingle: sinusoidal(256) -> MLP -> silu -> 6*dim table
        self.timestep_embedder = MLPEmbedder(256, dim, key=next_key())
        self.time_linear = Linear(dim, 6 * dim, key=next_key())

        self.caption_projection = CaptionProjection(caption_channels, dim, key=next_key())
        self.caption_norm = AffineRMSNorm(dim, eps=1e-5)

        self.transformer_blocks = [
            SanaTransformerBlock(
                dim,
                num_attention_heads,
                attention_head_dim,
                num_cross_attention_heads,
                cross_attention_head_dim,
                mlp_ratio,
                qk_norm,
                key=next_key(),
            )
            for _ in range(num_layers)
        ]

        self.scale_shift_table = jax.random.normal(next_key(), (2, dim)) / dim**0.5
        self.norm_out = LayerNorm(eps=1e-6)
        self.proj_out = Linear(dim, patch_size * patch_size * out_channels, key=next_key())

    def __call__(
        self,
        hidden_states: Array,
        timestep: Array,
        encoder_hidden_states: Array,
        encoder_attention_mask: Array | None = None,
        **kwargs,
    ) -> Array:
        r"""
        Arguments:
            hidden_states: Noisy latents, channels-last, with shape
                :math:`(B, H, W, C)`.
            timestep: Scaled timesteps, with shape :math:`(B,)`.
            encoder_hidden_states: Gemma embeddings, with shape :math:`(B, L, D)`.
            encoder_attention_mask: The prompt mask, with shape :math:`(B, L)`.

        Returns:
            The prediction, with shape :math:`(B, H, W, C_o)`.
        """

        B, H, W, _ = hidden_states.shape
        p = self.patch_size
        Hp, Wp = H // p, W // p

        x = self.patch_embed(hidden_states).reshape(B, Hp * Wp, self.dim)

        t_proj = sinusoidal_timestep_embedding(
            timestep.astype(jnp.float32), 256
        ).astype(x.dtype)
        embedded_timestep = self.timestep_embedder(t_proj)
        timestep_table = self.time_linear(jax.nn.silu(embedded_timestep))

        context = self.caption_norm(self.caption_projection(encoder_hidden_states))

        for block in self.transformer_blocks:
            x = block(x, context, encoder_attention_mask, timestep_table, Hp, Wp)

        table = (
            self.scale_shift_table[None] + embedded_timestep[:, None]
        ).astype(x.dtype)
        shift, scale = table[:, 0:1], table[:, 1:2]

        x = self.norm_out(x) * (1 + scale) + shift
        x = self.proj_out(x)

        # unpatchify
        C = x.shape[-1] // (p * p)
        x = x.reshape(B, Hp, Wp, p, p, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, C)

        return x

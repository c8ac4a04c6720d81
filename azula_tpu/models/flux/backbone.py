r"""Flux MMDiT transformer, TPU-native.

A channels-last JAX reimplementation of the architecture consumed by the
FLUX.1 checkpoints (diffusers ``FluxTransformer2DModel`` semantics — the
backbone the reference loads through diffusers,
`azula/plugins/flux/__init__.py:260-303`): dual-stream MMDiT blocks over
(text, image) token sequences followed by single-stream blocks over the
concatenation, three-axis rotary position embeddings, AdaLN-Zero modulation
from a combined timestep/guidance/pooled-text embedding.

Structure and naming are kept isomorphic to the checkpoint layout
(``transformer_blocks.N.attn.to_q``) so the weight converter
(:mod:`azula_tpu.models.flux.convert`) is a mechanical walk.
"""

from __future__ import annotations

__all__ = [
    "FluxTransformer",
]

import jax
import jax.numpy as jnp

from collections.abc import Sequence
from jax import Array

from ...nn.layers import Linear
from ...nn.module import Module
from ...ops.attention import dot_product_attention
from ..sd.backbone import sinusoidal_timestep_embedding


class LayerNorm(Module):
    r"""Parameter-free LayerNorm over the last axis, float32 statistics
    (`elementwise_affine=False`, eps 1e-6)."""

    def __init__(self, eps: float = 1e-6) -> None:
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        m = jnp.mean(h, axis=-1, keepdims=True)
        v = jnp.var(h, axis=-1, keepdims=True)

        return ((h - m) * jax.lax.rsqrt(v + self.eps)).astype(x.dtype)


class RMSNorm(Module):
    r"""RMSNorm with a learned scale (diffusers `RMSNorm`, eps 1e-6), applied
    per attention head to q/k."""

    def __init__(self, dim: int, eps: float = 1e-6) -> None:
        self.scale = jnp.ones(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)

        return h.astype(x.dtype) * self.scale.astype(x.dtype)


class MLPEmbedder(Module):
    r"""`linear_1 -> SiLU -> linear_2` (diffusers `TimestepEmbedding` /
    `PixArtAlphaTextProjection`)."""

    def __init__(self, in_dim: int, dim: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.linear_1 = Linear(in_dim, dim, key=k1)
        self.linear_2 = Linear(dim, dim, key=k2)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


def rope_cos_sin(ids: Array, axes_dim: Sequence[int], theta: float = 10000.0) -> tuple[Array, Array]:
    r"""Three-axis rotary embedding tables (diffusers `FluxPosEmbed`):
    per axis `a` with dimension :math:`d_a`, angles `pos_a / theta^(2i/d_a)`,
    cos/sin repeated over interleaved pairs; concatenated across axes.

    Arguments:
        ids: Positions, with shape :math:`(L, A)`.

    Returns:
        `(cos, sin)` tables, with shape :math:`(L, \sum_a d_a)`, float32.
    """

    cos_parts, sin_parts = [], []

    for a, dim in enumerate(axes_dim):
        freqs = 1.0 / theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        angles = ids[:, a].astype(jnp.float32)[:, None] * freqs
        cos_parts.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        sin_parts.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))

    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    r"""Rotates interleaved channel pairs: `x` with shape :math:`(B, H, L, D)`,
    tables with shape :math:`(L, D)`.

    The rotation runs in the *input* dtype: for bf16 serving the extra
    rounding of the cos/sin tables and the multiply-add is within the noise
    the bf16 q/k storage already carries, and skipping the f32 round trip
    over the :math:`(B, H, L, D)` tensors measures ~5% off the Flux
    dual-stream block (f32 inputs keep full-precision tables, so the golden
    parity tests are unaffected). A split-half layout (per-axis-segment
    rotate-half instead of the pair interleave) was measured *slower* than
    this form — XLA lowers the pair swap well — and was not adopted.
    """

    xr = x.reshape(*x.shape[:-1], -1, 2)
    x_rot = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x.shape)

    return x * cos.astype(x.dtype) + x_rot * sin.astype(x.dtype)


class AdaLayerNormZero(Module):
    r"""`silu(emb) -> linear -> n_chunks modulation params` + parameter-free LN."""

    def __init__(self, dim: int, n: int = 6, *, key: Array) -> None:
        self.linear = Linear(dim, n * dim, key=key)
        self.norm = LayerNorm()
        self.n = n

    def __call__(self, x: Array, emb: Array) -> tuple[Array, ...]:
        params = self.linear(jax.nn.silu(emb))
        chunks = jnp.split(params, self.n, axis=-1)

        shift, scale = chunks[0], chunks[1]
        h = self.norm(x) * (1 + scale[:, None]) + shift[:, None]

        return (h, *chunks[2:])


class GELUFeedForward(Module):
    r"""`proj -> GELU(tanh) -> out` (diffusers `FeedForward` with `gelu-approximate`)."""

    def __init__(self, dim: int, mult: int = 4, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.proj = Linear(dim, mult * dim, key=k1)
        self.out = Linear(mult * dim, dim, key=k2)

    def __call__(self, x: Array) -> Array:
        return self.out(jax.nn.gelu(self.proj(x), approximate=True))


class JointAttention(Module):
    r"""MMDiT joint attention: separate q/k/v projections for the image and
    text streams, per-head RMS q/k norms, rotary embedding over the
    concatenated sequence, separate output projections."""

    def __init__(self, dim: int, heads: int, *, key: Array) -> None:
        keys = jax.random.split(key, 8)

        self.heads = heads
        self.to_q = Linear(dim, dim, key=keys[0])
        self.to_k = Linear(dim, dim, key=keys[1])
        self.to_v = Linear(dim, dim, key=keys[2])
        self.add_q_proj = Linear(dim, dim, key=keys[3])
        self.add_k_proj = Linear(dim, dim, key=keys[4])
        self.add_v_proj = Linear(dim, dim, key=keys[5])

        head_dim = dim // heads
        self.norm_q = RMSNorm(head_dim)
        self.norm_k = RMSNorm(head_dim)
        self.norm_added_q = RMSNorm(head_dim)
        self.norm_added_k = RMSNorm(head_dim)

        self.to_out = Linear(dim, dim, key=keys[6])
        self.to_add_out = Linear(dim, dim, key=keys[7])

    def __call__(
        self, img: Array, txt: Array, cos: Array, sin: Array
    ) -> tuple[Array, Array]:
        B, L, C = img.shape
        Lt = txt.shape[1]
        H = self.heads

        def split(x):
            return jnp.swapaxes(x.reshape(B, -1, H, C // H), 1, 2)  # (B, H, L, d)

        q = self.norm_q(split(self.to_q(img)))
        k = self.norm_k(split(self.to_k(img)))
        v = split(self.to_v(img))

        qc = self.norm_added_q(split(self.add_q_proj(txt)))
        kc = self.norm_added_k(split(self.add_k_proj(txt)))
        vc = split(self.add_v_proj(txt))

        # text first, matching the checkpoint convention
        q = apply_rope(jnp.concatenate([qc, q], axis=2), cos, sin)
        k = apply_rope(jnp.concatenate([kc, k], axis=2), cos, sin)
        v = jnp.concatenate([vc, v], axis=2)

        # q/k rows are RMS-normalized above (norms <= sqrt(D) max|gamma|;
        # rope preserves pairwise norms), so the logits are bounded and the
        # VPU-bound flash softmax can skip its max pass.
        a = dot_product_attention(q, k, v, max_free=True)
        a = jnp.swapaxes(a, 1, 2).reshape(B, Lt + L, C)

        return self.to_out(a[:, Lt:]), self.to_add_out(a[:, :Lt])


class FluxTransformerBlock(Module):
    r"""Dual-stream MMDiT block."""

    def __init__(self, dim: int, heads: int, *, key: Array) -> None:
        keys = jax.random.split(key, 5)

        self.norm1 = AdaLayerNormZero(dim, key=keys[0])
        self.norm1_context = AdaLayerNormZero(dim, key=keys[1])
        self.attn = JointAttention(dim, heads, key=keys[2])
        self.norm2 = LayerNorm()
        self.norm2_context = LayerNorm()
        self.ff = GELUFeedForward(dim, key=keys[3])
        self.ff_context = GELUFeedForward(dim, key=keys[4])

    def __call__(
        self, img: Array, txt: Array, emb: Array, cos: Array, sin: Array
    ) -> tuple[Array, Array]:
        h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(img, emb)
        hc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(txt, emb)

        attn_img, attn_txt = self.attn(h, hc, cos, sin)

        img = img + gate_msa[:, None] * attn_img
        h = self.norm2(img) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        img = img + gate_mlp[:, None] * self.ff(h)

        txt = txt + c_gate_msa[:, None] * attn_txt
        hc = self.norm2_context(txt) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        txt = txt + c_gate_mlp[:, None] * self.ff_context(hc)

        return img, txt


class SingleAttention(Module):
    r"""Single-stream attention: q/k/v with RMS norms and rope, no output
    projection (it is fused into the block's `proj_out`)."""

    def __init__(self, dim: int, heads: int, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.heads = heads
        self.to_q = Linear(dim, dim, key=k1)
        self.to_k = Linear(dim, dim, key=k2)
        self.to_v = Linear(dim, dim, key=k3)
        self.norm_q = RMSNorm(dim // heads)
        self.norm_k = RMSNorm(dim // heads)

    def __call__(self, x: Array, cos: Array, sin: Array) -> Array:
        B, L, C = x.shape
        H = self.heads

        def split(t):
            return jnp.swapaxes(t.reshape(B, L, H, C // H), 1, 2)

        q = apply_rope(self.norm_q(split(self.to_q(x))), cos, sin)
        k = apply_rope(self.norm_k(split(self.to_k(x))), cos, sin)
        v = split(self.to_v(x))

        # RMS-normalized q/k: bounded logits, max-free flash softmax.
        a = dot_product_attention(q, k, v, max_free=True)

        return jnp.swapaxes(a, 1, 2).reshape(B, L, C)


class FluxSingleTransformerBlock(Module):
    r"""Single-stream block: parallel attention + MLP, concatenated and
    projected back with one gate."""

    def __init__(self, dim: int, heads: int, mlp_ratio: float = 4.0, *, key: Array) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        inner = int(dim * mlp_ratio)

        self.norm = AdaLayerNormZero(dim, n=3, key=k1)
        self.proj_mlp = Linear(dim, inner, key=k2)
        self.attn = SingleAttention(dim, heads, key=k3)
        self.proj_out = Linear(dim + inner, dim, key=k4)

    def __call__(self, x: Array, emb: Array, cos: Array, sin: Array) -> Array:
        h, gate = self.norm(x, emb)

        mlp = jax.nn.gelu(self.proj_mlp(h), approximate=True)
        attn = self.attn(h, cos, sin)

        return x + gate[:, None] * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


class TimeTextEmbed(Module):
    r"""Combined timestep (+ optional distilled guidance) + pooled-text
    embedding (diffusers `CombinedTimestepGuidanceTextProjEmbeddings`)."""

    def __init__(self, dim: int, pooled_dim: int, guidance: bool, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.timestep_embedder = MLPEmbedder(256, dim, key=k1)
        self.guidance_embedder = MLPEmbedder(256, dim, key=k2) if guidance else None
        self.text_embedder = MLPEmbedder(pooled_dim, dim, key=k3)

    def __call__(self, timestep: Array, guidance: Array | None, pooled: Array) -> Array:
        t_proj = sinusoidal_timestep_embedding(timestep * 1000.0, 256).astype(pooled.dtype)
        emb = self.timestep_embedder(t_proj)

        if self.guidance_embedder is not None:
            g = jnp.zeros_like(timestep) if guidance is None else guidance
            g_proj = sinusoidal_timestep_embedding(g * 1000.0, 256).astype(pooled.dtype)
            emb = emb + self.guidance_embedder(g_proj)

        return emb + self.text_embedder(pooled)


class FluxTransformer(Module):
    r"""The Flux MMDiT (diffusers ``FluxTransformer2DModel`` semantics).

    Defaults correspond to FLUX.1-dev/schnell; `guidance_embeds=True` for the
    guidance-distilled dev variant.

    Arguments:
        in_channels: Packed latent channels (2x2 pixel-shuffled, 64).
        num_layers: Dual-stream MMDiT blocks.
        num_single_layers: Single-stream blocks.
        attention_head_dim: Per-head width.
        num_attention_heads: Head count (inner dim = heads x head_dim).
        joint_attention_dim: T5 embedding width.
        pooled_projection_dim: CLIP pooled width.
        guidance_embeds: Distilled-guidance conditioning input.
        axes_dims_rope: Rotary dims per position axis (sum = head dim).
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        in_channels: int = 64,
        num_layers: int = 19,
        num_single_layers: int = 38,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 4096,
        pooled_projection_dim: int = 768,
        guidance_embeds: bool = True,
        axes_dims_rope: Sequence[int] = (16, 56, 56),
        *,
        key: Array,
    ) -> None:
        dim = num_attention_heads * attention_head_dim

        self.axes_dims_rope = tuple(axes_dims_rope)

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.time_text_embed = TimeTextEmbed(
            dim, pooled_projection_dim, guidance_embeds, key=next_key()
        )
        self.context_embedder = Linear(joint_attention_dim, dim, key=next_key())
        self.x_embedder = Linear(in_channels, dim, key=next_key())

        self.transformer_blocks = [
            FluxTransformerBlock(dim, num_attention_heads, key=next_key())
            for _ in range(num_layers)
        ]
        self.single_transformer_blocks = [
            FluxSingleTransformerBlock(dim, num_attention_heads, key=next_key())
            for _ in range(num_single_layers)
        ]

        self.norm_out_linear = Linear(dim, 2 * dim, key=next_key())
        self.norm_out = LayerNorm()
        self.proj_out = Linear(dim, in_channels, key=next_key())

    def __call__(
        self,
        hidden_states: Array,
        timestep: Array,
        encoder_hidden_states: Array,
        pooled_projections: Array,
        img_ids: Array,
        txt_ids: Array,
        guidance: Array | None = None,
        **kwargs,
    ) -> Array:
        r"""
        Arguments:
            hidden_states: Packed latents, with shape :math:`(B, L, C)`.
            timestep: Noise level in :math:`[0, 1]`, with shape :math:`(B,)`.
            encoder_hidden_states: T5 embeddings, with shape :math:`(B, L_t, D)`.
            pooled_projections: CLIP pooled prompt, with shape :math:`(B, F)`.
            img_ids / txt_ids: Position ids, with shape :math:`(L, 3)`.
            guidance: Distilled guidance strength, with shape :math:`(B,)`.

        Returns:
            The velocity prediction, with shape :math:`(B, L, C)`.
        """

        img = self.x_embedder(hidden_states)
        txt = self.context_embedder(encoder_hidden_states)

        emb = self.time_text_embed(
            timestep.astype(jnp.float32), guidance, pooled_projections
        ).astype(img.dtype)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_cos_sin(ids, self.axes_dims_rope)

        for block in self.transformer_blocks:
            img, txt = block(img, txt, emb, cos, sin)

        h = jnp.concatenate([txt, img], axis=1)

        for block in self.single_transformer_blocks:
            h = block(h, emb, cos, sin)

        h = h[:, txt.shape[1] :]

        scale, shift = jnp.split(self.norm_out_linear(jax.nn.silu(emb)), 2, axis=-1)
        h = self.norm_out(h) * (1 + scale[:, None]) + shift[:, None]

        return self.proj_out(h)

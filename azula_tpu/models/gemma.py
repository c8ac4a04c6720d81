r"""Gemma 2 text model, TPU-native.

A JAX reimplementation of `transformers.Gemma2Model` — the prompt encoder of
the Sana family (reference load path: `azula/plugins/sana/__init__.py:264-277`,
`google/gemma-2-2b-it`): zero-centered RMSNorms in a sandwich layout (pre/post
around both attention and MLP), grouped-query attention with rotary embeddings
and logit soft-capping, GELU-gated MLP, sqrt(dim) embedding scaling.

Sliding-window attention (alternate layers, window 4096) degenerates to plain
causal attention at Sana's 300-token prompt lengths; the window is still
applied for parity at any length.

Verified against `transformers.Gemma2Model` with shared random weights
(`tests/test_models_gemma.py`).
"""

from __future__ import annotations

__all__ = [
    "Gemma2TextModel",
    "convert_gemma_state_dict",
]

import jax
import jax.numpy as jnp

from jax import Array

from ..nn.layers import Linear
from ..nn.module import Module
from .convert_utils import Converter


class GemmaRMSNorm(Module):
    r"""RMSNorm with zero-centered weight: :math:`y = \hat x (1 + w)`,
    float32 statistics."""

    def __init__(self, dim: int, eps: float = 1e-6) -> None:
        self.scale = jnp.zeros(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)
        h = h * (1.0 + self.scale.astype(jnp.float32))

        return h.astype(x.dtype)


def _rope(x: Array, positions: Array, theta: float = 10000.0) -> Array:
    r"""Rotary embedding over half-split channel pairs (the transformers
    convention: rotate_half)."""

    d = x.shape[-1]
    freqs = 1.0 / theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    angles = positions.astype(jnp.float32)[:, None] * freqs  # (L, d/2)

    cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)[None, :, None, :]
    sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)[None, :, None, :]

    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)

    out = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin

    return out.astype(x.dtype)


class Gemma2Attention(Module):
    def __init__(
        self,
        dim: int,
        heads: int,
        kv_heads: int,
        head_dim: int,
        query_pre_attn_scalar: float,
        softcap: float | None,
        sliding_window: int | None,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.heads = heads
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        self.scale = query_pre_attn_scalar**-0.5
        self.softcap = softcap
        self.sliding_window = sliding_window

        self.q_proj = Linear(dim, heads * head_dim, bias=False, key=k1)
        self.k_proj = Linear(dim, kv_heads * head_dim, bias=False, key=k2)
        self.v_proj = Linear(dim, kv_heads * head_dim, bias=False, key=k3)
        self.o_proj = Linear(heads * head_dim, dim, bias=False, key=k4)

    def __call__(self, x: Array, mask: Array | None) -> Array:
        B, L, _ = x.shape
        H, KV, D = self.heads, self.kv_heads, self.head_dim

        pos = jnp.arange(L)

        q = self.q_proj(x).reshape(B, L, H, D)
        k = self.k_proj(x).reshape(B, L, KV, D)
        v = self.v_proj(x).reshape(B, L, KV, D)

        q = _rope(q, pos)
        k = _rope(k, pos)

        # grouped-query: repeat kv heads
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        logits = jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32) * self.scale

        if self.softcap is not None:
            logits = self.softcap * jnp.tanh(logits / self.softcap)

        causal = pos[:, None] >= pos[None, :]
        if self.sliding_window is not None:
            causal = causal & (pos[:, None] - pos[None, :] < self.sliding_window)

        allow = causal[None, None]
        if mask is not None:
            allow = allow & mask.astype(bool)[:, None, None, :]

        logits = jnp.where(allow, logits, jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)

        out = jnp.einsum("bhls,bshd->blhd", weights, v).reshape(B, L, H * D)

        return self.o_proj(out)


class Gemma2MLP(Module):
    def __init__(self, dim: int, intermediate: int, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.gate_proj = Linear(dim, intermediate, bias=False, key=k1)
        self.up_proj = Linear(dim, intermediate, bias=False, key=k2)
        self.down_proj = Linear(intermediate, dim, bias=False, key=k3)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(
            jax.nn.gelu(self.gate_proj(x), approximate=True) * self.up_proj(x)
        )


class Gemma2Layer(Module):
    def __init__(
        self,
        dim: int,
        heads: int,
        kv_heads: int,
        head_dim: int,
        intermediate: int,
        query_pre_attn_scalar: float,
        softcap: float | None,
        sliding_window: int | None,
        *,
        key: Array,
    ) -> None:
        k1, k2 = jax.random.split(key)

        self.input_layernorm = GemmaRMSNorm(dim)
        self.self_attn = Gemma2Attention(
            dim, heads, kv_heads, head_dim, query_pre_attn_scalar, softcap,
            sliding_window, key=k1,
        )
        self.post_attention_layernorm = GemmaRMSNorm(dim)
        self.pre_feedforward_layernorm = GemmaRMSNorm(dim)
        self.mlp = Gemma2MLP(dim, intermediate, key=k2)
        self.post_feedforward_layernorm = GemmaRMSNorm(dim)

    def __call__(self, x: Array, mask: Array | None) -> Array:
        h = self.self_attn(self.input_layernorm(x), mask)
        x = x + self.post_attention_layernorm(h)

        h = self.mlp(self.pre_feedforward_layernorm(x))
        x = x + self.post_feedforward_layernorm(h)

        return x


class Gemma2TextModel(Module):
    r"""The Gemma 2 transformer (encoder use: returns the last hidden state).

    Defaults correspond to gemma-2-2b.

    Arguments:
        vocab_size: The token vocabulary size.
        dim: The model width.
        layers: The number of layers.
        heads / kv_heads / head_dim: Grouped-query attention shape.
        intermediate: The MLP width.
        query_pre_attn_scalar: Attention scaling denominator.
        attn_logit_softcapping: Logit soft-cap (None disables).
        sliding_window: Window size of the alternating local-attention layers.
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        vocab_size: int = 256000,
        dim: int = 2304,
        layers: int = 26,
        heads: int = 8,
        kv_heads: int = 4,
        head_dim: int = 256,
        intermediate: int = 9216,
        query_pre_attn_scalar: float = 256.0,
        attn_logit_softcapping: float | None = 50.0,
        sliding_window: int = 4096,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, layers + 1)

        self.dim = dim
        self.embed_tokens = jax.random.normal(keys[0], (vocab_size, dim)) * 0.02

        self.model_layers = [
            Gemma2Layer(
                dim, heads, kv_heads, head_dim, intermediate,
                query_pre_attn_scalar, attn_logit_softcapping,
                # even layers use the sliding window (transformers Gemma2)
                sliding_window if i % 2 == 0 else None,
                key=keys[1 + i],
            )
            for i in range(layers)
        ]

        self.norm = GemmaRMSNorm(dim)

    def __call__(self, input_ids: Array, attention_mask: Array | None = None) -> Array:
        r"""
        Arguments:
            input_ids: Token ids, with shape :math:`(B, L)`.
            attention_mask: Padding mask (1 = keep), with shape :math:`(B, L)`.

        Returns:
            The last hidden state, with shape :math:`(B, L, C)`.
        """

        x = self.embed_tokens[input_ids]
        x = x * jnp.asarray(self.dim**0.5, dtype=x.dtype)

        for layer in self.model_layers:
            x = layer(x, attention_mask)

        return self.norm(x)


def canonicalize_gemma_keys(torch_sd) -> dict:
    r"""Renames `transformers.Gemma2Model` keys to the converter's canonical
    space (key-only; values pass through)."""

    sd = {}
    for k, v in torch_sd.items():
        k = k.removeprefix("model.")
        k = k.replace("layers.", "model_layers.")
        sd[k] = v

    return sd


def convert_gemma_state_dict(module: Gemma2TextModel, torch_sd) -> dict:
    r"""Converts a `transformers.Gemma2Model` state dict
    (the `text_encoder/` safetensors of Sana checkpoints)."""

    from .convert_utils import _np

    sd = None if torch_sd is None else canonicalize_gemma_keys(torch_sd)

    converter = Converter(sd, norm_types=(GemmaRMSNorm,))
    converter.array("embed_tokens", "embed_tokens.weight")
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

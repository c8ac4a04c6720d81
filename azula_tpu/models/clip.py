r"""CLIP text encoder, TPU-native.

A channels-last JAX reimplementation of `transformers.CLIPTextModel` — the
prompt encoder of the SD family and the pooled-text branch of Flux (reference
load paths: `azula/plugins/sd/__init__.py:268-271`,
`azula/plugins/flux/__init__.py:97-153`). Pre-LayerNorm transformer with causal
attention and quick-GELU (SD 1.x) or GELU (SD 2 / OpenCLIP) activations.

Verified for numerical parity against `transformers.CLIPTextModel` with shared
random weights (`tests/test_models_clip.py`) — a real oracle, since
`transformers` constructs models offline.
"""

from __future__ import annotations

__all__ = [
    "CLIPTextEncoder",
    "convert_clip_state_dict",
]

import jax
import jax.numpy as jnp

from jax import Array

from ..nn.layers import Linear
from ..nn.module import Module
from .convert_utils import Converter


class _LayerNorm(Module):
    r"""Affine LayerNorm (float32 statistics)."""

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


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _Attention(Module):
    def __init__(self, dim: int, heads: int, *, key: Array) -> None:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        self.heads = heads
        self.q_proj = Linear(dim, dim, key=k1)
        self.k_proj = Linear(dim, dim, key=k2)
        self.v_proj = Linear(dim, dim, key=k3)
        self.out_proj = Linear(dim, dim, key=k4)

    def __call__(self, x: Array, causal: bool = True) -> Array:
        B, L, C = x.shape
        H = self.heads

        q = self.q_proj(x).reshape(B, L, H, -1)
        k = self.k_proj(x).reshape(B, L, H, -1)
        v = self.v_proj(x).reshape(B, L, H, -1)

        logits = jnp.einsum("blhd,bshd->bhls", q, k) / jnp.sqrt(C // H)

        if causal:
            mask = jnp.tril(jnp.ones((L, L), dtype=bool))
            logits = jnp.where(mask, logits, -jnp.inf)

        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)

        a = jnp.einsum("bhls,bshd->blhd", weights, v).reshape(B, L, C)

        return self.out_proj(a)


class _MLP(Module):
    def __init__(self, dim: int, intermediate: int, act: str, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.fc1 = Linear(dim, intermediate, key=k1)
        self.fc2 = Linear(intermediate, dim, key=k2)
        self.act = act

    def __call__(self, x: Array) -> Array:
        h = self.fc1(x)

        if self.act == "quick_gelu":
            h = quick_gelu(h)
        else:
            h = jax.nn.gelu(h, approximate=False)

        return self.fc2(h)


class _EncoderLayer(Module):
    def __init__(self, dim: int, heads: int, intermediate: int, act: str, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.layer_norm1 = _LayerNorm(dim)
        self.self_attn = _Attention(dim, heads, key=k1)
        self.layer_norm2 = _LayerNorm(dim)
        self.mlp = _MLP(dim, intermediate, act, key=k2)

    def __call__(self, x: Array) -> Array:
        x = x + self.self_attn(self.layer_norm1(x))
        x = x + self.mlp(self.layer_norm2(x))

        return x


class CLIPTextEncoder(Module):
    r"""The CLIP text transformer.

    Defaults correspond to SD 1.x's CLIP ViT-L/14 text encoder; SD 2 uses the
    OpenCLIP variant (`hidden=1024, layers=23, heads=16, act='gelu'`).

    Arguments:
        vocab_size: The token vocabulary size.
        hidden: The hidden dimension.
        layers: The number of transformer layers.
        heads: The number of attention heads.
        intermediate: The MLP dimension.
        max_positions: The maximum sequence length.
        act: The MLP activation (`'quick_gelu'` or `'gelu'`).
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        vocab_size: int = 49408,
        hidden: int = 768,
        layers: int = 12,
        heads: int = 12,
        intermediate: int = 3072,
        max_positions: int = 77,
        act: str = "quick_gelu",
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, layers + 2)

        self.token_embedding = jax.random.normal(keys[0], (vocab_size, hidden)) * 0.02
        self.position_embedding = jax.random.normal(keys[1], (max_positions, hidden)) * 0.02

        self.encoder_layers = [
            _EncoderLayer(hidden, heads, intermediate, act, key=k) for k in keys[2:]
        ]

        self.final_layer_norm = _LayerNorm(hidden)

    def __call__(self, input_ids: Array) -> Array:
        r"""
        Arguments:
            input_ids: Token ids, with shape :math:`(B, L)`.

        Returns:
            The last hidden state, with shape :math:`(B, L, C)`.
        """

        L = input_ids.shape[-1]

        x = self.token_embedding[input_ids] + self.position_embedding[:L]

        for layer in self.encoder_layers:
            x = layer(x)

        return self.final_layer_norm(x)


def canonicalize_clip_keys(torch_sd) -> dict:
    r"""Renames `transformers.CLIPTextModel` keys to the converter's canonical
    space (key-only; values pass through, so this also canonicalizes
    key -> shape manifests)."""

    # transformers prefixes everything with text_model. and nests embeddings
    sd = {}
    for k, v in torch_sd.items():
        k = k.removeprefix("text_model.")
        k = k.replace("embeddings.token_embedding.", "token_embedding.")
        k = k.replace("embeddings.position_embedding.", "position_embedding.")
        k = k.replace("encoder.layers.", "encoder_layers.")
        if k == "embeddings.position_ids":  # legacy buffer in old checkpoints
            continue
        sd[k] = v

    return sd


def convert_clip_state_dict(module: CLIPTextEncoder, torch_sd) -> dict:
    r"""Converts a `transformers.CLIPTextModel` state dict (the
    `text_encoder/model.safetensors` of SD checkpoints)."""

    sd = None if torch_sd is None else canonicalize_clip_keys(torch_sd)

    converter = Converter(sd, norm_types=(_LayerNorm,))
    converter.array("token_embedding", "token_embedding.weight")
    converter.array("position_embedding", "position_embedding.weight")
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

r"""T5 text encoder, TPU-native.

A JAX reimplementation of `transformers.T5EncoderModel` (v1.1 / gated-GELU
variants) — the long-prompt encoder of the Flux family (reference load path:
`azula/plugins/flux/__init__.py:289-301`): relative-position-bucket attention
biases (first layer only, shared), T5 LayerNorm (RMS, no bias, no mean
subtraction), unscaled attention logits, gated feed-forward.

Verified for numerical parity against `transformers.T5EncoderModel` with
shared random weights (`tests/test_models_t5.py`).
"""

from __future__ import annotations

__all__ = [
    "T5Encoder",
    "convert_t5_state_dict",
]

import jax
import jax.numpy as jnp
import numpy as np

from jax import Array

from ..nn.layers import Linear
from ..nn.module import Module
from .convert_utils import Converter


class T5LayerNorm(Module):
    r"""RMS LayerNorm without bias or mean subtraction (T5 style)."""

    def __init__(self, dim: int, eps: float = 1e-6) -> None:
        self.scale = jnp.ones(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)

        return self.scale.astype(x.dtype) * h.astype(x.dtype)


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    r"""T5's bidirectional relative-position bucketing (host-side; positions
    are static)."""

    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)

    return ret + np.where(is_small, n, val_large)


class T5Attention(Module):
    def __init__(self, dim: int, heads: int, head_dim: int, has_bias: bool, *, key: Array) -> None:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        inner = heads * head_dim

        self.heads = heads
        self.q = Linear(dim, inner, bias=False, key=k1)
        self.k = Linear(dim, inner, bias=False, key=k2)
        self.v = Linear(dim, inner, bias=False, key=k3)
        self.o = Linear(inner, dim, bias=False, key=k4)

        if has_bias:
            self.relative_attention_bias = jax.random.normal(k5, (32, heads)) * 0.02
        else:
            self.relative_attention_bias = None

    def __call__(self, x: Array, position_bias: Array) -> Array:
        B, L, _ = x.shape
        H = self.heads

        q = self.q(x).reshape(B, L, H, -1)
        k = self.k(x).reshape(B, L, H, -1)
        v = self.v(x).reshape(B, L, H, -1)

        # T5 does NOT scale the logits
        logits = jnp.einsum("blhd,bshd->bhls", q, k) + position_bias
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)

        a = jnp.einsum("bhls,bshd->blhd", weights, v).reshape(B, L, -1)

        return self.o(a)


class T5FF(Module):
    r"""Gated feed-forward (`DenseGatedActDense`): `wo(gelu(wi_0 x) * wi_1 x)`."""

    def __init__(self, dim: int, ff_dim: int, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.wi_0 = Linear(dim, ff_dim, bias=False, key=k1)
        self.wi_1 = Linear(dim, ff_dim, bias=False, key=k2)
        self.wo = Linear(ff_dim, dim, bias=False, key=k3)

    def __call__(self, x: Array) -> Array:
        return self.wo(jax.nn.gelu(self.wi_0(x), approximate=True) * self.wi_1(x))


class T5Block(Module):
    def __init__(
        self, dim: int, heads: int, head_dim: int, ff_dim: int, first: bool, *, key: Array
    ) -> None:
        k1, k2 = jax.random.split(key)

        self.attn_norm = T5LayerNorm(dim)
        self.attn = T5Attention(dim, heads, head_dim, has_bias=first, key=k1)
        self.ff_norm = T5LayerNorm(dim)
        self.ff = T5FF(dim, ff_dim, key=k2)

    def __call__(self, x: Array, position_bias: Array) -> Array:
        x = x + self.attn(self.attn_norm(x), position_bias)
        x = x + self.ff(self.ff_norm(x))

        return x


class T5Encoder(Module):
    r"""The T5 encoder stack.

    Defaults correspond to t5-v1_1-xxl (the Flux text encoder); pass smaller
    hyperparameters for the other variants.

    Arguments:
        vocab_size: The token vocabulary size.
        dim: The model dimension.
        heads: The number of attention heads.
        head_dim: The per-head width (T5 decouples it from `dim`).
        ff_dim: The feed-forward width.
        layers: The number of blocks.
        key: PRNG key for initialization.
    """

    def __init__(
        self,
        vocab_size: int = 32128,
        dim: int = 4096,
        heads: int = 64,
        head_dim: int = 64,
        ff_dim: int = 10240,
        layers: int = 24,
        *,
        key: Array,
    ) -> None:
        keys = jax.random.split(key, layers + 1)

        self.shared = jax.random.normal(keys[0], (vocab_size, dim)) * 0.02

        self.blocks = [
            T5Block(dim, heads, head_dim, ff_dim, first=(i == 0), key=keys[1 + i])
            for i in range(layers)
        ]

        self.final_layer_norm = T5LayerNorm(dim)

    def __call__(self, input_ids: Array) -> Array:
        r"""
        Arguments:
            input_ids: Token ids, with shape :math:`(B, L)`.

        Returns:
            The last hidden state, with shape :math:`(B, L, C)`.
        """

        L = input_ids.shape[-1]

        x = self.shared[input_ids]

        # relative-position bias from the first block's embedding table; the
        # bucket indices depend only on L and are computed host-side
        pos = np.arange(L)
        buckets = relative_position_bucket(pos[None, :] - pos[:, None])
        bias = self.blocks[0].attn.relative_attention_bias[jnp.asarray(buckets)]
        bias = jnp.transpose(bias, (2, 0, 1))[None].astype(x.dtype)  # (1, H, L, L)

        for block in self.blocks:
            x = block(x, bias)

        return self.final_layer_norm(x)


def canonicalize_t5_keys(torch_sd) -> dict:
    r"""Renames `transformers.T5EncoderModel` keys to the converter's
    canonical space (key-only; values pass through)."""

    sd = {}
    for k, v in torch_sd.items():
        k = k.removeprefix("encoder.")
        k = k.replace("block.", "blocks.")
        k = k.replace(".layer.0.SelfAttention.", ".attn.")
        k = k.replace(".layer.0.layer_norm.", ".attn_norm.")
        k = k.replace(".layer.1.DenseReluDense.", ".ff.")
        k = k.replace(".layer.1.layer_norm.", ".ff_norm.")
        if k == "shared.weight" or k == "embed_tokens.weight":
            sd["shared"] = v
            continue
        sd[k] = v

    return sd


def convert_t5_state_dict(module: T5Encoder, torch_sd) -> dict:
    r"""Converts a `transformers.T5EncoderModel` state dict
    (the `text_encoder_2/` safetensors of Flux checkpoints)."""

    sd = None if torch_sd is None else canonicalize_t5_keys(torch_sd)

    converter = Converter(sd, norm_types=(T5LayerNorm,))
    if sd is not None:
        converter.used.add("shared")
    out = converter.walk(module)

    if sd is None:  # manifest mode: record the keys the code below consumes
        out["shared"] = tuple(int(d) for d in module.shared.shape)
        for i, block in enumerate(module.blocks):
            bias = getattr(block.attn, "relative_attention_bias", None)
            if bias is not None:
                out[f"blocks.{i}.attn.relative_attention_bias.weight"] = tuple(
                    int(d) for d in bias.shape
                )
        return out

    out["shared"] = np.asarray(
        sd["shared"].detach().cpu().float().numpy()
        if hasattr(sd["shared"], "detach")
        else sd["shared"]
    )

    # the relative bias table is an embedding: torch (buckets, heads) already
    for key in list(sd):
        if key.endswith("attn.relative_attention_bias.weight"):
            out[key.removesuffix(".weight")] = np.asarray(
                sd[key].detach().cpu().float().numpy()
                if hasattr(sd[key], "detach")
                else sd[key]
            )
            converter.used.add(key)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

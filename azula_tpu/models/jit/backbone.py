r"""JiT (Just image Transformer) backbone, TPU-native.

Channels-last JAX reimplementation of the architecture consumed by the JiT
checkpoints (reference vendored copy at `azula/plugins/jit/_src/model.py:213-379`
and `_src/util.py:38-145`): bottleneck patch embedding, fixed 2D sin-cos
positional embedding, 2D axial RoPE with in-context class-token padding, 6-way
AdaLN-Zero blocks with SwiGLU FFNs (half-split gating), and a zero-initialized
final layer.

Attribute names mirror the checkpoint's parameter paths for mechanical weight
conversion; RoPE tables and positional embeddings are precomputed on the host
in NumPy.
"""

from __future__ import annotations

__all__ = [
    "JiT",
    "JIT_CONFIGS",
]

import jax
import jax.numpy as jnp
import math
import numpy as np

from jax import Array

from ...nn.layers import Conv, Linear
from ...nn.module import Module
from ...ops.attention import dot_product_attention


def _xavier_uniform(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _linear(key, d_in, d_out, bias=True, std=None):
    lin = Linear(d_in, d_out, bias=bias, key=key)
    if std is None:
        lin.weight = _xavier_uniform(key, (d_in, d_out), d_in, d_out)
    else:
        lin.weight = jax.random.normal(key, (d_in, d_out)) * std
    if bias:
        lin.bias = jnp.zeros(d_out)
    return lin


def _zero_linear(key, d_in, d_out):
    lin = Linear(d_in, d_out, key=key)
    lin.weight = jnp.zeros((d_in, d_out))
    lin.bias = jnp.zeros(d_out)
    return lin


class JiTRMSNorm(Module):
    r"""Llama-style affine RMSNorm: float32 statistics, learned scale
    (reference `jit/_src/util.py:148-162`)."""

    def __init__(self, hidden_size: int, eps: float = 1e-6) -> None:
        self.weight = jnp.ones(hidden_size)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        dtype = x.dtype
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)
        return (self.weight * h).astype(dtype)


def _rotate_half(x: Array) -> Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def _axial_rope_tables(head_dim: int, seq_len: int, num_cls: int) -> tuple[np.ndarray, np.ndarray]:
    r"""Precomputes the 2D axial RoPE cos/sin tables
    (reference `VisionRotaryEmbeddingFast`, `jit/_src/util.py:93-145`).

    Returns `(cos, sin)` with shape `(num_cls + seq_len**2, head_dim)`;
    class-token rows rotate by identity (cos=1, sin=0).
    """

    dim = head_dim // 2  # per-axis rotary dim

    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)

    f = np.einsum("n,f->nf", t, freqs)
    f = np.repeat(f, 2, axis=-1)  # (n r) interleave, r=2

    # broadcast-concat over the two axes -> (S, S, head_dim)
    fh = np.broadcast_to(f[:, None, :], (seq_len, seq_len, f.shape[-1]))
    fw = np.broadcast_to(f[None, :, :], (seq_len, seq_len, f.shape[-1]))
    full = np.concatenate([fh, fw], axis=-1).reshape(-1, head_dim)

    cos = np.cos(full)
    sin = np.sin(full)

    if num_cls > 0:
        cos = np.concatenate([np.ones((num_cls, head_dim), np.float32), cos], axis=0)
        sin = np.concatenate([np.zeros((num_cls, head_dim), np.float32), sin], axis=0)

    return cos.astype(np.float32), sin.astype(np.float32)


def _sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    r"""Fixed 2D sin-cos positional embedding
    (reference `get_2d_sincos_pos_embed`, `jit/_src/util.py:165-210`)."""

    def axis_embed(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (embed_dim / 4))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h)

    emb = np.concatenate([axis_embed(gw), axis_embed(gh)], axis=1)

    return emb.astype(np.float32)


class JiTAttention(Module):
    r"""Multi-head attention with per-head RMSNorm and axial RoPE
    (reference `jit/_src/model.py:104-151`)."""

    def __init__(self, dim: int, num_heads: int, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.num_heads = num_heads
        self.q_norm = JiTRMSNorm(dim // num_heads)
        self.k_norm = JiTRMSNorm(dim // num_heads)
        self.qkv = _linear(k1, dim, 3 * dim)
        self.proj = _linear(k2, dim, dim)

    def __call__(self, x: Array, rope: tuple[Array, Array]) -> Array:
        B, N, C = x.shape
        H = self.num_heads
        ch = C // H

        qkv = self.qkv(x).reshape(B, N, 3, H, ch)
        qkv = jnp.moveaxis(qkv, 2, 0)  # (3, B, N, H, ch)
        q, k, v = (jnp.swapaxes(a, 1, 2) for a in qkv)  # (B, H, N, ch)

        q = self.q_norm(q)
        k = self.k_norm(k)

        cos, sin = rope
        cos, sin = cos.astype(q.dtype), sin.astype(q.dtype)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin

        y = dot_product_attention(q, k, v)

        y = jnp.swapaxes(y, 1, 2).reshape(B, N, C)

        return self.proj(y)


class JiTSwiGLU(Module):
    r"""SwiGLU FFN with half-split gating (reference `jit/_src/model.py:154-166`)."""

    def __init__(self, dim: int, hidden_dim: int, *, key: Array) -> None:
        hidden_dim = int(hidden_dim * 2 / 3)

        k1, k2 = jax.random.split(key)

        self.w12 = _linear(k1, dim, 2 * hidden_dim)
        self.w3 = _linear(k2, hidden_dim, dim)

    def __call__(self, x: Array) -> Array:
        x12 = self.w12(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return self.w3(jax.nn.silu(x1) * x2)


def _modulate(x: Array, shift: Array, scale: Array) -> Array:
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class JiTBlock(Module):
    r"""6-way AdaLN-Zero transformer block (reference `jit/_src/model.py:186-210`)."""

    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float = 4.0, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.norm1 = JiTRMSNorm(hidden_size)
        self.attn = JiTAttention(hidden_size, num_heads, key=k1)
        self.norm2 = JiTRMSNorm(hidden_size)
        self.mlp = JiTSwiGLU(hidden_size, int(hidden_size * mlp_ratio), key=k2)
        self.adaLN = _zero_linear(k3, hidden_size, 6 * hidden_size)

    def __call__(self, x: Array, c: Array, rope) -> Array:
        mods = self.adaLN(jax.nn.silu(c))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, axis=-1)

        x = x + g_msa[:, None, :] * self.attn(_modulate(self.norm1(x), s_msa, sc_msa), rope)
        x = x + g_mlp[:, None, :] * self.mlp(_modulate(self.norm2(x), s_mlp, sc_mlp))

        return x


class JiT(Module):
    r"""Just image Transformer (reference `jit/_src/model.py:213-379`).

    Arguments mirror the checkpoint factories (`JiT-B/16` etc.); input/output
    are channels-last images.
    """

    def __init__(
        self,
        input_size: int = 256,
        patch_size: int = 16,
        in_channels: int = 3,
        hidden_size: int = 1024,
        depth: int = 24,
        num_heads: int = 16,
        mlp_ratio: float = 4.0,
        num_classes: int = 1000,
        bottleneck_dim: int = 128,
        in_context_len: int = 32,
        in_context_start: int = 8,
        *,
        key: Array,
    ) -> None:
        self.patch_size = patch_size
        self.num_classes = num_classes
        self.in_context_len = in_context_len
        self.in_context_start = in_context_start

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        grid = input_size // patch_size

        # Timestep embedder: sinusoidal(256) + MLP
        self.t_embedder_mlp = [
            _linear(next_key(), 256, hidden_size, std=0.02),
            _linear(next_key(), hidden_size, hidden_size, std=0.02),
        ]

        # Label embedding (one extra row for the unconditional class)
        self.y_embedding = jax.random.normal(next_key(), (num_classes + 1, hidden_size)) * 0.02

        # Bottleneck patch embed (patchify conv -> 1x1 conv)
        proj1 = Conv(
            in_channels,
            bottleneck_dim,
            kernel_size=(patch_size, patch_size),
            stride=(patch_size, patch_size),
            bias=False,
            key=next_key(),
        )
        fan_in = in_channels * patch_size * patch_size
        proj1.weight = _xavier_uniform(next_key(), proj1.weight.shape, fan_in, bottleneck_dim)
        self.proj1 = proj1

        proj2 = Conv(bottleneck_dim, hidden_size, kernel_size=(1, 1), key=next_key())
        proj2.weight = _xavier_uniform(next_key(), proj2.weight.shape, bottleneck_dim, hidden_size)
        proj2.bias = jnp.zeros(hidden_size)
        self.proj2 = proj2

        # Fixed 2D sin-cos positional embedding
        self.pos_embed = jnp.asarray(_sincos_pos_embed(hidden_size, grid))

        # Learned in-context class-token positions
        if in_context_len > 0:
            self.in_context_posemb = (
                jax.random.normal(next_key(), (in_context_len, hidden_size)) * 0.02
            )
        else:
            self.in_context_posemb = None

        # Axial RoPE tables (host precompute)
        head_dim = hidden_size // num_heads
        cos0, sin0 = _axial_rope_tables(head_dim // 2 * 2, grid, 0)
        cos1, sin1 = _axial_rope_tables(head_dim // 2 * 2, grid, in_context_len)
        self.rope = (jnp.asarray(cos0), jnp.asarray(sin0))
        self.rope_incontext = (jnp.asarray(cos1), jnp.asarray(sin1))

        self.blocks = [
            JiTBlock(hidden_size, num_heads, mlp_ratio=mlp_ratio, key=next_key())
            for _ in range(depth)
        ]

        # Final layer: zero-initialized linear + 2-way AdaLN
        self.final_norm = JiTRMSNorm(hidden_size)
        self.final_linear = _zero_linear(next_key(), hidden_size, patch_size * patch_size * in_channels)
        self.final_adaLN = _zero_linear(next_key(), hidden_size, 2 * hidden_size)

    def __call__(self, x: Array, t: Array, y: Array, key: Array | None = None) -> Array:
        r"""
        Arguments:
            x: Input images, channels-last, with shape :math:`(B, H, W, C)`.
            t: Timesteps, with shape :math:`(B,)`.
            y: Class labels, with shape :math:`(B,)`.

        Returns:
            Channels-last images, with shape :math:`(B, H, W, C)`.
        """

        B, H, W, C = x.shape
        p = self.patch_size

        # Conditioning
        t_freq = _timestep_embedding(t, 256).astype(x.dtype)
        t_emb = self.t_embedder_mlp[1](jax.nn.silu(self.t_embedder_mlp[0](t_freq)))
        y_emb = self.y_embedding[y].astype(x.dtype)
        c = t_emb + y_emb

        # Patch embedding + fixed positions
        h = self.proj2(self.proj1(x))
        h = h.reshape(B, -1, h.shape[-1])
        h = h + self.pos_embed.astype(h.dtype)

        for i, block in enumerate(self.blocks):
            if self.in_context_len > 0 and i == self.in_context_start:
                tokens = jnp.broadcast_to(
                    y_emb[:, None, :], (B, self.in_context_len, y_emb.shape[-1])
                )
                tokens = tokens + self.in_context_posemb.astype(h.dtype)
                h = jnp.concatenate([tokens, h], axis=1)

            rope = self.rope if i < self.in_context_start else self.rope_incontext
            h = block(h, c, rope)

        h = h[:, self.in_context_len :]

        # Final layer
        shift, scale = jnp.split(self.final_adaLN(jax.nn.silu(c)), 2, axis=-1)
        h = _modulate(self.final_norm(h), shift, scale)
        h = self.final_linear(h)

        # Unpatchify (channels-last)
        g = H // p
        h = h.reshape(B, g, g, p, p, C)
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5))

        return h.reshape(B, H, W, C)


def _timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    half = dim // 2

    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs

    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


JIT_CONFIGS = {
    "JiT-B/16": dict(depth=12, hidden_size=768, num_heads=12, bottleneck_dim=128, in_context_len=32, in_context_start=4, patch_size=16),  # noqa: C408
    "JiT-B/32": dict(depth=12, hidden_size=768, num_heads=12, bottleneck_dim=128, in_context_len=32, in_context_start=4, patch_size=32),  # noqa: C408
    "JiT-L/16": dict(depth=24, hidden_size=1024, num_heads=16, bottleneck_dim=128, in_context_len=32, in_context_start=8, patch_size=16),  # noqa: C408
    "JiT-L/32": dict(depth=24, hidden_size=1024, num_heads=16, bottleneck_dim=128, in_context_len=32, in_context_start=8, patch_size=32),  # noqa: C408
    "JiT-H/16": dict(depth=32, hidden_size=1280, num_heads=16, bottleneck_dim=256, in_context_len=32, in_context_start=10, patch_size=16),  # noqa: C408
    "JiT-H/32": dict(depth=32, hidden_size=1280, num_heads=16, bottleneck_dim=256, in_context_len=32, in_context_start=10, patch_size=32),  # noqa: C408
}

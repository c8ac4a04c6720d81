r"""Velocity-diffusion (crowsonkb v-diffusion) backbones, TPU-native.

The reference vendors seven hand-unrolled recursive CNNs
(`azula/plugins/vdm/_src/*.py`, ~1430 LoC). Here one **declarative builder**
expresses the whole family: each model is a :class:`VDMSpec` (channel plan,
block counts, attention levels, upsampling mode, time parametrization) and the
recursive structure is generated. Container indices mirror the checkpoints'
`net.*` Sequential paths exactly — parameter-free stages occupy their index as
string opcodes — so weight conversion is a uniform layout transpose.

Channels-last layout throughout.
"""

from __future__ import annotations

__all__ = [
    "VDMSpec",
    "VDMUNet",
    "SPECS",
]

import dataclasses
import jax
import jax.numpy as jnp
import math

from jax import Array

from ...nn.layers import Conv
from ...nn.module import Module
from ...ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VDMSpec:
    r"""Declarative description of a v-diffusion CNN.

    Arguments:
        cs: Channels per resolution level (outermost first).
        blocks: Residual blocks per level (down and up each).
        inner: Residual blocks at the innermost level.
        attn: Levels with self-attention after every block.
        head_dim: Attention head width.
        final_act: Whether the last block keeps its trailing ReLU.
        t_input: Time parametrization fed to the Fourier features
            (`'log_snr'` or `'t'`).
        up: Upsampling mode (`'nearest'` or `'bilinear'`).
        std: Fourier-feature initialization scale.
    """

    cs: tuple
    blocks: int
    inner: int
    attn: tuple
    head_dim: int
    final_act: bool
    t_input: str
    up: str
    std: float
    attn_norm: bool = False  # yfcc models pre-normalize attention inputs


# Structural facts extracted from the reference vendored models
# (`azula/plugins/vdm/_src/{danbooru_128,imagenet_128,wikiart_128,wikiart_256,
# yfcc_1,yfcc_2}.py`).
SPECS = {
    "danbooru_128": VDMSpec(
        cs=(256, 512, 512, 1024, 1024, 2048),
        blocks=2, inner=4, attn=(3, 4, 5), head_dim=128,
        final_act=True, t_input="log_snr", up="nearest", std=0.2,
    ),
    "imagenet_128": VDMSpec(
        cs=(128, 256, 256, 512, 512, 1024),
        blocks=4, inner=8, attn=(3, 4, 5), head_dim=128,
        final_act=False, t_input="log_snr", up="nearest", std=0.2,
    ),
    "wikiart_128": VDMSpec(
        cs=(128, 256, 256, 512, 512, 1024),
        blocks=4, inner=8, attn=(), head_dim=128,
        final_act=True, t_input="log_snr", up="nearest", std=0.2,
    ),
    "wikiart_256": VDMSpec(
        cs=(64, 128, 256, 256, 512, 512, 1024),
        blocks=4, inner=8, attn=(4, 5, 6), head_dim=128,
        final_act=False, t_input="log_snr", up="nearest", std=0.2,
    ),
    "yfcc_1": VDMSpec(
        cs=(128, 128, 256, 256, 512, 512, 1024, 1024),
        blocks=4, inner=8, attn=(5, 6, 7), head_dim=64,
        final_act=False, t_input="t", up="bilinear", std=1.0, attn_norm=True,
    ),
    "yfcc_2": VDMSpec(
        cs=(128, 256, 512, 512, 1024, 1024, 2048, 2048),
        blocks=2, inner=4, attn=(5, 6, 7), head_dim=64,
        final_act=False, t_input="t", up="bilinear", std=1.0, attn_norm=True,
    ),
}


def _conv(cin: int, cout: int, kernel: int, bias: bool = True, *, key: Array) -> Conv:
    pad = kernel // 2
    return Conv(
        cin,
        cout,
        kernel_size=(kernel, kernel),
        padding=((pad, pad), (pad, pad)),
        bias=bias,
        key=key,
    )


def _apply(layer, x: Array, up_mode: str) -> Array:
    if layer == "relu":
        return jax.nn.relu(x)
    elif layer == "identity":
        return x
    elif layer == "down":
        B, H, W, C = x.shape
        return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
    elif layer == "up":
        if up_mode == "nearest":
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            B, H, W, C = x.shape
            return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
    elif isinstance(layer, (VDMResConvBlock, VDMSkipBlock, VDMSelfAttention2d)):
        return layer(x, up_mode)
    else:
        return layer(x)


class FourierFeatures(Module):
    r"""Random Fourier features: :math:`[\cos(2\pi x W^\top), \sin(2\pi x W^\top)]`."""

    def __init__(self, in_features: int, out_features: int, std: float = 1.0, *, key: Array) -> None:
        assert out_features % 2 == 0
        self.weight = jax.random.normal(key, (out_features // 2, in_features)) * std

    def __call__(self, x: Array) -> Array:
        f = 2 * math.pi * x @ self.weight.T.astype(x.dtype)
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class VDMResConvBlock(Module):
    r"""conv-relu-conv-relu residual block with optional 1x1 skip projection."""

    def __init__(self, c_in: int, c_mid: int, c_out: int, is_last: bool = False, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.main = [
            _conv(c_in, c_mid, 3, key=k1),
            "relu",
            _conv(c_mid, c_out, 3, key=k2),
            "identity" if is_last else "relu",
        ]
        self.skip = None if c_in == c_out else _conv(c_in, c_out, 1, bias=False, key=k3)

    def __call__(self, x: Array, up_mode: str) -> Array:
        h = x
        for layer in self.main:
            h = _apply(layer, h, up_mode)

        skip = x if self.skip is None else self.skip(x)

        return h + skip


class VDMSelfAttention2d(Module):
    r"""Spatial self-attention with qkv-major channel grouping
    (reference `vdm/_src/imagenet_128.py:34-50`; the yfcc variant pre-normalizes
    with a single-group GroupNorm, `vdm/_src/yfcc_1.py:52-71`)."""

    def __init__(self, c_in: int, n_head: int, pre_norm: bool = False, *, key: Array) -> None:
        from ...nn.layers import GroupNorm

        k1, k2 = jax.random.split(key)

        self.heads = n_head
        self.norm = GroupNorm(1, c_in, affine=True) if pre_norm else None
        self.qkv_proj = _conv(c_in, 3 * c_in, 1, key=k1)
        self.out_proj = _conv(c_in, c_in, 1, key=k2)

    def __call__(self, x: Array, up_mode: str) -> Array:
        B, H, W, C = x.shape
        heads = self.heads
        ch = C // heads

        h = x if self.norm is None else self.norm(x)
        qkv = self.qkv_proj(h).reshape(B, H * W, 3, heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        q, k, v = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))

        y = dot_product_attention(q, k, v)

        y = jnp.swapaxes(y, 1, 2).reshape(B, H, W, C)

        return x + self.out_proj(y)


class VDMSkipBlock(Module):
    r"""U-Net skip: concatenates the bypass before the processed branch
    (reference `vdm/_src/imagenet_128.py:53-60` — note the skip-first order)."""

    def __init__(self, main: list) -> None:
        self.main = main

    def __call__(self, x: Array, up_mode: str) -> Array:
        h = x
        for layer in self.main:
            h = _apply(layer, h, up_mode)

        return jnp.concatenate([x, h], axis=-1)


class VDMUNet(Module):
    r"""Generic v-diffusion recursive CNN built from a :class:`VDMSpec`.

    The forward contract matches the family: `model(x, t)` where `t` is the
    crowsonkb time in :math:`[0, 1]` (the denoiser's
    :math:`c_\mathrm{time} = \mathrm{atan2}(\sigma, \alpha) \cdot 2 / \pi`).
    """

    def __init__(self, spec: VDMSpec, in_channels: int = 3, out_channels: int = 3, *, key: Array) -> None:
        self.spec = spec

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.timestep_embed = FourierFeatures(1, 16, std=spec.std, key=next_key())

        cs = spec.cs
        last = len(cs) - 1
        n = spec.blocks

        def rcb(cin, cmid, cout, is_last=False):
            return VDMResConvBlock(cin, cmid, cout, is_last=is_last, key=next_key())

        def attn(ch):
            return VDMSelfAttention2d(
                ch, ch // spec.head_dim, pre_norm=spec.attn_norm, key=next_key()
            )

        def content(level):
            seq = []

            if level == last:
                for i in range(spec.inner):
                    cin = cs[level - 1] if i == 0 else cs[level]
                    cout = cs[level - 1] if i == spec.inner - 1 else cs[level]
                    seq.append(rcb(cin, cs[level], cout))
                    if level in spec.attn:
                        seq.append(attn(cout))
                return seq

            # Descent blocks at this resolution
            for i in range(n):
                if level == 0 and i == 0:
                    cin = in_channels + 16
                elif i == 0 and level > 0:
                    cin = cs[level - 1]
                else:
                    cin = cs[level]
                seq.append(rcb(cin, cs[level], cs[level]))
                if level in spec.attn:
                    seq.append(attn(cs[level]))

            # Recurse one level deeper
            seq.append(VDMSkipBlock(["down"] + content(level + 1) + ["up"]))

            # Ascent blocks
            for i in range(n):
                cin = 2 * cs[level] if i == 0 else cs[level]
                if i < n - 1:
                    cout, is_last = cs[level], False
                elif level > 0:
                    cout, is_last = cs[level - 1], False
                else:
                    cout, is_last = out_channels, not spec.final_act
                seq.append(rcb(cin, cs[level], cout, is_last=is_last))
                if level in spec.attn and i < n - 1:
                    seq.append(attn(cout))
                elif level in spec.attn and level > 0:
                    seq.append(attn(cout))

            return seq

        self.net = content(0)

    def __call__(self, x: Array, t: Array, key: Array | None = None) -> Array:
        spec = self.spec

        t = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))

        if spec.t_input == "log_snr":
            # log(alpha^2 / sigma^2) with alpha = cos(t pi/2), sigma = sin(t pi/2)
            half = t.astype(jnp.float32) * (math.pi / 2)
            feat = 2 * (jnp.log(jnp.cos(half)) - jnp.log(jnp.sin(half)))
        else:
            feat = t.astype(jnp.float32)

        emb = self.timestep_embed(feat[:, None]).astype(x.dtype)
        emb = jnp.broadcast_to(
            emb[:, None, None, :], (*x.shape[:-1], emb.shape[-1])
        )

        h = jnp.concatenate([x, emb], axis=-1)

        for layer in self.net:
            h = _apply(layer, h, spec.up)

        return h

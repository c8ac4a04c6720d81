r"""CC12M_1 — the CLIP-conditioned v-diffusion model, TPU-native.

Channels-last JAX reimplementation of the reference vendored architecture
(`azula/plugins/vdm/_src/cc12m_1.py`, 256 LoC): a CLIP-embedding + timestep
mapping MLP produces a conditioning vector that FiLM-modulates every conv
block (the reference threads it through a mutable `state` dict,
`cc12m_1.py:33-42`; here it is passed explicitly). Note this model's SkipBlock
concatenates the processed branch *before* the bypass (`cc12m_1.py:62-69`) —
the opposite order of the other v-diffusion models.

Parameter paths mirror the checkpoint layout for mechanical conversion.
"""

from __future__ import annotations

__all__ = [
    "CC12M1Model",
]

import jax
import jax.numpy as jnp

from jax import Array

from ...nn.layers import Linear
from ...nn.module import Module
from ...ops.norm import group_norm
from .backbone import FourierFeatures, VDMSelfAttention2d, _conv


def _scale_params(module, factor: float):
    from ...utils.pytree import is_array

    def scale(leaf):
        if is_array(leaf) and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return leaf * factor
        return leaf

    return jax.tree.map(scale, module)


class CC12MResLinearBlock(Module):
    r"""Linear-ReLU-Linear residual block (reference `cc12m_1.py:19-30`)."""

    def __init__(self, f_in: int, f_mid: int, f_out: int, is_last: bool = False, *, key: Array) -> None:
        k1, k2, k3 = jax.random.split(key, 3)

        self.main = [
            Linear(f_in, f_mid, key=k1),
            "relu",
            Linear(f_mid, f_out, key=k2),
            "identity" if is_last else "relu",
        ]
        self.skip = None if f_in == f_out else Linear(f_in, f_out, bias=False, key=k3)

    def __call__(self, x: Array) -> Array:
        h = x
        for layer in self.main:
            if layer == "relu":
                h = jax.nn.relu(h)
            elif layer == "identity":
                pass
            else:
                h = layer(h)

        return h + (x if self.skip is None else self.skip(x))


class CC12MModulation(Module):
    r"""FiLM modulation from the conditioning vector (reference `cc12m_1.py:33-42`)."""

    def __init__(self, feats_in: int, c_out: int, *, key: Array) -> None:
        self.layer = Linear(feats_in, 2 * c_out, bias=False, key=key)

    def __call__(self, x: Array, cond: Array) -> Array:
        scales, shifts = jnp.split(self.layer(cond), 2, axis=-1)

        return shifts[:, None, None, :] + x * (scales[:, None, None, :] + 1)


class CC12MModConvBlock(Module):
    r"""conv-GN-FiLM-relu-conv-GN-FiLM-relu residual block
    (reference `cc12m_1.py:45-59`)."""

    def __init__(
        self, feats_in: int, c_in: int, c_mid: int, c_out: int, is_last: bool = False, *, key: Array
    ) -> None:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)

        self.main = [
            _conv(c_in, c_mid, 3, key=k1),
            "gn1",
            CC12MModulation(feats_in, c_mid, key=k2),
            "relu",
            _conv(c_mid, c_out, 3, key=k3),
            "identity" if is_last else "gn1",
            "identity" if is_last else CC12MModulation(feats_in, c_out, key=k4),
            "identity" if is_last else "relu",
        ]
        self.skip = None if c_in == c_out else _conv(c_in, c_out, 1, bias=False, key=k5)

    def __call__(self, x: Array, cond: Array) -> Array:
        h = x
        for layer in self.main:
            if layer == "relu":
                h = jax.nn.relu(h)
            elif layer == "gn1":
                h = group_norm(h, 1)
            elif layer == "identity":
                pass
            elif isinstance(layer, CC12MModulation):
                h = layer(h, cond)
            else:
                h = layer(h)

        return h + (x if self.skip is None else self.skip(x))


class CC12MSkipBlock(Module):
    r"""U-Net skip that concatenates the processed branch FIRST
    (reference `cc12m_1.py:62-69`)."""

    def __init__(self, main: list) -> None:
        self.main = main

    def __call__(self, x: Array, cond: Array) -> Array:
        h = x
        for layer in self.main:
            h = _apply_cc(layer, h, cond)

        return jnp.concatenate([h, x], axis=-1)


def _apply_cc(layer, x: Array, cond: Array) -> Array:
    if layer == "down":
        B, H, W, C = x.shape
        return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
    elif layer == "up":
        B, H, W, C = x.shape
        return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
    elif isinstance(layer, (CC12MModConvBlock, CC12MSkipBlock)):
        return layer(x, cond)
    elif isinstance(layer, VDMSelfAttention2d):
        return layer(x, "bilinear")
    else:
        return layer(x)


class CC12M1Model(Module):
    r"""The CLIP-conditioned 256x256 v-diffusion model
    (reference `cc12m_1.py:110-256`)."""

    def __init__(self, *, key: Array) -> None:
        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        c = 128
        cs = (c, 2 * c, 2 * c, 4 * c, 4 * c, 8 * c, 8 * c)
        n = 4
        inner = 8
        attn = (4, 5, 6)
        feats = 1024

        self.mapping_timestep_embed = FourierFeatures(1, 128, key=next_key())
        self.mapping = [
            CC12MResLinearBlock(512 + 128, 1024, 1024, key=next_key()),
            CC12MResLinearBlock(1024, 1024, 1024, is_last=True, key=next_key()),
        ]
        self.mapping = [_scale_params(m, 0.5**0.5) for m in self.mapping]

        self.timestep_embed = FourierFeatures(1, 16, key=next_key())

        def block(c_in, c_mid, c_out, is_last=False):
            return CC12MModConvBlock(feats, c_in, c_mid, c_out, is_last=is_last, key=next_key())

        def attn_block(ch):
            return VDMSelfAttention2d(ch, ch // 64, pre_norm=True, key=next_key())

        last = len(cs) - 1

        def content(level):
            seq = []

            if level == last:
                for i in range(inner):
                    cin = cs[level - 1] if i == 0 else cs[level]
                    cout = cs[level - 1] if i == inner - 1 else cs[level]
                    seq.append(block(cin, cs[level], cout))
                    if level in attn:
                        seq.append(attn_block(cout))
                return seq

            for i in range(n):
                cin = (3 + 16) if (level == 0 and i == 0) else cs[level - 1] if i == 0 else cs[level]
                seq.append(block(cin, cs[level], cs[level]))
                if level in attn:
                    seq.append(attn_block(cs[level]))

            seq.append(CC12MSkipBlock(["down"] + content(level + 1) + ["up"]))

            for i in range(n):
                cin = 2 * cs[level] if i == 0 else cs[level]
                if i < n - 1:
                    cout, is_last = cs[level], False
                elif level > 0:
                    cout, is_last = cs[level - 1], False
                else:
                    cout, is_last = 3, True
                seq.append(block(cin, cs[level], cout, is_last=is_last))
                if level in attn:
                    seq.append(attn_block(cout))

            return seq

        self.net = [_scale_params(layer, 0.5**0.5) for layer in content(0)]

    def __call__(self, x: Array, t: Array, clip_embed: Array, key: Array | None = None) -> Array:
        t = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))

        clip_embed = clip_embed / jnp.linalg.norm(clip_embed, axis=-1, keepdims=True)
        clip_embed = clip_embed * clip_embed.shape[-1] ** 0.5

        t_map = self.mapping_timestep_embed(t[:, None].astype(jnp.float32)).astype(x.dtype)
        cond = jnp.concatenate([clip_embed.astype(x.dtype), t_map], axis=-1)
        for layer in self.mapping:
            cond = layer(cond)

        emb = self.timestep_embed(t[:, None].astype(jnp.float32)).astype(x.dtype)
        emb = jnp.broadcast_to(emb[:, None, None, :], (*x.shape[:-1], emb.shape[-1]))

        h = jnp.concatenate([x, emb], axis=-1)

        for layer in self.net:
            h = _apply_cc(layer, h, cond)

        return h

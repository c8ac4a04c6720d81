r"""Diffusion Transformer (DiT) building blocks.

Capability parity with the reference `azula/nn/dit.py` (218 LoC): RMSNorm
AdaLN-Zero blocks where MSA and FFN live *inside one gated residual*
(`dit.py:102-112`), sinusoidal embedding of arbitrary position coordinates, and
selectable FFN activations.

References:
    | Scalable Diffusion Models with Transformers (Peebles et al., 2022)
    | https://arxiv.org/abs/2212.09748
"""

from __future__ import annotations

__all__ = [
    "DiT",
    "DiTBlock",
]

import jax
import jax.numpy as jnp

from jax import Array
from typing import Literal

from .attention import MultiheadSelfAttention
from .layers import Dropout, Linear, RMSNorm, SineEncoding, relu2, swiglu
from .module import Module

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu2": relu2,
    "silu": jax.nn.silu,
    "swiglu": swiglu,
}


class DiTAdaZero(Module):
    r"""AdaLN-Zero modulation head for token sequences
    (reference `azula/nn/dit.py:57-68`)."""

    def __init__(self, mod_features: int, channels: int, *, key: Array) -> None:
        if mod_features > 0:
            k1, k2 = jax.random.split(key)
            self.lin1 = Linear(mod_features, mod_features, key=k1)
            self.lin2 = Linear(mod_features, 3 * channels, key=k2)
            self.lin2.weight = self.lin2.weight * 1e-2
            self.param = None
        else:
            self.lin1 = None
            self.lin2 = None
            self.param = jax.random.normal(key, (3, channels)) * 1e-2

    def __call__(self, mod: Array | None) -> tuple[Array, Array, Array]:
        if self.param is not None:
            a, b, c = self.param
        else:
            h = jax.nn.silu(self.lin1(mod))
            h = self.lin2(h)
            abc = h.reshape(*h.shape[:-1], 3, -1)
            abc = jnp.moveaxis(abc, -2, 0)
            # Broadcast over the token axis
            a, b, c = abc[..., None, :]

        return a, b, c


class DiTBlock(Module):
    r"""Creates a modulated DiT block.

    .. math::
        y &= (a + 1) \, \mathrm{norm}(x) + b \\
        y &= y + \mathrm{MSA}(y) \\
        y &= \mathrm{FFN}(y) \\
        \mathrm{out} &= x + c \cdot y

    Reference: `azula/nn/dit.py:24-134`.

    Arguments:
        channels: The number of channels :math:`C`.
        mod_features: The number of modulating features :math:`D`.
        ffn_factor: The channel factor in the FFN.
        ffn_activation: The FFN activation: `'relu'`, `'relu2'`, `'silu'` or `'swiglu'`.
        dropout: The dropout rate in :math:`[0, 1]`.
        checkpointing: Whether to use activation rematerialization.
        key: A PRNG key for parameter initialization.
        kwargs: Keyword arguments passed to :class:`MultiheadSelfAttention`.
    """

    def __init__(
        self,
        channels: int,
        mod_features: int = 0,
        ffn_factor: int = 4,
        ffn_activation: Literal["relu", "relu2", "silu", "swiglu"] = "silu",
        dropout: float | None = None,
        checkpointing: bool = False,
        *,
        key: Array,
        **kwargs,
    ) -> None:
        ada_key, msa_key, ffn1_key, ffn2_key = jax.random.split(key, 4)

        self.checkpointing = checkpointing

        self.norm = RMSNorm(dim=-1, eps=1e-5)
        self.ada_zero = DiTAdaZero(mod_features, channels, key=ada_key)

        self.msa = MultiheadSelfAttention(channels, dropout=dropout, key=msa_key, **kwargs)

        if ffn_activation not in _ACTIVATIONS:
            raise NotImplementedError(f"Unknown activation '{ffn_activation}'.")

        # Stored by name (a string static leaf) so modules stay valid jit arguments
        self.ffn_activation = ffn_activation
        activation_factor = 2 if ffn_activation == "swiglu" else 1

        self.ffn1 = Linear(channels, ffn_factor * channels, key=ffn1_key)
        self.ffn2 = Linear(ffn_factor * channels // activation_factor, channels, key=ffn2_key)
        self.drop = None if dropout is None else Dropout(dropout)

    def _forward(
        self,
        x: Array,
        mod: Array | None = None,
        pos: Array | None = None,
        mask: Array | None = None,
        key: Array | None = None,
    ) -> Array:
        msa_key, ffn_key = (None, None) if key is None else jax.random.split(key)

        a, b, c = self.ada_zero(mod)

        y = (a + 1) * self.norm(x) + b
        y = y + self.msa(y, pos, mask, key=msa_key)
        y = self.ffn1(y)
        y = _ACTIVATIONS[self.ffn_activation](y)
        if self.drop is not None:
            y = self.drop(y, ffn_key)
        y = self.ffn2(y)
        y = x + c * y

        return y

    def __call__(
        self,
        x: Array,
        mod: Array | None = None,
        pos: Array | None = None,
        mask: Array | None = None,
        key: Array | None = None,
    ) -> Array:
        r"""
        Arguments:
            x: The input tokens :math:`x`, with shape :math:`(*, L, C)`.
            mod: The modulation vector, with shape :math:`(D)` or :math:`(*, D)`.
            pos: The position coordinates, with shape :math:`(*, L, N)`.
            mask: The attention mask, with shape :math:`(*, L, L)`.
            key: A PRNG key; enables dropout (training).

        Returns:
            The output tokens :math:`y`, with shape :math:`(*, L, C)`.
        """

        if self.checkpointing:
            return jax.checkpoint(self._forward)(x, mod, pos, mask, key)
        else:
            return self._forward(x, mod, pos, mask, key)


class DiT(Module):
    r"""Creates a modulated DiT-like module.

    Reference: `azula/nn/dit.py:137-218`.

    Arguments:
        in_channels: The number of input channels :math:`C_i`.
        out_channels: The number of output channels :math:`C_o`.
        cond_channels: The number of condition channels :math:`C_c`.
        mod_features: The number of modulating features :math:`D`.
        pos_channels: The number of positional channels :math:`P`.
        hid_channels: The number of hidden token channels :math:`C_h`.
        hid_blocks: The number of hidden transformer blocks.
        key: A PRNG key for parameter initialization.
        kwargs: Keyword arguments passed to :class:`DiTBlock`.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        cond_channels: int = 0,
        mod_features: int = 0,
        pos_channels: int = 1,
        hid_channels: int = 1024,
        hid_blocks: int = 3,
        *,
        key: Array,
        **kwargs,
    ) -> None:
        in_key, out_key, pos_key, *block_keys = jax.random.split(key, 3 + hid_blocks)

        self.in_proj = Linear(in_channels + cond_channels, hid_channels, key=in_key)
        self.out_proj = Linear(hid_channels, out_channels, key=out_key)

        self.pos_encoding = SineEncoding(hid_channels, omega=1e2)
        self.pos_proj = Linear(pos_channels * hid_channels, hid_channels, bias=False, key=pos_key)
        self.pos_proj.weight = self.pos_proj.weight * 1e-2

        self.blocks = [
            DiTBlock(
                channels=hid_channels,
                pos_channels=pos_channels,
                mod_features=mod_features,
                key=bk,
                **kwargs,
            )
            for bk in block_keys
        ]

    def __call__(
        self,
        x: Array,
        mod: Array | None = None,
        pos: Array | None = None,
        cond: Array | None = None,
        key: Array | None = None,
    ) -> Array:
        r"""
        Arguments:
            x: The input tensor, with shape :math:`(*, L, C_i)`.
            mod: The modulation vector, with shape :math:`(D)` or :math:`(*, D)`.
            pos: The position tensor, with shape :math:`(*, L, P)`.
                If :py:`None`, use the sequence indices instead.
            cond: The condition tensor, with shape :math:`(*, L, C_c)`.
            key: A PRNG key; enables dropout (training).

        Returns:
            The output tensor, with shape :math:`(*, L, C_o)`.
        """

        if cond is not None:
            x = jnp.concatenate((x, cond), axis=-1)

        x = self.in_proj(x)

        if pos is None:
            pos = jnp.arange(x.shape[-2], dtype=x.dtype)[..., None]

        emb = self.pos_encoding(pos)
        emb = emb.reshape(*emb.shape[:-2], -1)
        x = x + self.pos_proj(emb)

        for block in self.blocks:
            key, sub = (None, None) if key is None else jax.random.split(key)
            x = block(x, mod, pos=pos, key=sub)

        x = self.out_proj(x)

        return x

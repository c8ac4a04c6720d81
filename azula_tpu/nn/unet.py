r"""U-Net building blocks.

Capability parity with the reference `azula/nn/unet.py` (259 LoC): AdaLN-Zero
modulated blocks, strided-conv downsampling, nearest upsampling, skip concat with
shape-narrowing for odd sizes, N-dimensional (spatial = 1/2/3), periodic padding
option — in channels-last layout :math:`(B, L_1, ..., L_N, C)`.
"""

from __future__ import annotations

__all__ = [
    "UNet",
    "UNetBlock",
]

import jax
import jax.numpy as jnp

from collections.abc import Sequence
from jax import Array

from .layers import ConvNd, Dropout, GroupNorm, LayerNorm, Linear, RMSNorm, Upsample
from .module import Module


class AdaZero(Module):
    r"""AdaLN-Zero modulation head: maps a modulation vector to per-channel
    :math:`(a, b, c)` triples, with the final projection scaled by
    :math:`10^{-2}` (reference `azula/nn/unet.py:64-75`).

    When :py:`mod_features == 0`, falls back to a learned parameter triple.
    """

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

    def __call__(self, mod: Array | None, spatial: int) -> tuple[Array, Array, Array]:
        if self.param is not None:
            abc = self.param
        else:
            h = jax.nn.silu(self.lin1(mod))
            h = self.lin2(h)
            abc = h.reshape(*h.shape[:-1], 3, -1)
            abc = jnp.moveaxis(abc, -2, 0)

        # Insert spatial singleton axes before the channel axis (channels-last)
        a, b, c = abc
        for _ in range(spatial):
            a, b, c = a[..., None, :], b[..., None, :], c[..., None, :]

        return a, b, c


class UNetBlock(Module):
    r"""Creates a modulated U-Net block.

    :math:`y = x + c \cdot \mathrm{FFN}\big((a + 1) \, \mathrm{norm}(x) + b\big)`
    where :math:`(a, b, c)` come from the AdaLN-Zero head and the FFN is two
    convolutions around a SiLU (reference `azula/nn/unet.py:18-114`).

    Arguments:
        channels: The number of channels :math:`C`.
        mod_features: The number of modulating features :math:`D`.
        norm: The kind of normalization: `'layer'`, `'rms'` or `'group'`.
        groups: The number of groups for group normalization.
        ffn_factor: The channel factor in the FFN.
        spatial: The number of spatial dimensions :math:`N`.
        dropout: The dropout rate in :math:`[0, 1]`.
        checkpointing: Whether to use activation rematerialization
            (:func:`jax.checkpoint`, replacing the reference's custom reentrant
            autograd checkpoint `azula/nn/utils.py:74-169`).
        key: A PRNG key for parameter initialization.
        kwargs: Keyword arguments passed to :func:`azula_tpu.nn.layers.ConvNd`.
    """

    def __init__(
        self,
        channels: int,
        mod_features: int = 0,
        norm: str = "layer",
        groups: int = 16,
        ffn_factor: int = 1,
        spatial: int = 2,
        dropout: float | None = None,
        checkpointing: bool = False,
        *,
        key: Array,
        **kwargs,
    ) -> None:
        ada_key, conv1_key, conv2_key = jax.random.split(key, 3)

        self.checkpointing = checkpointing
        self.spatial = spatial

        if norm == "layer":
            self.norm = LayerNorm(dim=-1, eps=1e-5)
        elif norm == "rms":
            self.norm = RMSNorm(dim=-1, eps=1e-5)
        elif norm == "group":
            self.norm = GroupNorm(groups, channels, eps=1e-5, affine=False)
        else:
            raise NotImplementedError(f"unknown norm '{norm}'")

        self.ada_zero = AdaZero(mod_features, channels, key=ada_key)

        self.conv1 = ConvNd(channels, ffn_factor * channels, spatial=spatial, key=conv1_key, **kwargs)
        self.conv2 = ConvNd(ffn_factor * channels, channels, spatial=spatial, key=conv2_key, **kwargs)
        self.drop = None if dropout is None else Dropout(dropout)

    def _forward(
        self, x: Array, mod: Array | None = None, key: Array | None = None
    ) -> Array:
        a, b, c = self.ada_zero(mod, self.spatial)

        y = (a + 1) * self.norm(x) + b
        y = self.conv1(y)
        y = jax.nn.silu(y)
        if self.drop is not None:
            y = self.drop(y, key)
        y = self.conv2(y)
        y = x + c * y

        return y

    def __call__(
        self, x: Array, mod: Array | None = None, key: Array | None = None
    ) -> Array:
        r"""
        Arguments:
            x: The input tensor, with shape :math:`(B, L_1, ..., L_N, C)`.
            mod: The modulation vector, with shape :math:`(D)` or :math:`(B, D)`.
            key: A PRNG key; enables dropout (training).

        Returns:
            The output tensor, with shape :math:`(B, L_1, ..., L_N, C)`.
        """

        if self.checkpointing:
            return jax.checkpoint(self._forward)(x, mod, key)
        else:
            return self._forward(x, mod, key)


class UNet(Module):
    r"""Creates a modulated U-Net.

    Reference: `azula/nn/unet.py:117-259`. Channels-last layout.

    Arguments:
        in_channels: The number of input channels :math:`C_i`.
        out_channels: The number of output channels :math:`C_o`.
        cond_channels: The number of condition channels :math:`C_c`.
        hid_channels: The numbers of channels at each depth.
        hid_blocks: The numbers of hidden blocks at each depth.
        kernel_size: The kernel size of all convolutions.
        stride: The stride of the downsampling convolutions.
        spatial: The number of spatial dimensions :math:`N`.
        periodic: Whether the spatial dimensions are periodic.
        identity_init: Initialize down/upsampling convolutions as identity.
        key: A PRNG key for parameter initialization.
        kwargs: Keyword arguments passed to :class:`UNetBlock`.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        cond_channels: int = 0,
        hid_channels: Sequence[int] = (64, 128, 256),
        hid_blocks: Sequence[int] = (3, 3, 3),
        kernel_size: int | Sequence[int] = 3,
        stride: int | Sequence[int] = 2,
        spatial: int = 2,
        periodic: bool = False,
        identity_init: bool = False,
        *,
        key: Array,
        **kwargs,
    ) -> None:
        assert len(hid_blocks) == len(hid_channels)

        if isinstance(kernel_size, int):
            kernel_size = [kernel_size] * spatial

        if isinstance(stride, int):
            stride = [stride] * spatial

        conv_kwargs = dict(  # noqa: C408
            kernel_size=tuple(kernel_size),
            padding=tuple((k // 2, k // 2) for k in kernel_size),
            periodic=periodic,
            spatial=spatial,
        )

        self.descent, self.ascent = [], []

        for i, num_blocks in enumerate(hid_blocks):
            do, up = [], []

            for _ in range(num_blocks):
                key, k1, k2 = jax.random.split(key, 3)
                do.append(UNetBlock(hid_channels[i], key=k1, **conv_kwargs, **kwargs))
                up.append(UNetBlock(hid_channels[i], key=k2, **conv_kwargs, **kwargs))

            if i > 0:
                key, k1 = jax.random.split(key)
                do.insert(
                    0,
                    ConvNd(
                        hid_channels[i - 1],
                        hid_channels[i],
                        stride=tuple(stride),
                        identity_init=identity_init,
                        key=k1,
                        **conv_kwargs,
                    ),
                )

                up.append(Upsample(factor=tuple(stride)))
            else:
                key, k1, k2 = jax.random.split(key, 3)
                do.insert(
                    0,
                    ConvNd(
                        in_channels + cond_channels,
                        hid_channels[i],
                        key=k1,
                        **conv_kwargs,
                    ),
                )
                up.append(ConvNd(hid_channels[i], out_channels, key=k2, **conv_kwargs))

            if i + 1 < len(hid_blocks):
                key, k1 = jax.random.split(key)
                up.insert(
                    0,
                    ConvNd(
                        hid_channels[i] + hid_channels[i + 1],
                        hid_channels[i],
                        identity_init=identity_init,
                        key=k1,
                        **conv_kwargs,
                    ),
                )

            self.descent.append(do)
            self.ascent.insert(0, up)

    def __call__(
        self,
        x: Array,
        mod: Array | None = None,
        cond: Array | None = None,
        key: Array | None = None,
    ) -> Array:
        r"""
        Arguments:
            x: The input tensor, with shape :math:`(B, L_1, ..., L_N, C_i)`.
            mod: The modulation vector, with shape :math:`(D)` or :math:`(B, D)`.
            cond: The condition tensor, with shape :math:`(B, L_1, ..., L_N, C_c)`.
            key: A PRNG key; enables dropout (training).

        Returns:
            The output tensor, with shape :math:`(B, L_1, ..., L_N, C_o)`.
        """

        if cond is not None:
            x = jnp.concatenate((x, cond), axis=-1)

        memory = []

        for blocks in self.descent:
            if memory:
                memory.append(x)
            else:
                memory.append(None)

            for block in blocks:
                if isinstance(block, UNetBlock):
                    key, sub = _split_opt(key)
                    x = block(x, mod, key=sub)
                else:
                    x = block(x)

        for blocks in self.ascent:
            for block in blocks:
                if isinstance(block, UNetBlock):
                    key, sub = _split_opt(key)
                    x = block(x, mod, key=sub)
                else:
                    x = block(x)

            y = memory.pop()

            if y is None:
                continue

            # Narrow to the skip's spatial shape (odd sizes after up/down round trips)
            for i in range(1, x.ndim - 1):
                if x.shape[i] > y.shape[i]:
                    x = jax.lax.slice_in_dim(x, 0, y.shape[i], axis=i)

            x = jnp.concatenate((y, x), axis=-1)

        return x


def _split_opt(key: Array | None) -> tuple[Array | None, Array | None]:
    if key is None:
        return None, None
    else:
        k1, k2 = jax.random.split(key)
        return k1, k2

r"""Vision Transformer (ViT) building blocks.

Capability parity with the reference `azula/nn/vit.py` (108 LoC): patchify to
tokens, cartesian-product integer coordinates as positions, unpatchify — in
channels-last layout.

References:
    | An Image is Worth 16x16 Words (Dosovitskiy et al., 2021)
    | https://arxiv.org/abs/2010.11929
"""

from __future__ import annotations

__all__ = [
    "ViT",
]

import jax.numpy as jnp
import math

from collections.abc import Sequence
from jax import Array

from .dit import DiT
from .layers import Patchify, Unpatchify


class ViT(DiT):
    r"""Creates a modulated ViT-like module.

    Reference: `azula/nn/vit.py:22-108`.

    Arguments:
        in_channels: The number of input channels :math:`C_i`.
        out_channels: The number of output channels :math:`C_o`.
        cond_channels: The number of condition channels :math:`C_c`.
        mod_features: The number of modulating features :math:`D`.
        hid_channels: The number of hidden token channels.
        hid_blocks: The number of hidden transformer blocks.
        spatial: The number of spatial dimensions :math:`N`.
        patch_size: The patch size or shape.
        unpatch_size: The unpatch size or shape.
        key: A PRNG key for parameter initialization.
        kwargs: Keyword arguments passed to :class:`~azula_tpu.nn.dit.DiTBlock`.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        cond_channels: int = 0,
        mod_features: int = 0,
        hid_channels: int = 1024,
        hid_blocks: int = 3,
        spatial: int = 2,
        patch_size: int | Sequence[int] = 1,
        unpatch_size: int | Sequence[int] | None = None,
        *,
        key: Array,
        **kwargs,
    ) -> None:
        if isinstance(patch_size, int):
            patch_size = [patch_size] * spatial

        if unpatch_size is None:
            unpatch_size = patch_size
        elif isinstance(unpatch_size, int):
            unpatch_size = [unpatch_size] * spatial

        assert len(patch_size) == len(unpatch_size) == spatial

        super().__init__(
            in_channels=math.prod(patch_size) * in_channels,
            out_channels=math.prod(unpatch_size) * out_channels,
            cond_channels=math.prod(patch_size) * cond_channels,
            mod_features=mod_features,
            pos_channels=spatial,
            hid_channels=hid_channels,
            hid_blocks=hid_blocks,
            key=key,
            **kwargs,
        )

        self.patch = Patchify(patch_size)
        self.unpatch = Unpatchify(unpatch_size)
        self.spatial = spatial

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

        x = self.patch(x)

        if cond is not None:
            cond = self.patch(cond)

        shape = x.shape[1:-1]

        # Cartesian-product integer coordinates (reference `vit.py:97-103`)
        grids = jnp.meshgrid(
            *(jnp.arange(size, dtype=x.dtype) for size in shape), indexing="ij"
        )
        pos = jnp.stack(grids, axis=-1).reshape(-1, len(shape))

        x = x.reshape(x.shape[0], -1, x.shape[-1])
        if cond is not None:
            cond = cond.reshape(cond.shape[0], -1, cond.shape[-1])

        y = DiT.__call__(self, x, mod, pos=pos, cond=cond, key=key)
        y = y.reshape(y.shape[0], *shape, y.shape[-1])
        y = self.unpatch(y)

        return y

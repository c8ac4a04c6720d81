r"""Common layers.

Capability parity with the reference `azula/nn/layers.py` (299 LoC), in
channels-last (TPU-native) layout: tensors are :math:`(B, L_1, ..., L_N, C)`,
so convolutions run in XLA's preferred NHWC form and elementwise chains fuse
without layout transposes.
"""

from __future__ import annotations

__all__ = [
    "ConvNd",
    "Conv",
    "Dropout",
    "GroupNorm",
    "Identity",
    "LayerNorm",
    "Linear",
    "Patchify",
    "ReLU2",
    "RMSNorm",
    "SineEncoding",
    "SwiGLU",
    "Unpatchify",
    "Upsample",
]

import jax
import jax.numpy as jnp
import math

from collections.abc import Sequence
from jax import Array

from ..ops.norm import group_norm
from .module import Module
from .utils import promote_dtype


class Identity(Module):
    r"""Identity layer."""

    def __init__(self) -> None:
        pass

    def __call__(self, x: Array, *args, **kwargs) -> Array:
        return x


class Linear(Module):
    r"""Affine layer :math:`y = W x + b`.

    The weight is stored as :math:`(C_i, C_o)` so the forward matmul maps
    directly onto the MXU without a transpose.
    """

    def __init__(
        self, in_features: int, out_features: int, bias: bool = True, *, key: Array
    ) -> None:
        wkey, bkey = jax.random.split(key)
        bound = 1 / math.sqrt(in_features)

        self.weight = jax.random.uniform(
            wkey, (in_features, out_features), minval=-bound, maxval=bound
        )

        if bias:
            self.bias = jax.random.uniform(
                bkey, (out_features,), minval=-bound, maxval=bound
            )
        else:
            self.bias = None

    def __call__(self, x: Array) -> Array:
        y = x @ self.weight.astype(x.dtype)

        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)

        return y


class Conv(Module):
    r"""N-dimensional convolution in channels-last layout.

    The kernel is stored in XLA's native :math:`(*K, C_i, C_o)` (HWIO) layout.

    Arguments:
        in_channels: The number of input channels :math:`C_i`.
        out_channels: The number of output channels :math:`C_o`.
        kernel_size: The kernel shape, one entry per spatial dimension.
        stride: The stride, one entry per spatial dimension.
        padding: `(lo, hi)` padding per spatial dimension.
        periodic: Whether padding wraps around (circular) or zero-fills.
        bias: Whether to add a bias or not.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Sequence[int],
        stride: Sequence[int] | None = None,
        padding: Sequence[tuple[int, int]] | None = None,
        periodic: bool = False,
        bias: bool = True,
        *,
        key: Array,
    ) -> None:
        kernel_size = tuple(kernel_size)
        spatial = len(kernel_size)

        wkey, bkey = jax.random.split(key)
        fan_in = in_channels * math.prod(kernel_size)
        bound = 1 / math.sqrt(fan_in)

        self.weight = jax.random.uniform(
            wkey,
            (*kernel_size, in_channels, out_channels),
            minval=-bound,
            maxval=bound,
        )

        if bias:
            self.bias = jax.random.uniform(
                bkey, (out_channels,), minval=-bound, maxval=bound
            )
        else:
            self.bias = None

        self.stride = tuple(stride) if stride is not None else (1,) * spatial
        self.padding = (
            tuple(padding) if padding is not None else ((0, 0),) * spatial
        )
        self.periodic = periodic

    def identity_init_(self) -> None:
        r"""Re-initializes the convolution as a (pseudo-)identity.

        Reference behavior: `azula/nn/layers.py:56-66` — the first :math:`C_i`
        output filters are scaled by :math:`10^{-2}` and a center-tap identity
        is added.
        """

        *kernel_size, in_channels, out_channels = self.weight.shape
        center = tuple(k // 2 for k in kernel_size)

        w = self.weight
        w = w.at[..., :, :in_channels].multiply(1e-2)

        for i in range(min(in_channels, out_channels)):
            w = w.at[(*center, i, i)].add(1.0)

        self.weight = w

    def __call__(self, x: Array) -> Array:
        spatial = len(self.stride)

        if self.periodic:
            pad_width = [(0, 0)] + list(self.padding) + [(0, 0)]
            x = jnp.pad(x, pad_width, mode="wrap")
            padding = "VALID"
        else:
            padding = list(self.padding)

        chars = "XYZ"[:spatial]
        dn = jax.lax.conv_dimension_numbers(
            x.shape,
            self.weight.shape,
            (f"N{chars}C", f"{chars}IO", f"N{chars}C"),
        )

        y = jax.lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=self.stride,
            padding=padding,
            dimension_numbers=dn,
        )

        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)

        return y


def ConvNd(
    in_channels: int,
    out_channels: int,
    spatial: int = 2,
    identity_init: bool = False,
    kernel_size: int | Sequence[int] = 1,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[tuple[int, int]] | None = None,
    periodic: bool = False,
    bias: bool = True,
    *,
    key: Array,
) -> Module:
    r"""Returns an N-dimensional convolutional layer (a :class:`Linear` when
    :py:`spatial == 0`).

    Reference: `azula/nn/layers.py:25-68`.

    Arguments:
        in_channels: The number of input channels :math:`C_i`.
        out_channels: The number of output channels :math:`C_o`.
        spatial: The number of spatial dimensions :math:`N`.
        identity_init: Initialize the convolution as a (pseudo-)identity.
        key: A PRNG key for parameter initialization.
    """

    if spatial == 0:
        return Linear(in_channels, out_channels, bias=bias, key=key)

    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * spatial

    if isinstance(stride, int):
        stride = (stride,) * spatial

    if padding is None:
        padding = ((0, 0),) * spatial
    elif isinstance(padding, int):
        padding = ((padding, padding),) * spatial

    conv = Conv(
        in_channels,
        out_channels,
        kernel_size=kernel_size,
        stride=stride,
        padding=padding,
        periodic=periodic,
        bias=bias,
        key=key,
    )

    if identity_init:
        conv.identity_init_()

    return conv


class ReLU2(Module):
    r"""ReLU² activation: :math:`y = \max(x, 0)^2` (reference `layers.py:71-86`)."""

    def __init__(self) -> None:
        pass

    def __call__(self, x: Array) -> Array:
        return relu2(x)


def relu2(x: Array, /) -> Array:
    return jnp.square(jax.nn.relu(x))


class SwiGLU(Module):
    r"""SwiGLU activation: :math:`y = x_1 \times x_2 \, \sigma(x_2)` over
    interleaved channel pairs (reference `layers.py:89-114`)."""

    def __init__(self) -> None:
        pass

    def __call__(self, x: Array) -> Array:
        return swiglu(x)


def swiglu(x: Array, /) -> Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]

    return x1 * jax.nn.silu(x2)


class LayerNorm(Module):
    r"""Parameter-free layer normalization over arbitrary dimension(s), computed
    in float32 (reference `layers.py:117-155`)."""

    def __init__(self, dim: int | Sequence[int] = -1, eps: float = 1e-5) -> None:
        self.dim = dim if isinstance(dim, int) else tuple(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        return layer_norm(x, dim=self.dim, eps=self.eps)


@promote_dtype
def layer_norm(x: Array, /, dim: int | Sequence[int] = -1, eps: float = 1e-5) -> Array:
    m = jnp.mean(x, axis=dim, keepdims=True)
    v = jnp.var(x, axis=dim, keepdims=True)

    return (x - m) * jax.lax.rsqrt(v + eps)


class RMSNorm(Module):
    r"""Parameter-free RMS normalization over arbitrary dimension(s), computed in
    float32 (reference `layers.py:158-195`)."""

    def __init__(self, dim: int | Sequence[int] = -1, eps: float = 1e-5) -> None:
        self.dim = dim if isinstance(dim, int) else tuple(dim)
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        return rms_norm(x, dim=self.dim, eps=self.eps)


@promote_dtype
def rms_norm(x: Array, /, dim: int | Sequence[int] = -1, eps: float = 1e-5) -> Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=dim, keepdims=True) + eps)


class GroupNorm(Module):
    r"""Channels-last group normalization (float32 statistics).

    Equivalent of `torch.nn.GroupNorm` (used at `azula/nn/unet.py:55-60` and in
    the ADM backbone). Parameter-free when :py:`affine=False`.
    """

    def __init__(
        self,
        groups: int,
        channels: int,
        eps: float = 1e-5,
        affine: bool = False,
    ) -> None:
        self.groups = min(groups, channels)
        self.eps = eps

        if affine:
            self.scale = jnp.ones(channels)
            self.bias = jnp.zeros(channels)
        else:
            self.scale = None
            self.bias = None

    def __call__(self, x: Array) -> Array:
        return group_norm(
            x, self.groups, eps=self.eps, scale=self.scale, bias=self.bias
        )


class Patchify(Module):
    r"""Folds spatial patches into the channel dimension (channels-last).

    :math:`(B, L_1 p_1, ..., L_N p_N, C) \to (B, L_1, ..., L_N, C p_1 \cdots p_N)`
    with the reference's :math:`(C, p_1, ..., p_N)` inner feature order
    (`azula/nn/layers.py:198-221`).
    """

    def __init__(self, patch_shape: Sequence[int]) -> None:
        self.patch_shape = tuple(patch_shape)

    def __call__(self, x: Array) -> Array:
        p = self.patch_shape
        N = len(p)

        *batch, C = x.shape[: -N - 1] + (x.shape[-1],)
        spatial = x.shape[-N - 1 : -1]

        # (B, L1*p1, ..., C) -> (B, L1, p1, ..., LN, pN, C)
        shape = list(x.shape[: -N - 1])
        for size, patch in zip(spatial, p, strict=True):
            shape.extend([size // patch, patch])
        shape.append(C)
        x = x.reshape(shape)

        # -> (B, L1, ..., LN, C, p1, ..., pN)
        ndim = x.ndim
        batch_axes = list(range(ndim - 2 * N - 1))
        grid_axes = [ndim - 2 * N - 1 + 2 * i for i in range(N)]
        patch_axes = [ndim - 2 * N + 2 * i for i in range(N)]
        x = jnp.transpose(x, batch_axes + grid_axes + [ndim - 1] + patch_axes)

        # -> (B, L1, ..., LN, C*p1*...*pN)
        return x.reshape(*x.shape[: -N - 1], -1)


class Unpatchify(Module):
    r"""Unfolds the channel dimension back into spatial patches (inverse of
    :class:`Patchify`, reference `azula/nn/layers.py:224-247`)."""

    def __init__(self, patch_shape: Sequence[int]) -> None:
        self.patch_shape = tuple(patch_shape)

    def __call__(self, x: Array) -> Array:
        p = self.patch_shape
        N = len(p)

        grid = x.shape[-N - 1 : -1]
        C = x.shape[-1] // math.prod(p)

        # (B, L1, ..., LN, C*p1*...*pN) -> (B, L1, ..., LN, C, p1, ..., pN)
        x = x.reshape(*x.shape[:-1], C, *p)

        # -> (B, L1, p1, ..., LN, pN, C)
        ndim = x.ndim
        batch = ndim - 2 * N - 1
        order = list(range(batch))
        for i in range(N):
            order.extend([batch + i, batch + N + 1 + i])
        order.append(batch + N)
        x = jnp.transpose(x, order)

        # -> (B, L1*p1, ..., LN*pN, C)
        shape = list(x.shape[:batch])
        for size, patch in zip(grid, p, strict=True):
            shape.append(size * patch)
        shape.append(C)

        return x.reshape(shape)


class SineEncoding(Module):
    r"""Sinusoidal positional encoding (reference `azula/nn/layers.py:250-299`).

    .. math::
        e_{2i} = \sin(x \, \omega^{-2i/D}), \quad e_{2i+1} = \cos(x \, \omega^{-2i/D})

    Arguments:
        features: The number of embedding features :math:`D`. Must be even.
        omega: The maximum frequency :math:`\omega`.
    """

    def __init__(self, features: int, omega: float = 1e4) -> None:
        assert features % 2 == 0

        self.features = features
        self.omega = omega

    def __call__(self, x: Array) -> Array:
        return sine_encoding(x, features=self.features, omega=self.omega)


@promote_dtype
def sine_encoding(x: Array, /, features: int, omega: float = 1e4) -> Array:
    x = x[..., None]

    freqs = jnp.linspace(0, 1, features // 2, dtype=x.dtype)
    freqs = jnp.exp(math.log(1 / omega) * freqs)

    return jnp.concatenate(
        (
            jnp.sin(x * freqs),
            jnp.cos(x * freqs),
        ),
        axis=-1,
    )


class Dropout(Module):
    r"""Dropout layer. Active only when a PRNG key is provided (training)."""

    def __init__(self, rate: float) -> None:
        self.rate = rate

    def __call__(self, x: Array, key: Array | None = None) -> Array:
        if key is None or self.rate <= 0:
            return x

        keep = jax.random.bernoulli(key, 1 - self.rate, x.shape)

        return jnp.where(keep, x / (1 - self.rate), 0.0).astype(x.dtype)


class Upsample(Module):
    r"""Nearest-neighbor upsampling over the spatial (non-batch, non-channel)
    dimensions, channels-last. Equivalent of `torch.nn.Upsample(mode='nearest')`
    (used at `azula/nn/unet.py:186`)."""

    def __init__(self, factor: Sequence[int]) -> None:
        self.factor = tuple(factor)

    def __call__(self, x: Array) -> Array:
        N = len(self.factor)

        for i, f in enumerate(self.factor):
            if f > 1:
                axis = x.ndim - 1 - N + i
                x = jnp.repeat(x, f, axis=axis)

        return x

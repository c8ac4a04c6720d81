r"""EDM2 magnitude-preserving UNet, TPU-native.

A channels-last JAX reimplementation of the architecture inside the NVlabs/edm2
pickled checkpoints (Karras et al., 2024, "Analyzing and Improving the Training
Dynamics of Diffusion Models"), which the reference loads by unpickling whole
torch modules (`azula/plugins/eldm/__init__.py:176-200`): every operation is
magnitude preserving — weight-normalized convolutions (:class:`MPConv`),
`mp_silu`/`mp_sum`/`mp_cat` activations and merges, pixel-normalized encoder
states and attention vectors — plus learned scalar gains.

Module-dict keys match the checkpoint layout (``enc.64x64_block0.conv_res0``)
so the converter (:mod:`azula_tpu.models.eldm.convert`) is a mechanical walk.
"""

from __future__ import annotations

__all__ = [
    "EDM2UNet",
    "EDM2Precond",
    "mp_silu",
    "mp_sum",
    "mp_cat",
    "normalize",
]

import jax
import jax.numpy as jnp
import math

from collections.abc import Sequence
from jax import Array

from ...nn.module import Module


def normalize(x: Array, dim=None, eps: float = 1e-4) -> Array:
    r"""Magnitude-preserving normalization (NVlabs `normalize`): scales by the
    RMS magnitude over `dim` with an epsilon floor."""

    if dim is None:
        dim = tuple(range(1, x.ndim))

    h = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(h), axis=dim, keepdims=True))

    n_norm = math.prod(x.shape[d] for d in (dim if isinstance(dim, tuple) else (dim,)))
    norm = eps + norm * math.sqrt(1 / n_norm)

    return (h / norm).astype(x.dtype)


def mp_silu(x: Array) -> Array:
    return jax.nn.silu(x) / 0.596


def mp_sum(a: Array, b: Array, t: float = 0.5) -> Array:
    return (a + t * (b - a)) / math.sqrt((1 - t) ** 2 + t**2)


def mp_cat(a: Array, b: Array, t: float = 0.5) -> Array:
    Na, Nb = a.shape[-1], b.shape[-1]
    C = math.sqrt((Na + Nb) / ((1 - t) ** 2 + t**2))
    wa = C / math.sqrt(Na) * (1 - t)
    wb = C / math.sqrt(Nb) * t

    return jnp.concatenate([wa * a, wb * b], axis=-1)


class MPFourier(Module):
    r"""Magnitude-preserving Fourier features."""

    def __init__(self, num_channels: int, bandwidth: float = 1.0, *, key: Array) -> None:
        k1, k2 = jax.random.split(key)

        self.freqs = 2 * jnp.pi * jax.random.normal(k1, (num_channels,)) * bandwidth
        self.phases = 2 * jnp.pi * jax.random.uniform(k2, (num_channels,))

    def __call__(self, x: Array) -> Array:
        y = x.astype(jnp.float32)[..., None] * self.freqs.astype(jnp.float32)
        y = jnp.cos(y + self.phases.astype(jnp.float32)) * math.sqrt(2)

        return y.astype(x.dtype)


class MPConv(Module):
    r"""Weight-normalized convolution / linear with magnitude-preserving
    scaling. Kernel `()` means linear; weights stored HWIO (convs) or
    :math:`(C_i, C_o)`-transposed at conversion... stored as the checkpoint's
    `(out, in, *k)` is permuted to channels-last layouts by the converter."""

    def __init__(
        self, in_channels: int, out_channels: int, kernel: Sequence[int], *, key: Array
    ) -> None:
        kernel = tuple(kernel)

        if kernel:
            self.weight = jax.random.normal(key, (*kernel, in_channels, out_channels))
        else:
            self.weight = jax.random.normal(key, (in_channels, out_channels))

    def __call__(self, x: Array, gain: Array | float = 1.0) -> Array:
        w = self.weight.astype(jnp.float32)

        # traditional weight normalization, per output channel (last axis)
        w = jnp.moveaxis(normalize(jnp.moveaxis(w, -1, 0)), 0, -1)

        fan_in = math.prod(w.shape[:-1])
        w = w * (gain / math.sqrt(fan_in))
        w = w.astype(x.dtype)

        if w.ndim == 2:
            return x @ w

        pad = w.shape[0] // 2

        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _resample(x: Array, f: Sequence[int], mode: str) -> Array:
    if mode == "keep":
        return x

    fv = jnp.asarray(f, dtype=jnp.float32)
    fv = fv / fv.sum()
    f2 = jnp.outer(fv, fv)

    C = x.shape[-1]
    k = f2.shape[0]
    pad = (k - 1) // 2
    w = jnp.tile(f2[:, :, None, None], (1, 1, 1, C)).astype(x.dtype)

    if mode == "down":
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        )

    # up: conv_transpose with a symmetric filter
    return jax.lax.conv_general_dilated(
        x, 4 * w, (1, 1), [(k - 1 - pad, k - 1 - pad)] * 2,
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


class EDM2Block(Module):
    r"""The EDM2 `Block`: resample, (enc) skip+pixel-norm, MP residual branch
    with gained embedding modulation, MP attention, activation clipping."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        emb_channels: int,
        flavor: str = "enc",
        resample_mode: str = "keep",
        resample_filter: Sequence[int] = (1, 1),
        attention: bool = False,
        channels_per_head: int = 64,
        res_balance: float = 0.3,
        attn_balance: float = 0.3,
        clip_act: float = 256.0,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

        self.flavor = flavor
        self.resample_mode = resample_mode
        self.resample_filter = tuple(resample_filter)
        self.num_heads = out_channels // channels_per_head if attention else 0
        self.res_balance = res_balance
        self.attn_balance = attn_balance
        self.clip_act = clip_act
        self.out_channels = out_channels

        self.emb_gain = jnp.zeros(())
        self.conv_res0 = MPConv(
            out_channels if flavor == "enc" else in_channels,
            out_channels,
            kernel=(3, 3),
            key=k1,
        )
        self.emb_linear = MPConv(emb_channels, out_channels, kernel=(), key=k2)
        self.conv_res1 = MPConv(out_channels, out_channels, kernel=(3, 3), key=k3)
        self.conv_skip = (
            MPConv(in_channels, out_channels, kernel=(1, 1), key=k4)
            if in_channels != out_channels
            else None
        )
        if self.num_heads:
            self.attn_qkv = MPConv(out_channels, 3 * out_channels, kernel=(1, 1), key=k5)
            self.attn_proj = MPConv(out_channels, out_channels, kernel=(1, 1), key=k6)

    def __call__(self, x: Array, emb: Array) -> Array:
        x = _resample(x, self.resample_filter, self.resample_mode)

        if self.flavor == "enc":
            if self.conv_skip is not None:
                x = self.conv_skip(x)
            x = normalize(x, dim=-1)  # pixel norm over channels

        y = self.conv_res0(mp_silu(x))
        c = self.emb_linear(emb, gain=self.emb_gain) + 1
        y = mp_silu(y * c[:, None, None, :].astype(y.dtype))
        y = self.conv_res1(y)

        if self.flavor == "dec" and self.conv_skip is not None:
            x = self.conv_skip(x)

        x = mp_sum(x, y, t=self.res_balance)

        if self.num_heads:
            B, H, W, C = x.shape
            nh = self.num_heads
            ch = C // nh

            # checkpoint channel layout: (head, channel, qkv) over the 3C axis
            y = self.attn_qkv(x).reshape(B, H * W, nh, ch, 3)
            y = normalize(y, dim=3)
            q, k, v = y[..., 0], y[..., 1], y[..., 2]

            logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) / jnp.sqrt(ch)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            a = jnp.einsum("bhqk,bkhc->bqhc", w, v).reshape(B, H, W, C)

            x = mp_sum(x, self.attn_proj(a), t=self.attn_balance)

        if self.clip_act is not None:
            x = jnp.clip(x, -self.clip_act, self.clip_act)

        return x


class EDM2UNet(Module):
    r"""The EDM2 UNet (NVlabs `UNet` in networks_edm2.py), channels-last."""

    def __init__(
        self,
        img_resolution: int,
        img_channels: int,
        label_dim: int = 0,
        model_channels: int = 192,
        channel_mult: Sequence[int] = (1, 2, 3, 4),
        channel_mult_noise: int | None = None,
        channel_mult_emb: int | None = None,
        num_blocks: int = 3,
        attn_resolutions: Sequence[int] = (16, 8),
        label_balance: float = 0.5,
        concat_balance: float = 0.5,
        *,
        key: Array,
        **block_kwargs,
    ) -> None:
        cblock = [model_channels * m for m in channel_mult]
        cnoise = model_channels * channel_mult_noise if channel_mult_noise else cblock[0]
        cemb = model_channels * channel_mult_emb if channel_mult_emb else max(cblock)

        self.label_balance = label_balance
        self.concat_balance = concat_balance

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        self.out_gain = jnp.zeros(())
        self.emb_fourier = MPFourier(cnoise, key=next_key())
        self.emb_noise = MPConv(cnoise, cemb, kernel=(), key=next_key())
        self.emb_label = (
            MPConv(label_dim, cemb, kernel=(), key=next_key()) if label_dim else None
        )

        self.enc = {}
        cout = img_channels + 1  # a constant ones-channel is concatenated
        for level, channels in enumerate(cblock):
            res = img_resolution >> level
            if level == 0:
                cin, cout = cout, channels
                self.enc[f"{res}x{res}_conv"] = MPConv(cin, cout, kernel=(3, 3), key=next_key())
            else:
                self.enc[f"{res}x{res}_down"] = EDM2Block(
                    cout, cout, cemb, flavor="enc", resample_mode="down",
                    key=next_key(), **block_kwargs,
                )
            for idx in range(num_blocks):
                cin, cout = cout, channels
                self.enc[f"{res}x{res}_block{idx}"] = EDM2Block(
                    cin, cout, cemb, flavor="enc",
                    attention=(res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )

        self.enc_order = list(self.enc)

        skips = [
            b.out_channels if isinstance(b, EDM2Block) else b.weight.shape[-1]
            for b in self.enc.values()
        ]

        self.dec = {}
        for level, channels in reversed(list(enumerate(cblock))):
            res = img_resolution >> level
            if level == len(cblock) - 1:
                self.dec[f"{res}x{res}_in0"] = EDM2Block(
                    cout, cout, cemb, flavor="dec", attention=True,
                    key=next_key(), **block_kwargs,
                )
                self.dec[f"{res}x{res}_in1"] = EDM2Block(
                    cout, cout, cemb, flavor="dec", key=next_key(), **block_kwargs
                )
            else:
                self.dec[f"{res}x{res}_up"] = EDM2Block(
                    cout, cout, cemb, flavor="dec", resample_mode="up",
                    key=next_key(), **block_kwargs,
                )
            for idx in range(num_blocks + 1):
                cin = cout + skips.pop()
                cout = channels
                self.dec[f"{res}x{res}_block{idx}"] = EDM2Block(
                    cin, cout, cemb, flavor="dec",
                    attention=(res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )

        self.dec_order = list(self.dec)

        self.out_conv = MPConv(cout, img_channels, kernel=(3, 3), key=next_key())

    def __call__(
        self,
        x: Array,
        noise_labels: Array,
        class_labels: Array | None = None,
    ) -> Array:
        emb = self.emb_noise(self.emb_fourier(noise_labels))

        if self.emb_label is not None and class_labels is not None:
            scale = math.sqrt(class_labels.shape[-1])
            emb = mp_sum(
                emb,
                self.emb_label(class_labels.astype(emb.dtype) * scale),
                t=self.label_balance,
            )

        emb = mp_silu(emb).astype(x.dtype)

        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)

        skips = []
        for name in self.enc_order:
            block = self.enc[name]
            x = block(x) if "conv" in name else block(x, emb)
            skips.append(x)

        for name in self.dec_order:
            block = self.dec[name]
            if "block" in name:
                x = mp_cat(x, skips.pop(), t=self.concat_balance)
            x = block(x, emb)

        return self.out_conv(x, gain=self.out_gain)


class EDM2Precond(Module):
    r"""The EDM2 `Precond`: EDM preconditioning around :class:`EDM2UNet`."""

    def __init__(self, unet: EDM2UNet, label_dim: int = 0, sigma_data: float = 0.5) -> None:
        self.unet = unet
        self.label_dim = label_dim
        self.sigma_data = sigma_data

    def __call__(
        self, x: Array, sigma: Array, class_labels: Array | None = None, **kwargs
    ) -> Array:
        sigma = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(sigma, dtype=jnp.float32)), (x.shape[0],)
        )[:, None, None, None]

        if self.label_dim and class_labels is None:
            class_labels = jnp.zeros((x.shape[0], self.label_dim), x.dtype)

        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1 / jnp.sqrt(sd2 + sigma**2)
        c_noise = jnp.log(sigma.reshape(-1)) / 4

        F = self.unet(
            (c_in * x.astype(jnp.float32)).astype(x.dtype),
            c_noise,
            class_labels=class_labels,
            **kwargs,
        )

        return c_skip * x.astype(jnp.float32) + c_out * F.astype(jnp.float32)

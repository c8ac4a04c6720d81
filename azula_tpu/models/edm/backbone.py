r"""EDM (NVlabs) UNet backbones, TPU-native.

Channels-last JAX reimplementations of the architectures inside the NVlabs/edm
pickled checkpoints, which the reference loads by unpickling entire torch
modules (`azula/plugins/edm/__init__.py:133-153`):

- :class:`SongUNet` — DDPM++ / NCSN++ (Song et al.), with FIR up/downsampling
  filters, Fourier or positional noise embeddings, and residual encoder
  pyramids;
- :class:`DhariwalUNet` — the ADM variant used by `edm-imagenet-64x64-cond-adm`;
- the :class:`VPPrecond` / :class:`VEPrecond` / :class:`EDMPrecond` wrappers
  that map noise level to network conditioning (Karras et al., 2022, table 1).

Module-dict keys match the checkpoint layout (``enc.32x32_block0.norm0``) so
the weight converter (:mod:`azula_tpu.models.edm.convert`) is a mechanical
walk. Iteration order is kept in a static name list — JAX sorts dict pytrees
lexicographically, which would scramble resolution order.
"""

from __future__ import annotations

__all__ = [
    "SongUNet",
    "DhariwalUNet",
    "VPPrecond",
    "VEPrecond",
    "EDMPrecond",
    "PRECONDS",
]

import jax
import jax.numpy as jnp
import math
import numpy as np

from collections.abc import Sequence
from jax import Array

from ...nn.layers import GroupNorm, Linear
from ...nn.module import Module


def _norm(channels: int, eps: float) -> GroupNorm:
    # NVlabs GroupNorm: num_groups = min(32, C // 4)
    return GroupNorm(min(32, channels // 4), channels, eps=eps, affine=True)


class EDMConv(Module):
    r"""The NVlabs `Conv2d`: optional FIR up/downsampling fused with a kxk
    convolution (k in {0, 1, 3}; 0 means resample-only), channels-last."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel: int,
        bias: bool = True,
        up: bool = False,
        down: bool = False,
        resample_filter: Sequence[int] = (1, 1),
        fused_resample: bool = False,
        *,
        key: Array,
    ) -> None:
        self.up = up
        self.down = down
        self.fused = fused_resample
        self.in_channels = in_channels
        self.out_channels = out_channels

        f = np.asarray(resample_filter, dtype=np.float32)
        f = np.outer(f, f) / f.sum() ** 2
        self.filter = jnp.asarray(f)  # (kf, kf), normalized

        if kernel:
            k1, _ = jax.random.split(key)
            fan = in_channels * kernel * kernel
            self.weight = jax.random.normal(
                k1, (kernel, kernel, in_channels, out_channels)
            ) / math.sqrt(fan)
        else:
            self.weight = None

        if kernel and bias:
            self.bias = jnp.zeros(out_channels)
        else:
            self.bias = None

    def _conv(self, x: Array, w: Array, pad: int, stride: int = 1) -> Array:
        return jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _depthwise(self, x: Array, f: Array, pad: int, stride: int = 1, transpose: bool = False) -> Array:
        C = x.shape[-1]
        kf = f.shape[0]
        w = jnp.tile(f[:, :, None, None], (1, 1, 1, C)).astype(x.dtype)

        if transpose:
            # torch conv_transpose2d(stride=2, padding=pad) with a symmetric
            # filter == dilated correlation with per-side padding (kf - 1 - pad)
            return jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=[(kf - 1 - pad, kf - 1 - pad)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            )

        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    def __call__(self, x: Array) -> Array:
        w = self.weight
        f = self.filter
        w_pad = w.shape[0] // 2 if w is not None else 0
        f_pad = (f.shape[0] - 1) // 2

        if self.fused and self.up and w is not None:
            x = self._depthwise(x, 4 * f, max(f_pad - w_pad, 0), transpose=True)
            x = self._conv(x, w, max(w_pad - f_pad, 0))
        elif self.fused and self.down and w is not None:
            x = self._conv(x, w, w_pad + f_pad)
            x = self._depthwise(x, f, 0, stride=2)
        else:
            if self.up:
                x = self._depthwise(x, 4 * f, f_pad, transpose=True)
            if self.down:
                x = self._depthwise(x, f, f_pad, stride=2)
            if w is not None:
                x = self._conv(x, w, w_pad)

        if self.bias is not None:
            x = x + self.bias.astype(x.dtype)

        return x


class PositionalEmbedding(Module):
    r"""NVlabs positional noise embedding, cosine components first."""

    def __init__(self, num_channels: int, max_positions: int = 10000, endpoint: bool = False) -> None:
        self.num_channels = num_channels
        self.max_positions = max_positions
        self.endpoint = endpoint

    def __call__(self, t: Array) -> Array:
        half = self.num_channels // 2

        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1 / self.max_positions) ** freqs

        args = t[..., None].astype(jnp.float32) * freqs

        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class FourierEmbedding(Module):
    r"""NVlabs Gaussian Fourier noise embedding (NCSN++)."""

    def __init__(self, num_channels: int, scale: float = 16.0, *, key: Array) -> None:
        self.freqs = jax.random.normal(key, (num_channels // 2,)) * scale

    def __call__(self, t: Array) -> Array:
        args = 2 * jnp.pi * t[..., None].astype(jnp.float32) * self.freqs.astype(jnp.float32)

        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class EDMUNetBlock(Module):
    r"""The NVlabs `UNetBlock`: GN-SiLU-conv (with optional up/down), embedding
    modulation (additive or FiLM), GN-SiLU-conv, skip, optional self-attention;
    both residual branches scaled by `skip_scale`."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        emb_channels: int,
        up: bool = False,
        down: bool = False,
        attention: bool = False,
        num_heads: int | None = None,
        channels_per_head: int = 64,
        skip_scale: float = 1.0,
        eps: float = 1e-5,
        resample_filter: Sequence[int] = (1, 1),
        resample_proj: bool = False,
        adaptive_scale: bool = True,
        *,
        key: Array,
    ) -> None:
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

        self.num_heads = (
            0
            if not attention
            else num_heads
            if num_heads is not None
            else out_channels // channels_per_head
        )
        self.skip_scale = skip_scale
        self.adaptive_scale = adaptive_scale

        self.norm0 = _norm(in_channels, eps)
        self.conv0 = EDMConv(
            in_channels, out_channels, kernel=3, up=up, down=down,
            resample_filter=resample_filter, key=k1,
        )
        self.affine = Linear(
            emb_channels, out_channels * (2 if adaptive_scale else 1), key=k2
        )
        self.norm1 = _norm(out_channels, eps)
        self.conv1 = EDMConv(out_channels, out_channels, kernel=3, key=k3)

        if out_channels != in_channels or up or down:
            kernel = 1 if resample_proj or out_channels != in_channels else 0
            self.skip = EDMConv(
                in_channels, out_channels, kernel=kernel, up=up, down=down,
                resample_filter=resample_filter, key=k4,
            )
        else:
            self.skip = None

        if self.num_heads:
            self.norm2 = _norm(out_channels, eps)
            self.qkv = EDMConv(out_channels, out_channels * 3, kernel=1, key=k5)
            self.proj = EDMConv(out_channels, out_channels, kernel=1, key=k6)

    def __call__(self, x: Array, emb: Array) -> Array:
        orig = x
        x = self.conv0(jax.nn.silu(self.norm0(x)))

        params = self.affine(emb).astype(x.dtype)[:, None, None, :]

        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            x = jax.nn.silu(shift + self.norm1(x) * (scale + 1))
        else:
            x = jax.nn.silu(self.norm1(x + params))

        x = self.conv1(x)
        x = x + (orig if self.skip is None else self.skip(orig))
        x = x * self.skip_scale

        if self.num_heads:
            B, H, W, C = x.shape
            nh = self.num_heads
            ch = C // nh

            # checkpoint channel layout: (head, channel, qkv) — qkv innermost
            t = self.qkv(self.norm2(x)).reshape(B, H * W, nh, ch, 3)
            q, k, v = t[..., 0], t[..., 1], t[..., 2]

            logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) / jnp.sqrt(ch)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            a = jnp.einsum("bhqk,bkhc->bqhc", w, v).reshape(B, H, W, C)

            x = self.proj(a) + x
            x = x * self.skip_scale

        return x


class SongUNet(Module):
    r"""The DDPM++ / NCSN++ UNet (NVlabs `SongUNet`).

    DDPM++ (VP): `embedding_type='positional'`, `encoder_type='standard'`,
    `resample_filter=(1, 1)`, `channel_mult_noise=1`. NCSN++ (VE):
    `embedding_type='fourier'`, `encoder_type='residual'`,
    `resample_filter=(1, 3, 3, 1)`, `channel_mult_noise=2`.
    """

    def __init__(
        self,
        img_resolution: int,
        in_channels: int,
        out_channels: int,
        label_dim: int = 0,
        augment_dim: int = 0,
        model_channels: int = 128,
        channel_mult: Sequence[int] = (1, 2, 2, 2),
        channel_mult_emb: int = 4,
        num_blocks: int = 4,
        attn_resolutions: Sequence[int] = (16,),
        dropout: float = 0.10,
        label_dropout: float = 0.0,
        embedding_type: str = "positional",
        channel_mult_noise: int = 1,
        encoder_type: str = "standard",
        decoder_type: str = "standard",
        resample_filter: Sequence[int] = (1, 1),
        *,
        key: Array,
    ) -> None:
        assert embedding_type in ("fourier", "positional")
        assert encoder_type in ("standard", "skip", "residual")
        assert decoder_type in ("standard", "skip")

        emb_channels = model_channels * channel_mult_emb
        noise_channels = model_channels * channel_mult_noise

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        block_kwargs = dict(  # noqa: C408
            emb_channels=emb_channels,
            num_heads=1,
            skip_scale=math.sqrt(0.5),
            eps=1e-6,
            resample_filter=resample_filter,
            resample_proj=True,
            adaptive_scale=False,
        )

        # Mapping
        if embedding_type == "positional":
            self.map_noise = PositionalEmbedding(noise_channels, endpoint=True)
        else:
            self.map_noise = FourierEmbedding(noise_channels, key=next_key())

        self.map_label = Linear(label_dim, noise_channels, key=next_key()) if label_dim else None
        self.map_augment = (
            Linear(augment_dim, noise_channels, bias=False, key=next_key())
            if augment_dim
            else None
        )
        self.map_layer0 = Linear(noise_channels, emb_channels, key=next_key())
        self.map_layer1 = Linear(emb_channels, emb_channels, key=next_key())

        # Encoder
        self.enc = {}
        cout = in_channels
        caux = in_channels
        for level, mult in enumerate(channel_mult):
            res = img_resolution >> level
            if level == 0:
                cin, cout = cout, model_channels
                self.enc[f"{res}x{res}_conv"] = EDMConv(cin, cout, kernel=3, key=next_key())
            else:
                self.enc[f"{res}x{res}_down"] = EDMUNetBlock(
                    cout, cout, down=True, key=next_key(), **block_kwargs
                )
                if encoder_type == "skip":
                    self.enc[f"{res}x{res}_aux_down"] = EDMConv(
                        caux, caux, kernel=0, down=True,
                        resample_filter=resample_filter, key=next_key(),
                    )
                    self.enc[f"{res}x{res}_aux_skip"] = EDMConv(
                        caux, cout, kernel=1, key=next_key()
                    )
                if encoder_type == "residual":
                    self.enc[f"{res}x{res}_aux_residual"] = EDMConv(
                        caux, cout, kernel=3, down=True,
                        resample_filter=resample_filter, fused_resample=True,
                        key=next_key(),
                    )
                    caux = cout
            for idx in range(num_blocks):
                cin, cout = cout, model_channels * mult
                self.enc[f"{res}x{res}_block{idx}"] = EDMUNetBlock(
                    cin, cout, attention=(res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )

        self.enc_order = list(self.enc)

        skips = [
            block.out_channels if isinstance(block, EDMConv) else block.conv0.out_channels
            for name, block in self.enc.items()
            if "aux" not in name
        ]

        # Decoder
        self.dec = {}
        for level, mult in reversed(list(enumerate(channel_mult))):
            res = img_resolution >> level
            if level == len(channel_mult) - 1:
                self.dec[f"{res}x{res}_in0"] = EDMUNetBlock(
                    cout, cout, attention=True, key=next_key(), **block_kwargs
                )
                self.dec[f"{res}x{res}_in1"] = EDMUNetBlock(
                    cout, cout, key=next_key(), **block_kwargs
                )
            else:
                self.dec[f"{res}x{res}_up"] = EDMUNetBlock(
                    cout, cout, up=True, key=next_key(), **block_kwargs
                )
            for idx in range(num_blocks + 1):
                cin = cout + skips.pop()
                cout = model_channels * mult
                self.dec[f"{res}x{res}_block{idx}"] = EDMUNetBlock(
                    cin, cout,
                    attention=(idx == num_blocks and res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )
            if decoder_type == "skip" or level == 0:
                if decoder_type == "skip" and level < len(channel_mult) - 1:
                    self.dec[f"{res}x{res}_aux_up"] = EDMConv(
                        out_channels, out_channels, kernel=0, up=True,
                        resample_filter=resample_filter, key=next_key(),
                    )
                self.dec[f"{res}x{res}_aux_norm"] = _norm(cout, eps=1e-6)
                self.dec[f"{res}x{res}_aux_conv"] = EDMConv(
                    cout, out_channels, kernel=3, key=next_key()
                )

        self.dec_order = list(self.dec)

    def __call__(
        self,
        x: Array,
        noise_labels: Array,
        class_labels: Array | None = None,
        augment_labels: Array | None = None,
    ) -> Array:
        # Mapping
        emb = self.map_noise(noise_labels)
        # swap sin/cos (NVlabs quirk kept for checkpoint compatibility)
        B, N = emb.shape
        emb = emb.reshape(B, 2, N // 2)[:, ::-1].reshape(B, N)

        if self.map_label is not None and class_labels is not None:
            scale = math.sqrt(self.map_label.weight.shape[0])
            emb = emb + self.map_label(class_labels.astype(emb.dtype) * scale)
        if self.map_augment is not None and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels.astype(emb.dtype))

        emb = jax.nn.silu(self.map_layer0(emb))
        emb = jax.nn.silu(self.map_layer1(emb))
        emb = emb.astype(x.dtype)

        # Encoder
        skips = []
        aux = x
        for name in self.enc_order:
            block = self.enc[name]
            if "aux_down" in name:
                aux = block(aux)
            elif "aux_skip" in name:
                x = skips[-1] = x + block(aux)
            elif "aux_residual" in name:
                x = skips[-1] = aux = (x + block(aux)) / math.sqrt(2)
            else:
                x = block(x, emb) if isinstance(block, EDMUNetBlock) else block(x)
                skips.append(x)

        # Decoder
        aux = None
        tmp = None
        for name in self.dec_order:
            block = self.dec[name]
            if "aux_up" in name:
                aux = block(aux)
            elif "aux_norm" in name:
                tmp = block(x)
            elif "aux_conv" in name:
                tmp = block(jax.nn.silu(tmp))
                aux = tmp if aux is None else tmp + aux
            else:
                if x.shape[-1] != block.conv0.in_channels:
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = block(x, emb)

        return aux


class DhariwalUNet(Module):
    r"""The ADM UNet variant used by `edm-imagenet-64x64-cond-adm`
    (NVlabs `DhariwalUNet`)."""

    def __init__(
        self,
        img_resolution: int,
        in_channels: int,
        out_channels: int,
        label_dim: int = 0,
        augment_dim: int = 0,
        model_channels: int = 192,
        channel_mult: Sequence[int] = (1, 2, 3, 4),
        channel_mult_emb: int = 4,
        num_blocks: int = 3,
        attn_resolutions: Sequence[int] = (32, 16, 8),
        dropout: float = 0.10,
        label_dropout: float = 0.0,
        *,
        key: Array,
    ) -> None:
        emb_channels = model_channels * channel_mult_emb

        def next_key():
            nonlocal key
            key, sub = jax.random.split(key)
            return sub

        block_kwargs = dict(  # noqa: C408
            emb_channels=emb_channels,
            channels_per_head=64,
            adaptive_scale=True,
        )

        self.map_noise = PositionalEmbedding(model_channels)
        self.map_augment = (
            Linear(augment_dim, model_channels, bias=False, key=next_key())
            if augment_dim
            else None
        )
        self.map_layer0 = Linear(model_channels, emb_channels, key=next_key())
        self.map_layer1 = Linear(emb_channels, emb_channels, key=next_key())
        self.map_label = (
            Linear(label_dim, emb_channels, bias=False, key=next_key())
            if label_dim
            else None
        )

        self.enc = {}
        cout = in_channels
        for level, mult in enumerate(channel_mult):
            res = img_resolution >> level
            if level == 0:
                cin, cout = cout, model_channels * mult
                self.enc[f"{res}x{res}_conv"] = EDMConv(cin, cout, kernel=3, key=next_key())
            else:
                self.enc[f"{res}x{res}_down"] = EDMUNetBlock(
                    cout, cout, down=True, key=next_key(), **block_kwargs
                )
            for idx in range(num_blocks):
                cin, cout = cout, model_channels * mult
                self.enc[f"{res}x{res}_block{idx}"] = EDMUNetBlock(
                    cin, cout, attention=(res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )

        self.enc_order = list(self.enc)

        skips = [
            block.out_channels if isinstance(block, EDMConv) else block.conv0.out_channels
            for block in self.enc.values()
        ]

        self.dec = {}
        for level, mult in reversed(list(enumerate(channel_mult))):
            res = img_resolution >> level
            if level == len(channel_mult) - 1:
                self.dec[f"{res}x{res}_in0"] = EDMUNetBlock(
                    cout, cout, attention=True, key=next_key(), **block_kwargs
                )
                self.dec[f"{res}x{res}_in1"] = EDMUNetBlock(
                    cout, cout, key=next_key(), **block_kwargs
                )
            else:
                self.dec[f"{res}x{res}_up"] = EDMUNetBlock(
                    cout, cout, up=True, key=next_key(), **block_kwargs
                )
            for idx in range(num_blocks + 1):
                cin = cout + skips.pop()
                cout = model_channels * mult
                self.dec[f"{res}x{res}_block{idx}"] = EDMUNetBlock(
                    cin, cout, attention=(res in attn_resolutions),
                    key=next_key(), **block_kwargs,
                )

        self.dec_order = list(self.dec)

        self.out_norm = _norm(cout, eps=1e-5)
        self.out_conv = EDMConv(cout, out_channels, kernel=3, key=next_key())

    def __call__(
        self,
        x: Array,
        noise_labels: Array,
        class_labels: Array | None = None,
        augment_labels: Array | None = None,
    ) -> Array:
        emb = self.map_noise(noise_labels)

        if self.map_augment is not None and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels.astype(emb.dtype))

        emb = jax.nn.silu(self.map_layer0(emb))
        emb = self.map_layer1(emb)

        if self.map_label is not None and class_labels is not None:
            emb = emb + self.map_label(class_labels.astype(emb.dtype))

        emb = jax.nn.silu(emb).astype(x.dtype)

        skips = []
        for name in self.enc_order:
            block = self.enc[name]
            x = block(x, emb) if isinstance(block, EDMUNetBlock) else block(x)
            skips.append(x)

        for name in self.dec_order:
            block = self.dec[name]
            if x.shape[-1] != block.conv0.in_channels:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(x, emb)

        return self.out_conv(jax.nn.silu(self.out_norm(x)))


class _Precond(Module):
    r"""Base preconditioning wrapper: :math:`D(x, \sigma) = c_\mathrm{skip} x +
    c_\mathrm{out} F(c_\mathrm{in} x, c_\mathrm{noise})`
    (Karras et al., 2022, eq. 7)."""

    def scalings(self, sigma: Array) -> tuple[Array, Array, Array, Array]:
        raise NotImplementedError

    def __call__(self, x: Array, sigma: Array, class_labels: Array | None = None, **kwargs) -> Array:
        sigma = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(sigma, dtype=jnp.float32)), (x.shape[0],)
        )

        # conditional checkpoints expect zero one-hots, not a missing input
        # (the label embedding has a bias): NVlabs Precond.forward behavior
        if class_labels is None and getattr(self.model, "map_label", None) is not None:
            label_dim = self.model.map_label.weight.shape[0]
            class_labels = jnp.zeros((x.shape[0], label_dim), x.dtype)

        c_skip, c_out, c_in, c_noise = self.scalings(sigma[:, None, None, None])

        F = self.model(
            (c_in * x.astype(jnp.float32)).astype(x.dtype),
            c_noise.reshape(-1),
            class_labels=class_labels,
            **kwargs,
        )

        return c_skip * x.astype(jnp.float32) + c_out * F.astype(jnp.float32)


class VPPrecond(_Precond):
    r"""Variance-preserving preconditioning (DDPM++ checkpoints)."""

    def __init__(
        self,
        model: Module,
        beta_d: float = 19.9,
        beta_min: float = 0.1,
        M: int = 1000,
    ) -> None:
        self.model = model
        self.beta_d = beta_d
        self.beta_min = beta_min
        self.M = M

    def scalings(self, sigma):
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1 / jnp.sqrt(sigma**2 + 1)
        # inverse of sigma(t) = sqrt(exp(beta_d t^2 / 2 + beta_min t) - 1)
        t = (
            jnp.sqrt(self.beta_min**2 + 2 * self.beta_d * jnp.log1p(sigma**2))
            - self.beta_min
        ) / self.beta_d
        c_noise = (self.M - 1) * t

        return c_skip, c_out, c_in, c_noise


class VEPrecond(_Precond):
    r"""Variance-exploding preconditioning (NCSN++ checkpoints)."""

    def __init__(self, model: Module) -> None:
        self.model = model

    def scalings(self, sigma):
        c_skip = jnp.ones_like(sigma)
        c_out = sigma
        c_in = jnp.ones_like(sigma)
        c_noise = jnp.log(0.5 * sigma)

        return c_skip, c_out, c_in, c_noise


class EDMPrecond(_Precond):
    r"""EDM preconditioning (Karras et al., 2022, table 1, last column)."""

    def __init__(self, model: Module, sigma_data: float = 0.5) -> None:
        self.model = model
        self.sigma_data = sigma_data

    def scalings(self, sigma):
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1 / jnp.sqrt(sd2 + sigma**2)
        c_noise = jnp.log(sigma) / 4

        return c_skip, c_out, c_in, c_noise


PRECONDS = {
    "VPPrecond": VPPrecond,
    "VEPrecond": VEPrecond,
    "EDMPrecond": EDMPrecond,
}

r"""PyTorch twin of the diffusers `AutoencoderDC` (dc-ae-f32c32-sana layout).

State-dict keys match the `vae/` safetensors of Sana checkpoints. The math
follows efficientvit's DC-AE (fused-QKV multiscale ReLU linear attention,
pixel-unshuffle channel-averaging shortcuts, interpolate-conv upsampling).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    r"""diffusers RMSNorm with elementwise affine and bias, channels-last."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        h = x.float()
        h = h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + self.eps)
        return h.to(x.dtype) * self.weight + self.bias


def rms2d(norm, x):
    r"""Applies a channels-last RMSNorm to an NCHW tensor."""

    return norm(x.movedim(1, -1)).movedim(-1, 1)


class ResBlock(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, in_channels, 3, 1, 1)
        self.conv2 = nn.Conv2d(in_channels, out_channels, 3, 1, 1, bias=False)
        self.norm = RMSNorm(out_channels)

    def forward(self, x):
        h = self.conv1(x)
        h = F.silu(h)
        h = self.conv2(h)
        h = rms2d(self.norm, h)
        return x + h


class GLUMBConv(nn.Module):
    def __init__(self, in_channels, out_channels, expand_ratio=4):
        super().__init__()
        hidden = int(in_channels * expand_ratio)
        self.conv_inverted = nn.Conv2d(in_channels, 2 * hidden, 1)
        self.conv_depth = nn.Conv2d(2 * hidden, 2 * hidden, 3, 1, 1, groups=2 * hidden)
        self.conv_point = nn.Conv2d(hidden, out_channels, 1, bias=False)
        self.norm = RMSNorm(out_channels)

    def forward(self, x):
        h = F.silu(self.conv_inverted(x))
        h = self.conv_depth(h)
        h, gate = torch.chunk(h, 2, dim=1)
        h = h * F.silu(gate)
        h = self.conv_point(h)
        h = rms2d(self.norm, h)
        return x + h


class SanaMultiscaleAttentionProjection(nn.Module):
    def __init__(self, inner_dim, num_heads, kernel_size):
        super().__init__()
        channels = 3 * inner_dim
        self.proj_in = nn.Conv2d(
            channels,
            channels,
            kernel_size,
            padding=kernel_size // 2,
            groups=channels,
            bias=False,
        )
        self.proj_out = nn.Conv2d(channels, channels, 1, groups=3 * num_heads, bias=False)

    def forward(self, x):
        return self.proj_out(self.proj_in(x))


class SanaMultiscaleLinearAttention(nn.Module):
    def __init__(self, in_channels, out_channels, head_dim=32, kernel_sizes=(5,), eps=1e-15):
        super().__init__()
        heads = in_channels // head_dim
        inner = heads * head_dim
        self.head_dim = head_dim
        self.eps = eps

        self.to_q = nn.Linear(in_channels, inner, bias=False)
        self.to_k = nn.Linear(in_channels, inner, bias=False)
        self.to_v = nn.Linear(in_channels, inner, bias=False)
        self.to_qkv_multiscale = nn.ModuleList(
            SanaMultiscaleAttentionProjection(inner, heads, k) for k in kernel_sizes
        )
        self.to_out = nn.Linear(inner * (1 + len(kernel_sizes)), out_channels, bias=False)
        self.norm_out = RMSNorm(out_channels)

    def apply_linear_attention(self, query, key, value):
        value = F.pad(value, (0, 0, 0, 1), mode="constant", value=1.0)
        scores = torch.matmul(value, key.transpose(-1, -2))
        out = torch.matmul(scores, query)
        out = out.float()
        out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
        return out

    def apply_quadratic_attention(self, query, key, value):
        scores = torch.matmul(key.transpose(-1, -2), query)
        scores = scores.float()
        scores = scores / (torch.sum(scores, dim=2, keepdim=True) + self.eps)
        out = torch.matmul(value.float(), scores)
        return out

    def forward(self, x):
        B, C, H, W = x.shape
        d = self.head_dim
        residual = x

        h = x.movedim(1, -1)
        qkv = torch.cat([self.to_q(h), self.to_k(h), self.to_v(h)], dim=-1)
        qkv = qkv.movedim(-1, 1)

        multiscale = [qkv]
        for block in self.to_qkv_multiscale:
            multiscale.append(block(qkv))
        qkv = torch.cat(multiscale, dim=1)

        qkv = qkv.reshape(B, -1, 3 * d, H * W)
        query, key, value = qkv.chunk(3, dim=2)
        query = F.relu(query)
        key = F.relu(key)

        if H * W > d:
            out = self.apply_linear_attention(query, key, value)
        else:
            out = self.apply_quadratic_attention(query, key, value)

        out = out.reshape(B, -1, H, W).to(x.dtype)
        out = self.to_out(out.movedim(1, -1)).movedim(-1, 1)
        out = rms2d(self.norm_out, out)

        return residual + out


class EfficientViTBlock(nn.Module):
    def __init__(self, in_channels, head_dim=32, qkv_multiscales=(5,)):
        super().__init__()
        self.attn = SanaMultiscaleLinearAttention(
            in_channels, in_channels, head_dim=head_dim, kernel_sizes=qkv_multiscales
        )
        self.conv_out = GLUMBConv(in_channels, in_channels)

    def forward(self, x):
        return self.conv_out(self.attn(x))


class DCDownBlock2d(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, 3, 2, 1)
        self.group_size = in_channels * 4 // out_channels

    def forward(self, x):
        h = self.conv(x)
        y = F.pixel_unshuffle(x, 2)
        y = y.unflatten(1, (-1, self.group_size)).mean(dim=2)
        return h + y


class DCUpBlock2d(nn.Module):
    def __init__(self, in_channels, out_channels, interpolate=True, shortcut=True):
        super().__init__()
        self.interpolate = interpolate
        self.shortcut = shortcut
        self.repeats = out_channels * 4 // in_channels

        if interpolate:
            self.conv = nn.Conv2d(in_channels, out_channels, 3, 1, 1)
        else:
            self.conv = nn.Conv2d(in_channels, out_channels * 4, 3, 1, 1)

    def forward(self, x):
        if self.interpolate:
            h = F.interpolate(x, scale_factor=2, mode="nearest")
            h = self.conv(h)
        else:
            h = F.pixel_shuffle(self.conv(x), 2)
        if self.shortcut:
            y = x.repeat_interleave(self.repeats, dim=1)
            h = h + F.pixel_shuffle(y, 2)
        return h


def make_block(block_type, channels, head_dim, qkv_multiscales):
    if block_type == "ResBlock":
        return ResBlock(channels, channels)
    return EfficientViTBlock(channels, head_dim, qkv_multiscales)


class Encoder(nn.Module):
    def __init__(
        self,
        in_channels,
        latent_channels,
        block_types,
        block_out_channels,
        layers_per_block,
        qkv_multiscales,
        head_dim=32,
    ):
        super().__init__()
        n = len(block_out_channels)

        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, 1, 1)

        down_blocks = []
        for i, (ch, depth) in enumerate(zip(block_out_channels, layers_per_block)):
            stage = [
                make_block(block_types[i], ch, head_dim, qkv_multiscales[i])
                for _ in range(depth)
            ]
            if i < n - 1 and depth > 0:
                stage.append(DCDownBlock2d(ch, block_out_channels[i + 1]))
            down_blocks.append(nn.Sequential(*stage))
        self.down_blocks = nn.ModuleList(down_blocks)

        self.conv_out = nn.Conv2d(block_out_channels[-1], latent_channels, 3, 1, 1)
        self.group_size = block_out_channels[-1] // latent_channels

    def forward(self, x):
        h = self.conv_in(x)
        for stage in self.down_blocks:
            h = stage(h)
        y = h.unflatten(1, (-1, self.group_size)).mean(dim=2)
        return self.conv_out(h) + y


class Decoder(nn.Module):
    def __init__(
        self,
        in_channels,
        latent_channels,
        block_types,
        block_out_channels,
        layers_per_block,
        qkv_multiscales,
        head_dim=32,
        upsample_interpolate=True,
    ):
        super().__init__()
        n = len(block_out_channels)

        self.conv_in = nn.Conv2d(latent_channels, block_out_channels[-1], 3, 1, 1)
        self.repeats = block_out_channels[-1] // latent_channels

        up_blocks = []
        for i, (ch, depth) in enumerate(zip(block_out_channels, layers_per_block)):
            stage = []
            if i < n - 1 and depth > 0:
                stage.append(
                    DCUpBlock2d(
                        block_out_channels[i + 1], ch, interpolate=upsample_interpolate
                    )
                )
            stage.extend(
                make_block(block_types[i], ch, head_dim, qkv_multiscales[i])
                for _ in range(depth)
            )
            up_blocks.append(nn.Sequential(*stage))
        self.up_blocks = nn.ModuleList(up_blocks)

        self.norm_out = RMSNorm(block_out_channels[0])
        self.conv_out = nn.Conv2d(block_out_channels[0], in_channels, 3, 1, 1)

    def forward(self, z):
        h = self.conv_in(z) + z.repeat_interleave(self.repeats, dim=1)
        for stage in reversed(self.up_blocks):
            h = stage(h)
        h = rms2d(self.norm_out, h)
        h = F.relu(h)
        return self.conv_out(h)


class AutoencoderDCTwin(nn.Module):
    def __init__(
        self,
        in_channels=3,
        latent_channels=32,
        block_types=("ResBlock", "EfficientViTBlock"),
        block_out_channels=(8, 16),
        encoder_layers_per_block=(1, 1),
        decoder_layers_per_block=(1, 1),
        qkv_multiscales=((), (5,)),
        head_dim=4,
        upsample_interpolate=True,
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels,
            latent_channels,
            block_types,
            block_out_channels,
            encoder_layers_per_block,
            qkv_multiscales,
            head_dim,
        )
        self.decoder = Decoder(
            in_channels,
            latent_channels,
            block_types,
            block_out_channels,
            decoder_layers_per_block,
            qkv_multiscales,
            head_dim,
            upsample_interpolate,
        )

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

r"""PyTorch twin of the diffusers `UNet2DConditionModel` (SD 1.x / 2 subset).

State-dict keys match the `unet/diffusion_pytorch_model.safetensors` layout of
SD checkpoints exactly (`down_blocks.N.resnets.M.norm1.weight`, ...), so the
production converter (`azula_tpu/models/sd/convert.py`) runs on this twin's
state dict unchanged.
"""

import math
import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000.0, flip_sin_to_cos=True, freq_shift=0.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / (half - freq_shift)
    )
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-5, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch is not None:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class Attention(nn.Module):
    def __init__(self, query_dim, context_dim=None, heads=8):
        super().__init__()
        context_dim = context_dim or query_dim
        inner = query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, L, C = x.shape
        H = self.heads
        q = self.to_q(x).view(B, L, H, -1).transpose(1, 2)
        k = self.to_k(context).view(B, context.shape[1], H, -1).transpose(1, 2)
        v = self.to_v(context).view(B, context.shape[1], H, -1).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(B, L, C)
        return self.to_out[0](a)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads=heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, context_dim=context_dim, heads=heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, channels, context_dim, heads, depth=1, use_linear_projection=False):
        super().__init__()
        self.linear = use_linear_projection
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(channels, channels)
            self.proj_out = nn.Linear(channels, channels)
        else:
            self.proj_in = nn.Conv2d(channels, channels, 1)
            self.proj_out = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, context_dim, heads) for _ in range(depth)]
        )

    def forward(self, x, context):
        B, C, H, W = x.shape
        residual = x
        h = self.norm(x)
        if self.linear:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for block in self.transformer_blocks:
            h = block(h, context)
        if self.linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + residual


class Downsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, num_layers, context_dim=None, heads=8,
                 add_downsample=True, use_linear_projection=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_ch) for i in range(num_layers)]
        )
        if context_dim is not None:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, context_dim, heads,
                                    use_linear_projection=use_linear_projection)
                 for _ in range(num_layers)]
            )
        else:
            self.attentions = None
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
        else:
            self.downsamplers = None

    def forward(self, x, temb, context):
        states = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
            states.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states.append(x)
        return x, states


class UpBlock2D(nn.Module):
    def __init__(self, in_ch, prev_out, out_ch, temb_ch, num_layers, context_dim=None,
                 heads=8, add_upsample=True, use_linear_projection=False):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip = in_ch if i == num_layers - 1 else out_ch
            res_in = prev_out if i == 0 else out_ch
            resnets.append(ResnetBlock2D(res_in + res_skip, out_ch, temb_ch))
        self.resnets = nn.ModuleList(resnets)
        if context_dim is not None:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, context_dim, heads,
                                    use_linear_projection=use_linear_projection)
                 for _ in range(num_layers)]
            )
        else:
            self.attentions = None
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
        else:
            self.upsamplers = None

    def forward(self, x, skips, temb, context):
        for i, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class MidBlock(nn.Module):
    def __init__(self, channels, temb_ch, context_dim, heads, use_linear_projection=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(channels, channels, temb_ch), ResnetBlock2D(channels, channels, temb_ch)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(channels, context_dim, heads,
                                use_linear_projection=use_linear_projection)]
        )

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        x = self.resnets[1](x, temb)
        return x


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class UNet2DConditionTwin(nn.Module):
    def __init__(self, in_channels=4, out_channels=4, block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, cross_attention_dim=768, attention_head_dim=8,
                 cross_attention_levels=(True, True, True, False),
                 use_linear_projection=False, freq_shift=0.0):
        super().__init__()
        n = len(block_out_channels)
        if isinstance(attention_head_dim, int):
            attention_head_dim = (attention_head_dim,) * n

        self.model_channels = block_out_channels[0]
        self.freq_shift = freq_shift
        temb_dim = 4 * block_out_channels[0]

        self.time_embedding = TimestepEmbedding(block_out_channels[0], temb_dim)
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)

        self.down_blocks = nn.ModuleList()
        ch = block_out_channels[0]
        for i, out_ch in enumerate(block_out_channels):
            self.down_blocks.append(DownBlock2D(
                ch, out_ch, temb_dim, layers_per_block,
                context_dim=cross_attention_dim if cross_attention_levels[i] else None,
                heads=attention_head_dim[i], add_downsample=i < n - 1,
                use_linear_projection=use_linear_projection,
            ))
            ch = out_ch

        self.mid_block = MidBlock(block_out_channels[-1], temb_dim, cross_attention_dim,
                                  attention_head_dim[-1], use_linear_projection)

        self.up_blocks = nn.ModuleList()
        rev_out = list(reversed(block_out_channels))
        rev_attn = list(reversed(cross_attention_levels))
        rev_heads = list(reversed(attention_head_dim))
        out_ch = rev_out[0]
        for i in range(n):
            prev_out = out_ch
            out_ch = rev_out[i]
            in_ch = rev_out[min(i + 1, n - 1)]
            self.up_blocks.append(UpBlock2D(
                in_ch, prev_out, out_ch, temb_dim, layers_per_block + 1,
                context_dim=cross_attention_dim if rev_attn[i] else None,
                heads=rev_heads[i], add_upsample=i < n - 1,
                use_linear_projection=use_linear_projection,
            ))

        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states):
        timestep = torch.atleast_1d(timestep).expand(sample.shape[0])
        temb = timestep_embedding(timestep, self.model_channels, freq_shift=self.freq_shift)
        temb = self.time_embedding(temb.to(sample.dtype))

        h = self.conv_in(sample)
        skips = [h]
        for block in self.down_blocks:
            h, states = block(h, temb, encoder_hidden_states)
            skips.extend(states)

        h = self.mid_block(h, temb, encoder_hidden_states)

        for block in self.up_blocks:
            h = block(h, skips, temb, encoder_hidden_states)

        return self.conv_out(F.silu(self.conv_norm_out(h)))

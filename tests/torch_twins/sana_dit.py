r"""PyTorch twin of the diffusers `SanaTransformer2DModel`.

State-dict keys match the `transformer/` safetensors of Sana checkpoints.
"""

import math
import torch
import torch.nn as nn
import torch.nn.functional as F


def timesteps_proj(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)


class PatchEmbed(nn.Module):
    def __init__(self, in_ch, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2)


class TimestepEmbedder(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear_1 = nn.Linear(256, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(timesteps_proj(t))))


class AdaLayerNormSingle(nn.Module):
    def __init__(self, dim):
        super().__init__()

        class Emb(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TimestepEmbedder(dim)

            def forward(self, t):
                return self.timestep_embedder(t)

        self.emb = Emb()
        self.linear = nn.Linear(dim, 6 * dim)

    def forward(self, t):
        embedded = self.emb(t)
        return self.linear(F.silu(embedded)), embedded


class CaptionProjection(nn.Module):
    r"""diffusers PixArtAlphaTextProjection, default act_fn='gelu_tanh'."""

    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.gelu(self.linear_1(x), approximate="tanh"))


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        h = x.float()
        h = h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + self.eps)
        return h.to(x.dtype) * self.weight


class LinearAttention(nn.Module):
    def __init__(self, dim, heads, head_dim, qk_norm=False):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])
        # SANA 1.5: qk_norm="rms_norm_across_heads" (affine, no bias)
        self.norm_q = RMSNorm(inner, eps=1e-5) if qk_norm else None
        self.norm_k = RMSNorm(inner, eps=1e-5) if qk_norm else None

    def forward(self, x):
        B, L, _ = x.shape
        H = self.heads
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)
        q = q.transpose(1, 2).unflatten(1, (H, -1))  # B,H,d,L
        k = k.transpose(1, 2).unflatten(1, (H, -1)).transpose(2, 3)  # B,H,L,d
        v = v.transpose(1, 2).unflatten(1, (H, -1))  # B,H,d,L

        q = F.relu(q).float()
        k = F.relu(k).float()
        v = v.float()
        v = F.pad(v, (0, 0, 0, 1), mode="constant", value=1.0)  # d+1 rows

        scores = torch.matmul(v, k)  # B,H,d+1,d
        out = torch.matmul(scores, q)  # B,H,d+1,L

        out = out[:, :, :-1] / (out[:, :, -1:] + 1e-15)
        out = out.flatten(1, 2).transpose(1, 2).to(x.dtype)  # B,L,C
        return self.to_out[0](out)


class CrossAttention(nn.Module):
    def __init__(self, dim, heads, head_dim, qk_norm=False):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])
        self.norm_q = RMSNorm(inner, eps=1e-5) if qk_norm else None
        self.norm_k = RMSNorm(inner, eps=1e-5) if qk_norm else None

    def forward(self, x, context, mask=None):
        B, L, _ = x.shape
        H = self.heads
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)
        q = q.view(B, L, H, -1).transpose(1, 2)
        k = k.view(B, context.shape[1], H, -1).transpose(1, 2)
        v = v.view(B, context.shape[1], H, -1).transpose(1, 2)
        bias = None
        if mask is not None:
            bias = ((1.0 - mask.float()) * -10000.0)[:, None, None, :]
        a = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
        a = a.transpose(1, 2).reshape(B, L, -1)
        return self.to_out[0](a)


class GLUMBConv(nn.Module):
    def __init__(self, dim, mlp_ratio=2.5):
        super().__init__()
        hidden = int(dim * mlp_ratio)
        self.conv_inverted = nn.Conv2d(dim, 2 * hidden, 1)
        self.conv_depth = nn.Conv2d(2 * hidden, 2 * hidden, 3, padding=1, groups=2 * hidden)
        self.conv_point = nn.Conv2d(hidden, dim, 1, bias=False)

    def forward(self, x):
        h = F.silu(self.conv_inverted(x))
        h = self.conv_depth(h)
        h, gate = h.chunk(2, dim=1)
        h = h * F.silu(gate)
        return self.conv_point(h)


class SanaBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, cross_heads, cross_head_dim, mlp_ratio=2.5, qk_norm=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn1 = LinearAttention(dim, heads, head_dim, qk_norm)
        self.attn2 = CrossAttention(dim, cross_heads, cross_head_dim, qk_norm)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = GLUMBConv(dim, mlp_ratio)
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, x, context, mask, timestep, H, W):
        B, L, C = x.shape
        table = self.scale_shift_table[None] + timestep.reshape(B, 6, -1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = table.chunk(6, dim=1)

        h = self.norm1(x) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h)

        x = self.attn2(x, context, mask) + x

        h = self.norm2(x) * (1 + scale_mlp) + shift_mlp
        h = h.unflatten(1, (H, W)).permute(0, 3, 1, 2)
        h = self.ff(h)
        h = h.flatten(2).transpose(1, 2)
        x = x + gate_mlp * h
        return x


class SanaTransformerTwin(nn.Module):
    def __init__(self, in_channels=32, out_channels=32, num_attention_heads=70,
                 attention_head_dim=32, num_cross_attention_heads=20,
                 cross_attention_head_dim=112, caption_channels=2304,
                 num_layers=20, patch_size=1, mlp_ratio=2.5, qk_norm=False):
        super().__init__()
        dim = num_attention_heads * attention_head_dim
        self.patch_size = patch_size
        self.dim = dim

        self.patch_embed = PatchEmbed(in_channels, dim, patch_size)
        self.time_embed = AdaLayerNormSingle(dim)
        self.caption_projection = CaptionProjection(caption_channels, dim)
        self.caption_norm = RMSNorm(dim, eps=1e-5)
        self.transformer_blocks = nn.ModuleList([
            SanaBlock(dim, num_attention_heads, attention_head_dim,
                      num_cross_attention_heads, cross_attention_head_dim, mlp_ratio,
                      qk_norm)
            for _ in range(num_layers)
        ])
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim) / dim**0.5)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = nn.Linear(dim, patch_size * patch_size * out_channels)

    def forward(self, hidden_states, timestep, encoder_hidden_states,
                encoder_attention_mask=None):
        B, C, H, W = hidden_states.shape
        p = self.patch_size
        Hp, Wp = H // p, W // p

        x = self.patch_embed(hidden_states)
        timestep_table, embedded = self.time_embed(timestep)
        context = self.caption_norm(self.caption_projection(encoder_hidden_states))

        for block in self.transformer_blocks:
            x = block(x, context, encoder_attention_mask, timestep_table, Hp, Wp)

        table = self.scale_shift_table[None] + embedded[:, None]
        shift, scale = table.chunk(2, dim=1)
        x = self.norm_out(x) * (1 + scale) + shift
        x = self.proj_out(x)

        Co = x.shape[-1] // (p * p)
        x = x.reshape(B, Hp, Wp, p, p, Co)
        x = x.permute(0, 5, 1, 3, 2, 4).reshape(B, Co, H, W)
        return x

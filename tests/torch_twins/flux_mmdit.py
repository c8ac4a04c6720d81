r"""PyTorch twin of the diffusers `FluxTransformer2DModel`.

State-dict keys match the `transformer/` safetensors of FLUX.1 checkpoints.
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
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip_sin_to_cos


class MLPEmbedder(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TimeTextEmbed(nn.Module):
    def __init__(self, dim, pooled_dim, guidance):
        super().__init__()
        self.timestep_embedder = MLPEmbedder(256, dim)
        self.guidance_embedder = MLPEmbedder(256, dim) if guidance else None
        self.text_embedder = MLPEmbedder(pooled_dim, dim)

    def forward(self, timestep, guidance, pooled):
        emb = self.timestep_embedder(timesteps_proj(timestep * 1000.0).to(pooled.dtype))
        if self.guidance_embedder is not None:
            g = torch.zeros_like(timestep) if guidance is None else guidance
            emb = emb + self.guidance_embedder(timesteps_proj(g * 1000.0).to(pooled.dtype))
        return emb + self.text_embedder(pooled)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        h = x.float()
        h = h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + self.eps)
        return h.to(x.dtype) * self.weight


def rope_cos_sin(ids, axes_dim, theta=10000.0):
    cos_parts, sin_parts = [], []
    for a, dim in enumerate(axes_dim):
        freqs = 1.0 / theta ** (torch.arange(0, dim, 2, dtype=torch.float32) / dim)
        angles = ids[:, a].float()[:, None] * freqs[None]
        cos_parts.append(angles.cos().repeat_interleave(2, dim=-1))
        sin_parts.append(angles.sin().repeat_interleave(2, dim=-1))
    return torch.cat(cos_parts, dim=-1), torch.cat(sin_parts, dim=-1)


def apply_rope(x, cos, sin):
    # x: (B, H, L, D)
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


class AdaLayerNormZero(nn.Module):
    def __init__(self, dim, n=6):
        super().__init__()
        self.linear = nn.Linear(dim, n * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.n = n

    def forward(self, x, emb):
        chunks = self.linear(F.silu(emb)).chunk(self.n, dim=-1)
        shift, scale = chunks[0], chunks[1]
        h = self.norm(x) * (1 + scale[:, None]) + shift[:, None]
        return (h, *chunks[2:])


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()

        class GELU(nn.Module):
            def __init__(self, din, dout):
                super().__init__()
                self.proj = nn.Linear(din, dout)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList([GELU(dim, mult * dim), nn.Dropout(0.0), nn.Linear(mult * dim, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class JointAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(hd)
        self.norm_k = RMSNorm(hd)
        self.norm_added_q = RMSNorm(hd)
        self.norm_added_k = RMSNorm(hd)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
        self.to_add_out = nn.Linear(dim, dim)

    def forward(self, img, txt, cos, sin):
        B, L, C = img.shape
        Lt = txt.shape[1]
        H = self.heads

        def split(x):
            return x.view(B, -1, H, C // H).transpose(1, 2)

        q = self.norm_q(split(self.to_q(img)))
        k = self.norm_k(split(self.to_k(img)))
        v = split(self.to_v(img))
        qc = self.norm_added_q(split(self.add_q_proj(txt)))
        kc = self.norm_added_k(split(self.add_k_proj(txt)))
        vc = split(self.add_v_proj(txt))

        q = apply_rope(torch.cat([qc, q], dim=2), cos, sin)
        k = apply_rope(torch.cat([kc, k], dim=2), cos, sin)
        v = torch.cat([vc, v], dim=2)

        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(B, Lt + L, C)
        return self.to_out[0](a[:, Lt:]), self.to_add_out(a[:, :Lt])


class FluxTransformerBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = JointAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        self.ff_context = FeedForward(dim)

    def forward(self, img, txt, emb, cos, sin):
        h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(img, emb)
        hc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(txt, emb)
        attn_img, attn_txt = self.attn(h, hc, cos, sin)
        img = img + gate_msa[:, None] * attn_img
        h = self.norm2(img) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        img = img + gate_mlp[:, None] * self.ff(h)
        txt = txt + c_gate_msa[:, None] * attn_txt
        hc = self.norm2_context(txt) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        txt = txt + c_gate_mlp[:, None] * self.ff_context(hc)
        return img, txt


class SingleAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(dim // heads)
        self.norm_k = RMSNorm(dim // heads)

    def forward(self, x, cos, sin):
        B, L, C = x.shape
        H = self.heads

        def split(t):
            return t.view(B, L, H, C // H).transpose(1, 2)

        q = apply_rope(self.norm_q(split(self.to_q(x))), cos, sin)
        k = apply_rope(self.norm_k(split(self.to_k(x))), cos, sin)
        v = split(self.to_v(x))
        a = F.scaled_dot_product_attention(q, k, v)
        return a.transpose(1, 2).reshape(B, L, C)


class FluxSingleTransformerBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        inner = int(dim * mlp_ratio)
        self.norm = AdaLayerNormZero(dim, n=3)
        self.proj_mlp = nn.Linear(dim, inner)
        self.attn = SingleAttention(dim, heads)
        self.proj_out = nn.Linear(dim + inner, dim)

    def forward(self, x, emb, cos, sin):
        h, gate = self.norm(x, emb)
        mlp = F.gelu(self.proj_mlp(h), approximate="tanh")
        attn = self.attn(h, cos, sin)
        return x + gate[:, None] * self.proj_out(torch.cat([attn, mlp], dim=-1))


class FluxTransformerTwin(nn.Module):
    def __init__(self, in_channels=64, num_layers=19, num_single_layers=38,
                 attention_head_dim=128, num_attention_heads=24,
                 joint_attention_dim=4096, pooled_projection_dim=768,
                 guidance_embeds=True, axes_dims_rope=(16, 56, 56)):
        super().__init__()
        dim = num_attention_heads * attention_head_dim
        self.axes_dims_rope = axes_dims_rope

        self.time_text_embed = TimeTextEmbed(dim, pooled_projection_dim, guidance_embeds)
        self.context_embedder = nn.Linear(joint_attention_dim, dim)
        self.x_embedder = nn.Linear(in_channels, dim)
        self.transformer_blocks = nn.ModuleList(
            [FluxTransformerBlock(dim, num_attention_heads) for _ in range(num_layers)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [FluxSingleTransformerBlock(dim, num_attention_heads) for _ in range(num_single_layers)]
        )
        class AdaLNContinuous(nn.Module):
            def __init__(self, d):
                super().__init__()
                self.linear = nn.Linear(d, 2 * d)
                self.norm = nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)

            def forward(self, x, emb):
                scale, shift = self.linear(F.silu(emb)).chunk(2, dim=-1)
                return self.norm(x) * (1 + scale[:, None]) + shift[:, None]

        self.norm_out = AdaLNContinuous(dim)
        self.proj_out = nn.Linear(dim, in_channels)

    def forward(self, hidden_states, timestep, encoder_hidden_states,
                pooled_projections, img_ids, txt_ids, guidance=None):
        img = self.x_embedder(hidden_states)
        txt = self.context_embedder(encoder_hidden_states)
        emb = self.time_text_embed(timestep, guidance, pooled_projections)

        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = rope_cos_sin(ids, self.axes_dims_rope)

        for block in self.transformer_blocks:
            img, txt = block(img, txt, emb, cos, sin)

        h = torch.cat([txt, img], dim=1)
        for block in self.single_transformer_blocks:
            h = block(h, emb, cos, sin)
        h = h[:, txt.shape[1]:]

        h = self.norm_out(h, emb)
        return self.proj_out(h)

r"""PyTorch-to-JAX weight conversion for JiT checkpoints.

Maps the checkpoint parameter names onto :class:`JiT`'s state-dict paths:
linear transposes, conv HWIO permutes, sequential-index remaps for the
SiLU-interleaved MLP heads, and RoPE tables are skipped (recomputed buffers).
"""

from __future__ import annotations

__all__ = [
    "convert_state_dict",
]

import numpy as np

from .backbone import JiT


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def convert_state_dict(backbone: JiT, torch_sd) -> dict[str, np.ndarray]:
    r"""Converts a JiT checkpoint onto the native backbone's paths.

    ``torch_sd=None`` puts the conversion in *manifest* mode: instead of
    tensors, it returns the expected source key -> shape mapping (derived from
    the — possibly abstract — backbone by inverting the layout transforms),
    used to generate the per-card checkpoint manifests.
    """

    record = torch_sd is None
    out = {}

    if record:
        from ...utils.pytree import state_dict

        native = {
            k: tuple(int(d) for d in v.shape) for k, v in state_dict(backbone).items()
        }

    def linear(ours, theirs, bias=True):
        if record:
            out[f"{theirs}.weight"] = native[f"{ours}.weight"][::-1]
            if bias:
                out[f"{theirs}.bias"] = native[f"{ours}.bias"]
            return
        out[f"{ours}.weight"] = np.ascontiguousarray(_np(torch_sd[f"{theirs}.weight"]).T)
        if bias:
            out[f"{ours}.bias"] = _np(torch_sd[f"{theirs}.bias"])

    def conv(ours, theirs, bias=True):
        if record:
            kh, kw, i, o = native[f"{ours}.weight"]
            out[f"{theirs}.weight"] = (o, i, kh, kw)
            if bias:
                out[f"{theirs}.bias"] = native[f"{ours}.bias"]
            return
        w = _np(torch_sd[f"{theirs}.weight"])
        out[f"{ours}.weight"] = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
        if bias:
            out[f"{ours}.bias"] = _np(torch_sd[f"{theirs}.bias"])

    def rms(ours, theirs):
        if record:
            out[f"{theirs}.weight"] = native[f"{ours}.weight"]
            return
        out[f"{ours}.weight"] = _np(torch_sd[f"{theirs}.weight"])

    linear("t_embedder_mlp.0", "t_embedder.mlp.0")
    linear("t_embedder_mlp.1", "t_embedder.mlp.2")

    if record:
        out["y_embedder.embedding_table.weight"] = native["y_embedding"]
        out["pos_embed"] = (1, *native["pos_embed"])
    else:
        out["y_embedding"] = _np(torch_sd["y_embedder.embedding_table.weight"])

    conv("proj1", "x_embedder.proj1", bias=False)
    conv("proj2", "x_embedder.proj2")

    if not record:
        out["pos_embed"] = _np(torch_sd["pos_embed"])[0]

    if backbone.in_context_posemb is not None:
        if record:
            out["in_context_posemb"] = (1, *native["in_context_posemb"])
        else:
            out["in_context_posemb"] = _np(torch_sd["in_context_posemb"])[0]

    for i in range(len(backbone.blocks)):
        o, t = f"blocks.{i}", f"blocks.{i}"
        rms(f"{o}.norm1", f"{t}.norm1")
        rms(f"{o}.norm2", f"{t}.norm2")
        rms(f"{o}.attn.q_norm", f"{t}.attn.q_norm")
        rms(f"{o}.attn.k_norm", f"{t}.attn.k_norm")
        linear(f"{o}.attn.qkv", f"{t}.attn.qkv")
        linear(f"{o}.attn.proj", f"{t}.attn.proj")
        linear(f"{o}.mlp.w12", f"{t}.mlp.w12")
        linear(f"{o}.mlp.w3", f"{t}.mlp.w3")
        linear(f"{o}.adaLN", f"{t}.adaLN_modulation.1")

    rms("final_norm", "final_layer.norm_final")
    linear("final_linear", "final_layer.linear")
    linear("final_adaLN", "final_layer.adaLN_modulation.1")

    if record:  # RoPE tables are non-persistent: absent from the checkpoint
        return out

    # RoPE tables are non-persistent buffers in the checkpoint; recompute them
    # on the host (works for abstract skip-init backbones too)
    from .backbone import _axial_rope_tables

    rows, head_dim = backbone.rope[0].shape
    grid = int(round(rows**0.5))
    cls = backbone.rope_incontext[0].shape[0] - rows

    out["rope.0"], out["rope.1"] = _axial_rope_tables(head_dim, grid, 0)
    out["rope_incontext.0"], out["rope_incontext.1"] = _axial_rope_tables(
        head_dim, grid, cls
    )

    return out

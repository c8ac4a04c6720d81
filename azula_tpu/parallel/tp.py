r"""Tensor-parallel parameter sharding rules.

First-class TPU-native component (SURVEY.md §2.8 — the reference has no TP).
Parameters are annotated with :class:`jax.sharding.NamedSharding` over the
`'model'` mesh axis; the XLA SPMD partitioner inserts the matching collectives
in the jitted forward/backward. Megatron-style layout for transformer blocks:
column-parallel QKV/FFN-in, row-parallel out-projections.
"""

from __future__ import annotations

__all__ = [
    "DIT_TP_RULES",
    "FLUX_TP_RULES",
    "SANA_TP_RULES",
    "SD_TP_RULES",
    "fsdp_shardings",
    "shard_module",
    "shard_module_fsdp",
    "module_shardings",
]

import jax
import re

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.pytree import is_array
from .mesh import replicated


# (path regex, PartitionSpec) — first match wins. Megatron layout:
# column-parallel first matmul (output dim sharded), row-parallel second
# (input dim sharded), so each block needs one all-reduce in forward.
DIT_TP_RULES = (
    (r"\.msa\.qkv_proj\.weight$", P(None, "model")),
    (r"\.msa\.qkv_proj\.bias$", P("model")),
    (r"\.msa\.y_proj\.weight$", P("model", None)),
    (r"\.ffn1\.weight$", P(None, "model")),
    (r"\.ffn1\.bias$", P("model")),
    (r"\.ffn2\.weight$", P("model", None)),
)

# Megatron layout for the Flux MMDiT (`models.flux.backbone.FluxTransformer`):
# attention heads and FFN hidden dims shard over 'model'; output projections
# are row-parallel (one all-reduce per block). The 'model' axis size must
# divide the head count (24 for FLUX.1). This is what makes the 12B model
# servable across a v5e/v5p slice.
FLUX_TP_RULES = (
    # dual-stream joint attention: column-parallel q/k/v for both streams
    (r"\.attn\.(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.weight$", P(None, "model")),
    (r"\.attn\.(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.bias$", P("model")),
    (r"\.attn\.(to_out|to_add_out)\.weight$", P("model", None)),
    # dual-stream feed-forwards
    (r"\.(ff|ff_context)\.proj\.weight$", P(None, "model")),
    (r"\.(ff|ff_context)\.proj\.bias$", P("model")),
    (r"\.(ff|ff_context)\.out\.weight$", P("model", None)),
    # single-stream blocks: parallel attention + MLP with a fused output
    (r"single_transformer_blocks\.\d+\.proj_mlp\.weight$", P(None, "model")),
    (r"single_transformer_blocks\.\d+\.proj_mlp\.bias$", P("model")),
    (r"single_transformer_blocks\.\d+\.proj_out\.weight$", P("model", None)),
)

# Attention-parallel layout for the Sana linear DiT
# (`models.sana.backbone.SanaTransformer`): linear self-attention and softmax
# cross-attention heads shard over 'model' (column-parallel q/k/v,
# row-parallel out). The GLUMBConv feed-forward stays replicated — its GLU
# gate splits the expansion channels in half, which has no contiguous
# Megatron sharding. 'model' must divide both head counts (70/20 for 1.6B,
# 36/16 for 0.6B — tp=2 works for both; 0.6B also allows 4, 1.6B also 5/10).
SANA_TP_RULES = (
    (r"\.(attn1|attn2)\.(to_q|to_k|to_v)\.weight$", P(None, "model")),
    (r"\.(attn1|attn2)\.(to_q|to_k|to_v)\.bias$", P("model")),
    (r"\.(attn1|attn2)\.to_out\.weight$", P("model", None)),
)

# Attention-parallel layout for the SD UNet's transformer stages
# (`models.sd.backbone.BasicTransformerBlock`): self- and cross-attention
# heads shard over 'model' (column-parallel q/k/v, row-parallel out; one
# all-reduce per attention). The GEGLU feed-forward stays replicated — its
# gate splits the expansion channels in half, which has no contiguous
# Megatron sharding (same constraint as Sana's GLUMBConv) — and so do the
# convolutional ResNet stages (TP targets the attention FLOPs; convs are
# batch-parallel). 'model' must divide the head count (8 for SD 1.x/2).
SD_TP_RULES = (
    (r"\.(attn1|attn2)\.(to_q|to_k|to_v)\.weight$", P(None, "model")),
    (r"\.(attn1|attn2)\.to_out\.weight$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(p.name)
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
    return "." + ".".join(parts)


def module_shardings(module, mesh: Mesh, rules=DIT_TP_RULES):
    r"""Returns a pytree of shardings matching the module's structure.

    Array leaves matching a rule get the rule's :class:`PartitionSpec` over the
    mesh; everything else is replicated.
    """

    def spec_for(path, leaf):
        if not is_array(leaf):
            return None

        name = _path_str(path)

        for pattern, spec in rules:
            if re.search(pattern, name):
                return NamedSharding(mesh, spec)

        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec_for, module)


def fsdp_shardings(module, mesh: Mesh, axis: str = "data", min_size: int = 2**16):
    r"""Returns ZeRO-3-style shardings: every large parameter is sharded along
    its largest divisible dimension over the ``axis`` mesh axis; XLA inserts
    the all-gathers in forward/backward and the reduce-scatter on gradients.

    Arguments:
        module: The module whose parameters to shard.
        mesh: The device mesh.
        axis: The mesh axis to shard over (usually the data axis).
        min_size: Parameters smaller than this stay replicated.
    """

    n = mesh.shape[axis]

    def spec_for(leaf):
        if not is_array(leaf):
            return None

        if leaf.size < min_size:
            return replicated(mesh)

        # Shard the largest dimension divisible by the axis size
        dims = sorted(
            range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
        )
        for d in dims:
            if leaf.shape[d] % n == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))

        return replicated(mesh)

    return jax.tree.map(spec_for, module)


def shard_module_fsdp(module, mesh: Mesh, axis: str = "data", min_size: int = 2**16):
    r"""Places a module's parameters according to :func:`fsdp_shardings`."""

    shardings = fsdp_shardings(module, mesh, axis=axis, min_size=min_size)

    def place(leaf, sharding):
        if sharding is None:
            return leaf
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, module, shardings)


def shard_module(module, mesh: Mesh, rules=DIT_TP_RULES):
    r"""Returns a copy of the module with parameters placed according to the
    tensor-parallel rules. Compose with data parallelism by keeping the batch
    axis of inputs sharded over `'data'` (see :func:`azula_tpu.parallel.shard_batch`)."""

    shardings = module_shardings(module, mesh, rules)

    def place(leaf, sharding):
        if sharding is None:
            return leaf
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, module, shardings)

r"""PyTorch-to-JAX weight conversion for Flux transformer checkpoints.

Maps the `transformer/diffusion_pytorch_model*.safetensors` layout of FLUX.1
checkpoints (diffusers `FluxTransformer2DModel` names) onto
:class:`FluxTransformer`'s paths (reference load path:
`azula/plugins/flux/__init__.py:283-287` via diffusers).
"""

from __future__ import annotations

__all__ = [
    "convert_flux_state_dict",
]

from ..convert_utils import Converter
from .backbone import FluxTransformer, RMSNorm

RENAMES = {
    ("FluxTransformer", "norm_out_linear"): "norm_out.linear",
    ("GELUFeedForward", "proj"): "net.0.proj",
    ("GELUFeedForward", "out"): "net.2",
    ("JointAttention", "to_out"): "to_out.0",
}


def convert_flux_state_dict(module: FluxTransformer, torch_sd) -> dict:
    r"""Converts a diffusers Flux state dict to :class:`FluxTransformer` arrays."""

    converter = Converter(torch_sd, renames=RENAMES, norm_types=(RMSNorm,))
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

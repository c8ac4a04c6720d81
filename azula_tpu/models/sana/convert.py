r"""PyTorch-to-JAX weight conversion for Sana transformer checkpoints.

Maps the `transformer/diffusion_pytorch_model*.safetensors` layout of Sana
checkpoints (diffusers `SanaTransformer2DModel` names) onto
:class:`SanaTransformer`'s paths (reference load path:
`azula/plugins/sana/__init__.py:258-262` via diffusers).
"""

from __future__ import annotations

__all__ = [
    "convert_sana_state_dict",
]

import numpy as np

from ..convert_utils import Converter, _np
from .backbone import AffineRMSNorm, SanaTransformer, SanaTransformerBlock

RENAMES = {
    ("SanaTransformer", "patch_embed"): "patch_embed.proj",
    ("SanaTransformer", "timestep_embedder"): "time_embed.emb.timestep_embedder",
    ("SanaTransformer", "time_linear"): "time_embed.linear",
    ("SanaLinearAttention", "to_out"): "to_out.0",
    ("SanaCrossAttention", "to_out"): "to_out.0",
}


class _SanaConverter(Converter):
    def _walk(self, mod, ours: str, theirs: str) -> None:
        # learned scale-shift tables are raw array attributes
        if isinstance(mod, (SanaTransformerBlock, SanaTransformer)):
            self.array(
                self._join(ours, "scale_shift_table"),
                self._join(theirs, "scale_shift_table"),
            )
        super()._walk(mod, ours, theirs)


def convert_sana_state_dict(module: SanaTransformer, torch_sd) -> dict:
    r"""Converts a diffusers Sana state dict to :class:`SanaTransformer` arrays."""

    converter = _SanaConverter(torch_sd, renames=RENAMES, norm_types=(AffineRMSNorm,))
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

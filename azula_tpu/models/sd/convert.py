r"""PyTorch-to-JAX weight conversion for SD UNet checkpoints.

Maps the `unet/diffusion_pytorch_model.safetensors` layout of SD 1.x / 2
checkpoints (diffusers `UNet2DConditionModel` names) onto :class:`SDUNet`'s
state-dict paths. The module trees are isomorphic by construction; only three
attribute renames remain (reference load path:
`azula/plugins/sd/__init__.py:240-252` via diffusers).
"""

from __future__ import annotations

__all__ = [
    "convert_unet_state_dict",
]

from ..convert_utils import Converter
from .backbone import AffineLayerNorm, SDUNet

RENAMES = {
    ("SDUNet", "time_embedding"): "time_embedding.__linear__",
    ("GEGLUFeedForward", "proj"): "net.0.proj",
    ("GEGLUFeedForward", "out"): "net.2",
    ("CrossAttention", "to_out"): "to_out.0",
}


class _SDConverter(Converter):
    def _join(self, prefix: str, name: str) -> str:
        # diffusers names the two time-embedding linears linear_1/linear_2
        if prefix.endswith(".__linear__"):
            return prefix.replace(".__linear__", f".linear_{int(name) + 1}")
        return super()._join(prefix, name)


def convert_unet_state_dict(module: SDUNet, torch_sd) -> dict:
    r"""Converts a diffusers UNet state dict to :class:`SDUNet` arrays.

    Arguments:
        module: The (possibly abstract) target module, for structure.
        torch_sd: The checkpoint tensors (torch or numpy).

    Returns:
        A flat dict for :func:`azula_tpu.utils.pytree.load_state_dict`.
    """

    converter = _SDConverter(
        torch_sd, renames=RENAMES, norm_types=(AffineLayerNorm,)
    )
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out

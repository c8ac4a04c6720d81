r"""PyTorch-to-JAX weight conversion for ADM (guided-diffusion) checkpoints.

Maps the checkpoints' parameter names/layouts onto :class:`ADMUNet`'s
state-dict paths (see :func:`azula_tpu.utils.pytree.state_dict`):

- `nn.Linear` weights transpose `(out, in) -> (in, out)`;
- conv weights permute `(out, in, kh, kw) -> (kh, kw, in, out)` (HWIO);
- the 1x1 `conv1d` QKV/proj layers become Linear weights;
- `GroupNorm.weight/bias -> scale/bias`;
- sequential indices with interleaved activations are remapped
  (`in_layers.0/2`, `emb_layers.1`, `out_layers.0/3`, `time_embed.0/2`,
  `out.0/2` — reference `adm/_src/unet.py:141-247`, `600-604`).
"""

from __future__ import annotations

__all__ = [
    "convert_state_dict",
]

import numpy as np

from ...nn.layers import Conv, GroupNorm, Linear
from .backbone import (
    ADMAttentionBlock,
    ADMDownsample,
    ADMResBlock,
    ADMUNet,
    ADMUpsample,
)


def _np(tensor) -> np.ndarray:
    if isinstance(tensor, np.ndarray):
        return tensor
    return tensor.detach().cpu().numpy()


class _Converter:
    def __init__(self, torch_sd) -> None:
        # torch_sd=None puts the converter in manifest mode: the walk records
        # each source key's expected shape instead of converting (see
        # azula_tpu/models/convert_utils.py for the shared-converter analogue)
        self.record = torch_sd is None
        self.torch_sd = torch_sd
        self.out = {}
        self.manifest = {}

    @staticmethod
    def _shape(x) -> tuple:
        return tuple(int(d) for d in x.shape)

    def linear(self, module: Linear, ours: str, theirs: str) -> None:
        if self.record:
            i, o = self._shape(module.weight)
            self.manifest[f"{theirs}.weight"] = (o, i)  # trailing 1s tolerated
            if module.bias is not None:
                self.manifest[f"{theirs}.bias"] = (o,)
            return

        w = _np(self.torch_sd[f"{theirs}.weight"])

        if w.ndim == 3:  # 1x1 conv1d used as a linear layer
            w = w[..., 0]

        self.out[f"{ours}.weight"] = np.ascontiguousarray(w.T)

        if module.bias is not None:
            self.out[f"{ours}.bias"] = _np(self.torch_sd[f"{theirs}.bias"])

    def conv(self, module: Conv, ours: str, theirs: str) -> None:
        if self.record:
            *k, i, o = self._shape(module.weight)
            self.manifest[f"{theirs}.weight"] = (o, i, *k)
            if module.bias is not None:
                self.manifest[f"{theirs}.bias"] = (o,)
            return

        w = _np(self.torch_sd[f"{theirs}.weight"])  # (out, in, kh, kw)
        self.out[f"{ours}.weight"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 1, 0))
        )

        if module.bias is not None:
            self.out[f"{ours}.bias"] = _np(self.torch_sd[f"{theirs}.bias"])

    def norm(self, module: GroupNorm, ours: str, theirs: str) -> None:
        if self.record:
            self.manifest[f"{theirs}.weight"] = self._shape(module.scale)
            self.manifest[f"{theirs}.bias"] = self._shape(module.bias)
            return

        self.out[f"{ours}.scale"] = _np(self.torch_sd[f"{theirs}.weight"])
        self.out[f"{ours}.bias"] = _np(self.torch_sd[f"{theirs}.bias"])

    def layer(self, module, ours: str, theirs: str) -> None:
        if isinstance(module, ADMResBlock):
            self.norm(module.in_norm, f"{ours}.in_norm", f"{theirs}.in_layers.0")
            self.conv(module.in_conv, f"{ours}.in_conv", f"{theirs}.in_layers.2")
            self.linear(module.emb_lin, f"{ours}.emb_lin", f"{theirs}.emb_layers.1")
            self.norm(module.out_norm, f"{ours}.out_norm", f"{theirs}.out_layers.0")
            self.conv(module.out_conv, f"{ours}.out_conv", f"{theirs}.out_layers.3")
            if module.skip is not None:
                self.conv(module.skip, f"{ours}.skip", f"{theirs}.skip_connection")
        elif isinstance(module, ADMAttentionBlock):
            self.norm(module.norm, f"{ours}.norm", f"{theirs}.norm")
            self.linear(module.qkv, f"{ours}.qkv", f"{theirs}.qkv")
            self.linear(module.proj, f"{ours}.proj", f"{theirs}.proj_out")
        elif isinstance(module, ADMUpsample):
            if module.conv is not None:
                self.conv(module.conv, f"{ours}.conv", f"{theirs}.conv")
        elif isinstance(module, ADMDownsample):
            if module.op is not None:
                self.conv(module.op, f"{ours}.op", f"{theirs}.op")
        elif isinstance(module, Conv):
            self.conv(module, ours, theirs)
        else:
            raise NotImplementedError(f"cannot convert {type(module).__name__}")


def convert_state_dict(backbone: ADMUNet, torch_sd) -> dict[str, np.ndarray]:
    r"""Converts a guided-diffusion checkpoint state dict into the backbone's
    state-dict format.

    Arguments:
        backbone: The (freshly constructed) :class:`ADMUNet`.
        torch_sd: The PyTorch state dict (tensors or NumPy arrays).

    Returns:
        A mapping from the backbone's state-dict paths to NumPy arrays.
    """

    c = _Converter(torch_sd)

    c.linear(backbone.time_embed[0], "time_embed.0", "time_embed.0")
    c.linear(backbone.time_embed[1], "time_embed.1", "time_embed.2")

    if backbone.label_emb is not None:
        if c.record:
            c.manifest["label_emb.weight"] = c._shape(backbone.label_emb)
        else:
            c.out["label_emb"] = _np(torch_sd["label_emb.weight"])

    for i, layers in enumerate(backbone.input_blocks):
        for j, layer in enumerate(layers):
            c.layer(layer, f"input_blocks.{i}.{j}", f"input_blocks.{i}.{j}")

    for j, layer in enumerate(backbone.middle_block):
        c.layer(layer, f"middle_block.{j}", f"middle_block.{j}")

    for i, layers in enumerate(backbone.output_blocks):
        for j, layer in enumerate(layers):
            c.layer(layer, f"output_blocks.{i}.{j}", f"output_blocks.{i}.{j}")

    c.norm(backbone.out_norm, "out_norm", "out.0")
    c.conv(backbone.out_conv, "out_conv", "out.2")

    return c.manifest if c.record else c.out

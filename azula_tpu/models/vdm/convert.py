r"""PyTorch-to-JAX weight conversion for v-diffusion checkpoints.

Because :class:`~azula_tpu.models.vdm.backbone.VDMUNet` mirrors the
checkpoints' `net.*` Sequential indices exactly (parameter-free stages occupy
their index as string opcodes), conversion is a uniform transform:

- 4D conv weights permute `(out, in, kh, kw) -> (kh, kw, in, out)` (HWIO);
- everything else (biases, Fourier features) passes through.
"""

from __future__ import annotations

__all__ = [
    "convert_state_dict",
    "manifest_state_dict",
]

import numpy as np


def _np(tensor) -> np.ndarray:
    if isinstance(tensor, np.ndarray):
        return tensor
    return tensor.detach().cpu().numpy()


def convert_state_dict(torch_sd) -> dict[str, np.ndarray]:
    r"""Converts a v-diffusion checkpoint state dict to the backbone's format."""

    out = {}

    for name, tensor in torch_sd.items():
        w = _np(tensor)

        if w.ndim == 4:
            w = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

        # Linear weights transpose (out, in) -> (in, out); FourierFeatures
        # weights keep their (out/2, in) layout (cc12m mapping/FiLM layers)
        if (
            w.ndim == 2
            and name.endswith(".weight")
            and not name.endswith("timestep_embed.weight")
        ):
            w = np.ascontiguousarray(w.T)

        # GroupNorm affine weights (1D `.weight`) are named `scale` here
        if name.endswith(".weight") and w.ndim == 1:
            name = name[: -len(".weight")] + ".scale"

        out[name] = w

    return out


def manifest_state_dict(backbone) -> dict[str, tuple]:
    r"""Expected checkpoint key -> shape manifest for a (possibly abstract)
    :class:`~azula_tpu.models.vdm.backbone.VDMUNet`.

    Inverts :func:`convert_state_dict`'s uniform transform over the native
    state dict — the conversion is bijective (strict
    `load_state_dict` covers every native leaf), so the manifest enumerates
    exactly the keys a matching v-diffusion checkpoint must contain.
    """

    from ...utils.pytree import state_dict

    out = {}

    for name, leaf in state_dict(backbone).items():
        shape = tuple(int(d) for d in leaf.shape)

        if len(shape) == 4:  # HWIO -> torch OIHW
            kh, kw, i, o = shape
            shape = (o, i, kh, kw)
        elif (
            len(shape) == 2
            and name.endswith(".weight")
            and not name.endswith("timestep_embed.weight")
        ):
            shape = shape[::-1]

        if name.endswith(".scale") and len(shape) == 1:
            name = name[: -len(".scale")] + ".weight"

        out[name] = shape

    return out

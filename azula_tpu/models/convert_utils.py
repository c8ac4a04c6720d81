r"""Generic PyTorch-to-JAX state-dict conversion.

The SD/Flux/Sana/VAE/CLIP model families all convert diffusers/transformers
checkpoints whose module trees are isomorphic to ours up to a handful of
attribute renames. This walker maps every parameter mechanically:

- `nn.Linear` weights transpose `(out, in) -> (in, out)`;
- conv weights permute `(out, in, *k) -> (*k, in, out)` (HWIO);
- norm `weight -> scale`;
- renames are declared per (module type, attribute) pair.

Used by :mod:`azula_tpu.models.sd.convert` and friends; the same layout
transforms as the hand-written ADM converter
(:mod:`azula_tpu.models.adm.convert`).
"""

from __future__ import annotations

__all__ = [
    "Converter",
]

import numpy as np

from ..nn.layers import Conv, GroupNorm, Linear
from ..nn.module import Module


def _np(tensor):
    r"""Normalizes a checkpoint tensor to an array (numpy, or JAX for dtypes
    numpy lacks, e.g. the bfloat16 arrays of `safetensors.flax`)."""

    if isinstance(tensor, np.ndarray):
        return tensor
    if hasattr(tensor, "detach"):  # torch
        t = tensor.detach().cpu()
        # numpy refuses bfloat16; round-trip through float32
        if "bfloat16" in str(t.dtype):
            t = t.float()
        return t.numpy()
    if hasattr(tensor, "devices"):  # already a JAX array (kept on host)
        return tensor
    return np.asarray(tensor)


def _transpose(w, perm):
    r"""dtype-agnostic transpose with contiguous output."""

    if isinstance(w, np.ndarray):
        return np.ascontiguousarray(np.transpose(w, perm))

    import jax.numpy as jnp

    return jnp.transpose(w, perm)


class Converter:
    r"""Walks a JAX module tree and maps each parameter from a PyTorch state
    dict with matching structure.

    Arguments:
        torch_sd: The PyTorch state dict (names -> tensors).
        renames: A mapping `(type_name, attr) -> torch_attr` overriding the
            default name-preserving path translation. `torch_attr` may contain
            dots (e.g. `'net.0.proj'`).
        norm_types: Extra module types whose `weight` is stored as `scale`.
    """

    def __init__(
        self,
        torch_sd,
        renames: dict[tuple[str, str], str] | None = None,
        norm_types: tuple[type, ...] = (),
    ) -> None:
        # ``torch_sd=None`` puts the converter in *manifest* mode: the walk
        # records, for each source key the conversion would consume, the shape
        # the checkpoint tensor must have (derived from the target module by
        # inverting the layout transforms). Used to generate the per-card
        # key -> shape manifests (`tools/gen_manifests.py`) that loaders diff
        # against before converting.
        self.record = torch_sd is None
        self.torch_sd = torch_sd
        self.renames = renames or {}
        self.norm_types = (GroupNorm,) + norm_types
        self.out: dict[str, np.ndarray] = {}
        self.used: set[str] = set()
        self.manifest: dict[str, tuple | None] = {}

    # ---- leaf converters ----

    def _get(self, key: str):
        self.used.add(key)
        return self.torch_sd[key]

    @staticmethod
    def _shape(x) -> tuple:
        return tuple(int(d) for d in x.shape)

    def linear(self, module: Linear, ours: str, theirs: str) -> None:
        if self.record:
            i, o = self._shape(module.weight)
            self.manifest[f"{theirs}.weight"] = (o, i)  # trailing 1x1 tolerated
            if module.bias is not None:
                self.manifest[f"{theirs}.bias"] = (o,)
            return

        w = _np(self._get(f"{theirs}.weight"))

        while w.ndim > 2:  # 1x1 convs used as linears
            w = w[..., 0]

        self.out[f"{ours}.weight"] = _transpose(w, (1, 0))

        if module.bias is not None:
            self.out[f"{ours}.bias"] = _np(self._get(f"{theirs}.bias"))

    def conv(self, module: Conv, ours: str, theirs: str) -> None:
        if self.record:
            *k, i, o = self._shape(module.weight)  # (*k, in, out) HWIO
            self.manifest[f"{theirs}.weight"] = (o, i, *k)
            if module.bias is not None:
                self.manifest[f"{theirs}.bias"] = (o,)
            return

        w = _np(self._get(f"{theirs}.weight"))  # (out, in, *k)
        k = w.ndim - 2
        perm = tuple(range(2, 2 + k)) + (1, 0)
        self.out[f"{ours}.weight"] = _transpose(w, perm)

        if module.bias is not None:
            self.out[f"{ours}.bias"] = _np(self._get(f"{theirs}.bias"))

    def norm(self, module, ours: str, theirs: str) -> None:
        if self.record:
            if getattr(module, "scale", None) is not None:
                self.manifest[f"{theirs}.weight"] = self._shape(module.scale)
            if getattr(module, "bias", None) is not None:
                self.manifest[f"{theirs}.bias"] = self._shape(module.bias)
            return

        if getattr(module, "scale", None) is not None:
            self.out[f"{ours}.scale"] = _np(self._get(f"{theirs}.weight"))
        if getattr(module, "bias", None) is not None:
            self.out[f"{ours}.bias"] = _np(self._get(f"{theirs}.bias"))

    def array(self, ours: str, theirs: str, transform=None) -> None:
        if self.record:
            # The inverse of an arbitrary transform is unknown: record the
            # key with shape None (presence-only check).
            self.manifest[theirs] = None
            return

        w = _np(self._get(theirs))
        self.out[ours] = transform(w) if transform is not None else w

    # ---- recursive walk ----

    def walk(self, module, ours: str = "", theirs: str = "") -> dict:
        self._walk(module, ours, theirs)
        return self.manifest if self.record else self.out

    def _join(self, prefix: str, name: str) -> str:
        return f"{prefix}.{name}" if prefix else name

    def _walk(self, mod, ours: str, theirs: str) -> None:
        if isinstance(mod, Linear):
            self.linear(mod, ours, theirs)
        elif isinstance(mod, Conv):
            self.conv(mod, ours, theirs)
        elif isinstance(mod, self.norm_types):
            self.norm(mod, ours, theirs)
        elif isinstance(mod, (list, tuple)):
            for i, sub in enumerate(mod):
                self._walk(sub, self._join(ours, str(i)), self._join(theirs, str(i)))
        elif isinstance(mod, dict):
            for name, sub in mod.items():
                self._walk(sub, self._join(ours, name), self._join(theirs, name))
        elif isinstance(mod, Module):
            tname = type(mod).__name__
            for attr, sub in vars(mod).items():
                if sub is None or not isinstance(sub, (list, tuple, dict, Module)):
                    continue
                t_attr = self.renames.get((tname, attr), attr)
                self._walk(sub, self._join(ours, attr), self._join(theirs, t_attr))

    def unused(self) -> set[str]:
        r"""Returns the torch keys never consumed (should be empty for a
        faithful conversion)."""

        if self.record:
            return set()

        return set(self.torch_sd) - self.used

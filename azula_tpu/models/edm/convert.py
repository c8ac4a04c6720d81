r"""NVlabs-pickle extraction and PyTorch-to-JAX conversion for EDM checkpoints.

The NVlabs/edm checkpoints are pickled torch modules serialized through
`torch_utils.persistence` (each object reduces to
`_reconstruct_persistent_obj(meta)` with `meta.state = module.__dict__`,
including `_parameters`/`_buffers`/`_modules` and the constructor
`_init_args`/`_init_kwargs`). The reference requires the NVlabs repository on
the Python path to unpickle them (`azula/plugins/edm/__init__.py:1-22`); here
the restricted unpickler (:mod:`azula_tpu.models.ptread`) resolves the
reconstruction globals to plain attribute bags with numpy tensor storages —
no NVlabs source tree and no torch.
"""

from __future__ import annotations

__all__ = [
    "load_nvlabs_pickle",
    "stub_state_dict",
    "convert_edm_state_dict",
    "build_from_pickle",
]

import numpy as np

from ..convert_utils import Converter, _np, _transpose
from ..ptread import RestrictedUnpickler
from .backbone import PRECONDS, DhariwalUNet, EDMConv, FourierEmbedding, SongUNet


class StubModule:
    r"""Reconstruction target for persistent NVlabs modules: carries the
    original `__dict__` (parameters, buffers, children, init args) plus the
    persistence metadata."""

    def __init__(self) -> None:  # pragma: no cover - built via __new__
        pass

    @property
    def class_name(self) -> str:
        name = self._meta.get("class_name", "")
        return name.rsplit(".", 1)[-1]

    @property
    def init_args(self) -> tuple:
        return tuple(self.__dict__.get("_init_args", ()))

    @property
    def init_kwargs(self) -> dict:
        return dict(self.__dict__.get("_init_kwargs", {}))


def _reconstruct_persistent_obj(meta):
    obj = StubModule.__new__(StubModule)
    obj.__dict__["_meta"] = dict(meta)
    state = meta["state"] if isinstance(meta, dict) else meta.state
    obj.__dict__.update(state)
    return obj


class _EasyDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


class _NVlabsUnpickler(RestrictedUnpickler):
    r"""Extends the restricted torch-checkpoint unpickler with the NVlabs
    `torch_utils.persistence` reconstruction globals."""

    def find_class(self, module: str, name: str):
        if module.startswith("torch_utils") and name == "_reconstruct_persistent_obj":
            return _reconstruct_persistent_obj
        if module.startswith("dnnlib") and name == "EasyDict":
            return _EasyDict
        return super().find_class(module, name)


def load_nvlabs_pickle(path: str) -> dict:
    r"""Unpickles an NVlabs checkpoint without the NVlabs source tree or torch
    (tensor storages decode through :mod:`azula_tpu.models.ptread`).

    Returns the raw content dict (e.g. `{'ema': StubModule, ...}`).
    """

    with open(path, "rb") as f:
        return _NVlabsUnpickler(f).load()


def stub_state_dict(stub: StubModule, prefix: str = "") -> dict:
    r"""Flattens a stub module tree into torch-style dotted parameter names."""

    out = {}

    for name, value in {
        **stub.__dict__.get("_parameters", {}),
        **stub.__dict__.get("_buffers", {}),
    }.items():
        if value is not None:
            out[f"{prefix}{name}"] = value

    for name, child in stub.__dict__.get("_modules", {}).items():
        if child is not None:
            out.update(stub_state_dict(child, prefix=f"{prefix}{name}."))

    return out


class _EDMConverter(Converter):
    def _walk(self, mod, ours: str, theirs: str) -> None:
        if isinstance(mod, EDMConv):
            if self.record:
                if mod.weight is not None:
                    kh, kw, i, o = self._shape(mod.weight)
                    self.manifest[f"{theirs}.weight"] = (o, i, kh, kw)
                if mod.bias is not None:
                    self.manifest[f"{theirs}.bias"] = self._shape(mod.bias)
                kf = self._shape(mod.filter)
                self.manifest[f"{theirs}.resample_filter"] = (1, 1, *kf)
                return
            if mod.weight is not None:
                w = _np(self._get(f"{theirs}.weight"))  # (out, in, k, k)
                self.out[f"{ours}.weight"] = _transpose(w, (2, 3, 1, 0))
            if mod.bias is not None:
                self.out[f"{ours}.bias"] = _np(self._get(f"{theirs}.bias"))
            # the FIR filter is a buffer of shape (1, 1, kf, kf)
            f = _np(self._get(f"{theirs}.resample_filter"))
            self.out[f"{ours}.filter"] = f.reshape(f.shape[-2:])
        elif isinstance(mod, FourierEmbedding):
            self.array(f"{ours}.freqs", f"{theirs}.freqs")
        else:
            super()._walk(mod, ours, theirs)


def convert_edm_state_dict(module, torch_sd) -> dict:
    r"""Converts an NVlabs state dict onto the native backbone's paths.

    Arguments:
        module: The (possibly abstract) target module — a precond wrapper
            (paths prefixed `model.`) or a bare UNet.
        torch_sd: Torch-style names -> tensors (see :func:`stub_state_dict`).
    """

    converter = _EDMConverter(torch_sd)
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out


MODELS = {
    "SongUNet": SongUNet,
    "DhariwalUNet": DhariwalUNet,
}


def build_from_pickle(path: str):
    r"""Builds the native JAX denoiser backbone from an NVlabs checkpoint.

    Reads the architecture hyperparameters stored by `torch_utils.persistence`
    in the pickle itself, constructs the matching :class:`SongUNet` /
    :class:`DhariwalUNet` + precond wrapper abstractly, and fills it with the
    converted weights.

    Returns:
        A jittable precond module with the EDM calling convention
        `module(x, sigma, class_labels=...)` (channels-last).
    """

    import jax

    from ...utils.pytree import filter_eval_shape, load_state_dict

    content = load_nvlabs_pickle(path)
    ema = content["ema"]

    precond_cls = PRECONDS[ema.class_name]
    model_stub = ema.__dict__["_modules"]["model"]
    model_cls = MODELS[model_stub.class_name]

    kwargs = model_stub.init_kwargs
    args = model_stub.init_args

    # positional args are (img_resolution, in_channels, out_channels)
    names = ("img_resolution", "in_channels", "out_channels")
    kwargs.update(zip(names, args))

    # precond-level kwargs that parameterize the wrapper itself
    precond_kwargs = {}
    for name in ("sigma_data", "beta_d", "beta_min", "M"):
        if name in ema.init_kwargs:
            precond_kwargs[name] = ema.init_kwargs[name]

    def make():
        model = model_cls(**kwargs, key=jax.random.key(0))
        return precond_cls(model, **precond_kwargs)

    module = filter_eval_shape(make)

    sd = convert_edm_state_dict(module, stub_state_dict(ema))

    return load_state_dict(module, sd)

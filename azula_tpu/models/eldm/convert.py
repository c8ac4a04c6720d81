r"""NVlabs/edm2 pickle conversion for ELDM checkpoints.

Reuses the EDM stub-pickle extraction (:mod:`azula_tpu.models.edm.convert`) —
the edm2 repository serializes through the same `torch_utils.persistence`
format — and adds the magnitude-preserving module mappings (reference load
path: `azula/plugins/eldm/__init__.py:176-200`).
"""

from __future__ import annotations

__all__ = [
    "convert_eldm_state_dict",
    "build_from_pickle",
]

import numpy as np

from ..convert_utils import _np, _transpose
from ..edm.convert import _EDMConverter, load_nvlabs_pickle, stub_state_dict
from .backbone import EDM2Precond, EDM2UNet, MPConv, MPFourier


class _ELDMConverter(_EDMConverter):
    def _walk(self, mod, ours: str, theirs: str) -> None:
        from .backbone import EDM2Block

        if isinstance(mod, MPConv):
            if self.record:
                shape = self._shape(mod.weight)  # (*k, in, out) or (in, out)
                *k2, i, o = shape
                self.manifest[f"{theirs}.weight"] = (o, i, *k2)
                return
            w = _np(self._get(f"{theirs}.weight"))  # (out, in, *k)
            perm = (2, 3, 1, 0) if w.ndim == 4 else (1, 0)
            self.out[f"{ours}.weight"] = _transpose(w, perm)
        elif isinstance(mod, MPFourier):
            self.array(f"{ours}.freqs", f"{theirs}.freqs")
            self.array(f"{ours}.phases", f"{theirs}.phases")
        else:
            # scalar gains are plain array attributes, emitted by name before
            # the generic walk descends into child modules
            if isinstance(mod, EDM2Block):
                self.gain(self._join(ours, "emb_gain"), self._join(theirs, "emb_gain"))
            elif isinstance(mod, EDM2UNet):
                self.gain(self._join(ours, "out_gain"), self._join(theirs, "out_gain"))
            super()._walk(mod, ours, theirs)

    def gain(self, ours: str, theirs: str) -> None:
        if self.record:
            self.manifest[theirs] = None  # stored as () or (1,) across releases
            return
        self.out[ours] = np.asarray(_np(self._get(theirs)), dtype=np.float32).reshape(())


def convert_eldm_state_dict(module, torch_sd) -> dict:
    r"""Converts an NVlabs/edm2 state dict onto the native module's paths."""

    converter = _ELDMConverter(torch_sd)
    out = converter.walk(module)

    unused = converter.unused()
    assert not unused, f"unconverted checkpoint keys: {sorted(unused)[:8]} ..."

    return out


def build_from_pickle(path: str):
    r"""Builds the native EDM2 denoiser backbone (and returns the latent
    shift/scale) from an NVlabs/edm2 checkpoint.

    Returns:
        `(precond, shift, scale)` — a jittable channels-last module plus the
        per-channel latent statistics of the checkpoint's encoder.
    """

    import jax
    import numpy as np

    from ...utils.pytree import filter_eval_shape, load_state_dict

    content = load_nvlabs_pickle(path)
    ema = content["ema"]

    kwargs = ema.init_kwargs
    kwargs.update(
        zip(("img_resolution", "img_channels", "label_dim"), ema.init_args)
    )

    label_dim = kwargs.get("label_dim", 0)
    sigma_data = kwargs.pop("sigma_data", 0.5)
    kwargs.pop("use_fp16", None)
    kwargs.pop("use_bf16", None)
    kwargs.pop("logvar_channels", None)  # uncertainty head, not used at inference
    kwargs.pop("dropout", None)

    def make():
        unet = EDM2UNet(**kwargs, key=jax.random.key(0))
        return EDM2Precond(unet, label_dim=label_dim, sigma_data=sigma_data)

    module = filter_eval_shape(make)

    sd = stub_state_dict(ema)

    # posthoc-reconstruction pickles may carry an uncertainty head (logvar_*);
    # it is training-time machinery, not part of the denoiser
    sd = {k: v for k, v in sd.items() if not k.startswith("logvar")}

    module = load_state_dict(module, convert_eldm_state_dict(module, sd))

    shift = scale = None
    encoder = content.get("encoder")
    if encoder is not None:
        state = {
            **encoder.__dict__.get("_buffers", {}),
            **encoder.__dict__.get("_parameters", {}),
            **{k: v for k, v in encoder.__dict__.items() if not k.startswith("_")},
        }
        if "bias" in state and "scale" in state:
            shift = np.asarray(_np(state["bias"])).reshape(-1)
            scale = np.asarray(_np(state["scale"])).reshape(-1)

    return module, shift, scale

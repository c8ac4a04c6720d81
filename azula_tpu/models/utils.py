r"""Model-zoo helpers.

Capability parity with the reference `azula/plugins/utils.py:29-60`: the
`cards.yaml` registry parser, with dtype names mapped to JAX dtypes.
"""

from __future__ import annotations

__all__ = [
    "activation_digest",
    "check_manifest",
    "compare_digests",
    "generate_manifests",
    "load_cards",
    "load_hub_safetensors",
    "weight_digest",
]

import jax.numpy as jnp
import os
import sys
import yaml

from types import ModuleType, SimpleNamespace


def _as_jnp_dtype(name: str | None):
    if name is None:
        return None

    dtype = getattr(jnp, name, None)

    if dtype is None:
        raise ValueError(f"Unknown data type '{name}'.")

    return dtype


def load_cards(plugin: ModuleType | str) -> dict[str, SimpleNamespace]:
    r"""Returns the name-card mapping of pretrained models available in a model
    family's `cards.yaml`.

    Arguments:
        plugin: The model-family module (or its name).
    """

    if isinstance(plugin, str):
        plugin = sys.modules[plugin]

    file = os.path.join(os.path.dirname(plugin.__file__), "cards.yaml")

    assert os.path.exists(file), f"{plugin} has no cards.yaml"

    with open(file) as f:
        cards = yaml.safe_load(f)

    for card in cards.values():
        if "dtype_map" in card:
            card["dtype_map"] = {
                k: _as_jnp_dtype(v) for k, v in card["dtype_map"].items()
            }

    return {name: SimpleNamespace(**card) for name, card in cards.items()}


def load_hub_safetensors(repo: str, name: str, variant: str | None = None) -> dict:
    r"""Downloads and reads a (possibly sharded) safetensors checkpoint from a
    HuggingFace repository.

    Single-file checkpoints live at `{name}{.variant}.safetensors`; sharded
    ones publish a `...safetensors.index.json` with a `weight_map` from tensor
    names to shard files (the diffusers/transformers convention).

    Arguments:
        repo: The repository (e.g. `'black-forest-labs/FLUX.1-dev'`).
        name: The checkpoint path inside the repo, without extension
            (e.g. `'transformer/diffusion_pytorch_model'`).
        variant: An optional variant infix (e.g. `'fp16'`).

    Returns:
        A flat name-to-array mapping (numpy).
    """

    import json
    import urllib.error

    from ..hub import download

    def read(path):
        # numpy for the common dtypes; JAX for those numpy lacks (bfloat16)
        try:
            from safetensors import numpy as st

            return st.load_file(path)
        except TypeError:
            from safetensors import flax as st

            return st.load_file(path)

    suffix = f".{variant}.safetensors" if variant else ".safetensors"
    base = f"https://huggingface.co/{repo}/resolve/main"

    try:
        return read(download(f"{base}/{name}{suffix}"))
    except urllib.error.HTTPError as e:
        if e.code != 404:
            raise

    with open(download(f"{base}/{name}{suffix}.index.json")) as f:
        index = json.load(f)

    out = {}
    # shards live next to the index file (repo root when name has no directory)
    folder, sep, _ = name.rpartition("/")
    prefix = folder + sep

    for shard in sorted(set(index["weight_map"].values())):
        out.update(read(download(f"{base}/{prefix}{shard}")))

    return out


def _manifest_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "manifests")


def check_manifest(
    state_dict,
    family: str,
    card: str,
    component: str,
    canonicalize=None,
) -> None:
    r"""Diffs a checkpoint state dict against the card's expected key -> shape
    manifest (generated offline by `tools/gen_manifests.py`) *before* any
    conversion runs, so a wrong or drifted checkpoint fails with a named diff
    instead of a silent mis-load.

    Arguments:
        state_dict: The raw checkpoint tensors (names -> tensors).
        family: The model family (`'sd'`, `'flux'`, `'sana'`, ...).
        card: The card name.
        component: The checkpoint component (`'unet'`, `'vae'`, ...).
        canonicalize: The family's key-canonicalization function, applied to
            the checkpoint names before diffing (the manifests are recorded in
            canonical key space).

    Raises:
        ValueError: On missing keys, unexpected keys, or shape mismatches.
        A missing manifest file is not an error (manifests are best-effort
        coverage; `tools/gen_manifests.py` regenerates them).
    """

    import json

    path = os.path.join(_manifest_dir(), family, f"{card}.{component}.json")
    if not os.path.exists(path):
        return

    with open(path) as f:
        manifest = {k: (None if v is None else tuple(v)) for k, v in json.load(f).items()}

    shapes = {k: tuple(int(d) for d in v.shape) for k, v in state_dict.items()}
    if canonicalize is not None:
        shapes = canonicalize(shapes)

    missing = sorted(set(manifest) - set(shapes))
    unexpected = sorted(set(shapes) - set(manifest))

    def matches(got: tuple, want: tuple) -> bool:
        if got == want:
            return True
        # tolerate trailing singleton dims (1x1 convs stored as linears)
        while len(got) > len(want) and got[-1] == 1:
            got = got[:-1]
        return got == want

    mismatched = [
        f"{k}: got {shapes[k]}, expected {want}"
        for k, want in manifest.items()
        if want is not None and k in shapes and not matches(shapes[k], want)
    ]

    if missing or unexpected or mismatched:
        parts = []
        if missing:
            parts.append(f"missing keys ({len(missing)}): {missing[:8]}")
        if unexpected:
            parts.append(f"unexpected keys ({len(unexpected)}): {unexpected[:8]}")
        if mismatched:
            parts.append(f"shape mismatches ({len(mismatched)}): {mismatched[:8]}")
        raise ValueError(
            f"checkpoint does not match the '{family}/{card}' {component} "
            "manifest — wrong file, corrupted download, or upstream layout "
            "drift:\n  " + "\n  ".join(parts)
        )


def generate_manifests(family: str, out_dir: str | None = None) -> list[str]:
    r"""Regenerates the key -> shape manifests for one model family by running
    its converters in manifest mode over abstractly-constructed modules
    (`tools/gen_manifests.py` is the CLI over this).

    Arguments:
        family: `'sd'`, `'flux'` or `'sana'`.
        out_dir: Manifest root (defaults to the packaged `manifests/`).

    Returns:
        The written file paths.
    """

    import jax
    import json

    from ..utils.pytree import filter_eval_shape

    out_dir = out_dir or _manifest_dir()
    written = []

    def write(card, component, manifest):
        path = os.path.join(out_dir, family, f"{card}.{component}.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            k: (list(v) if v is not None else None) for k, v in sorted(manifest.items())
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=0)
            f.write("\n")
        written.append(path)

    key = jax.random.key(0)

    if family == "sd":
        from . import sd as sd_mod
        from .autoencoder import AutoencoderKL, convert_vae_state_dict
        from .clip import CLIPTextEncoder, convert_clip_state_dict
        from .sd.backbone import SDUNet
        from .sd.convert import convert_unet_state_dict

        for card in load_cards("azula_tpu.models.sd"):
            arch = sd_mod.ARCHS[card] if card in sd_mod.ARCHS else sd_mod._arch(card)

            unet = filter_eval_shape(SDUNet, **arch["unet"], key=key)
            write(card, "unet", convert_unet_state_dict(unet, None))

            vae = filter_eval_shape(AutoencoderKL, key=key)
            write(card, "vae", convert_vae_state_dict(vae, None))

            clip = filter_eval_shape(CLIPTextEncoder, **arch["clip"], key=key)
            write(card, "text_encoder", convert_clip_state_dict(clip, None))

    elif family == "flux":
        from .autoencoder import AutoencoderKL, convert_vae_state_dict
        from .clip import CLIPTextEncoder, convert_clip_state_dict
        from .flux.backbone import FluxTransformer
        from .flux.convert import convert_flux_state_dict
        from .t5 import T5Encoder, convert_t5_state_dict

        for card in load_cards("azula_tpu.models.flux"):
            transformer = filter_eval_shape(
                FluxTransformer, guidance_embeds="schnell" not in card, key=key
            )
            write(card, "transformer", convert_flux_state_dict(transformer, None))

            vae = filter_eval_shape(
                AutoencoderKL, latent_channels=16, use_quant_conv=False, key=key
            )
            write(card, "vae", convert_vae_state_dict(vae, None))

            clip = filter_eval_shape(CLIPTextEncoder, key=key)
            write(card, "text_encoder", convert_clip_state_dict(clip, None))

            t5 = filter_eval_shape(T5Encoder, key=key)
            write(card, "text_encoder_2", convert_t5_state_dict(t5, None))

    elif family == "sana":
        from . import sana as sana_mod
        from .gemma import Gemma2TextModel, convert_gemma_state_dict
        from .sana.autoencoder import AutoencoderDC, convert_dcae_state_dict
        from .sana.backbone import SanaTransformer
        from .sana.convert import convert_sana_state_dict

        for card in load_cards("azula_tpu.models.sana"):
            arch = sana_mod._arch(card)

            transformer = filter_eval_shape(SanaTransformer, **arch, key=key)
            write(card, "transformer", convert_sana_state_dict(transformer, None))

            dcae = filter_eval_shape(AutoencoderDC, key=key)
            write(card, "vae", convert_dcae_state_dict(dcae, None))

            gemma = filter_eval_shape(Gemma2TextModel, key=key)
            write(card, "text_encoder", convert_gemma_state_dict(gemma, None))

    elif family == "adm":
        from .adm import make_model
        from .adm.convert import convert_state_dict

        for card in load_cards("azula_tpu.models.adm"):
            cfg = load_cards("azula_tpu.models.adm")[card].config
            denoiser = filter_eval_shape(make_model, **cfg)
            write(card, "model", convert_state_dict(denoiser.backbone, None))

    elif family == "vdm":
        from .vdm import make_model
        from .vdm.convert import manifest_state_dict

        for card in load_cards("azula_tpu.models.vdm"):
            cfg = load_cards("azula_tpu.models.vdm")[card].config
            denoiser = filter_eval_shape(make_model, **cfg)
            write(card, "model", manifest_state_dict(denoiser.backbone))

    elif family == "jit":
        from .jit import make_model
        from .jit.convert import convert_state_dict

        for card in load_cards("azula_tpu.models.jit"):
            cfg = load_cards("azula_tpu.models.jit")[card].config
            denoiser = filter_eval_shape(make_model, **cfg)
            write(card, "model", convert_state_dict(denoiser.backbone, None))

    else:
        raise ValueError(f"no manifest generator for family '{family}'")

    return written


def weight_digest(sd: dict, decimals: int = 5) -> dict:
    r"""Per-tensor statistics of a (numpy/torch/jax) state dict.

    Complements :func:`check_manifest`: shapes catch missing or mis-mapped
    keys, but not transpositions, dtype truncation, or scaling applied during
    conversion — per-tensor ``(mean, std)`` in float64 does. Reference load
    path being protected: `azula/plugins/adm/__init__.py:139-161`.
    """

    import numpy as np

    out = {}
    for k in sorted(sd):
        v = sd[k]
        if hasattr(v, "detach"):  # torch
            v = v.detach().cpu().numpy()
        a = np.asarray(v, dtype=np.float64)
        out[k] = {
            "shape": list(a.shape),
            "mean": round(float(a.mean()), decimals),
            "std": round(float(a.std()), decimals),
        }
    return out


def activation_digest(fn, shapes: dict, times=(0.1, 0.5, 0.9), decimals: int = 4) -> list:
    r"""End-to-end activation statistics of a denoiser on fixed probes.

    ``fn(x_t, t) -> mean-array`` is evaluated on deterministic inputs (fixed
    PRNG key 0) at a few diffusion times; each record holds the output mean,
    std, absolute max and 8 fixed pseudo-random projections — any per-layer
    numerical drift in converted weights propagates into at least one of them.

    Arguments:
        fn: The probed callable (typically ``lambda x, t: denoiser(x, t).mean``).
        shapes: ``{"x": (...,)}`` probe input shape (batched).
        times: Diffusion times to probe.
    """

    import jax
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.key(0)
    k_x, k_p = jax.random.split(key)

    x = jax.random.normal(k_x, tuple(shapes["x"]), dtype=jnp.float32)
    proj = jax.random.normal(k_p, (8, x.size), dtype=jnp.float32) / np.sqrt(x.size)

    records = []
    for t in times:
        y = np.asarray(
            fn(x, jnp.full(x.shape[:1], t, dtype=jnp.float32)), dtype=np.float64
        )
        p = np.asarray(proj, dtype=np.float64) @ y.reshape(-1)
        records.append(
            {
                "t": t,
                "mean": round(float(y.mean()), decimals),
                "std": round(float(y.std()), decimals),
                "absmax": round(float(np.abs(y).max()), decimals),
                "proj": [round(float(v), decimals) for v in p],
            }
        )
    return records


def compare_digests(got: dict, want: dict, rtol: float = 1e-3, atol: float = 1e-3) -> list[str]:
    r"""Named differences between two digest documents (empty list = match)."""

    import math

    diffs = []

    def close(a, b):
        if isinstance(a, list) and isinstance(b, list):
            return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return math.isclose(a, b, rel_tol=rtol, abs_tol=atol)
        return a == b

    for section in ("weights", "activations"):
        g, w = got.get(section), want.get(section)
        if (g is None) != (w is None):
            diffs.append(f"{section}: present in one digest only")
            continue
        if g is None:
            continue
        if section == "weights":
            for k in sorted(set(g) | set(w)):
                if k not in g or k not in w:
                    diffs.append(f"weights[{k}]: missing on one side")
                elif not all(
                    close(g[k].get(f), w[k].get(f)) for f in ("shape", "mean", "std")
                ):
                    diffs.append(f"weights[{k}]: {g[k]} != {w[k]}")
        else:
            for i, (a, b) in enumerate(zip(g, w)):
                for field in ("mean", "std", "absmax", "proj"):
                    if not close(a[field], b[field]):
                        diffs.append(
                            f"activations[{i}].{field} (t={a.get('t')}): {a[field]} != {b[field]}"
                        )
            if len(g) != len(w):
                diffs.append(f"activations: {len(g)} records != {len(w)}")

    return diffs

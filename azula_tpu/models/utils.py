r"""Model-zoo helpers.

Capability parity with the reference `azula/plugins/utils.py:29-60`: the
`cards.yaml` registry parser, with dtype names mapped to JAX dtypes.
"""

from __future__ import annotations

__all__ = [
    "load_cards",
    "load_hub_safetensors",
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

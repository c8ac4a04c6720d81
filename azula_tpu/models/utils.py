r"""Model-zoo helpers.

Capability parity with the reference `azula/plugins/utils.py:29-60`: the
`cards.yaml` registry parser, with dtype names mapped to JAX dtypes.
"""

from __future__ import annotations

__all__ = [
    "load_cards",
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

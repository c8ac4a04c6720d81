r"""Checkpointing.

The reference checkpoints model weights only, via `torch.save/load(state_dict)`
(SURVEY.md §5.4). Here any pytree — module, parameters, optimizer state — can
be saved:

- :func:`save_checkpoint` / :func:`load_checkpoint`: flat state-dict to a
  single `.npz` file (portable, dependency-free);
- :func:`save_checkpoint_orbax` / :func:`load_checkpoint_orbax`: orbax-backed
  pytree checkpointing (async-capable, multi-host-aware) for training jobs.
"""

from __future__ import annotations

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
]

import jax
import numpy as np

from pathlib import Path
from typing import Any

from .pytree import load_state_dict, state_dict


def save_checkpoint(path: str | Path, tree: Any) -> None:
    r"""Saves a pytree's array leaves to a `.npz` file keyed by dotted paths."""

    sd = {k: np.asarray(v) for k, v in state_dict(tree).items()}

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    with open(path, "wb") as f:
        np.savez(f, **sd)


def load_checkpoint(path: str | Path, tree: Any, strict: bool = True) -> Any:
    r"""Returns a copy of the pytree with array leaves restored from a `.npz`."""

    with np.load(path) as data:
        sd = {k: data[k] for k in data.files}

    return load_state_dict(tree, sd, strict=strict)


def save_checkpoint_orbax(path: str | Path, tree: Any) -> None:
    r"""Saves a pytree with orbax (directory-based, multi-host-aware)."""

    import orbax.checkpoint as ocp

    arrays, _ = _split(tree)

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(Path(path).absolute(), arrays)


def load_checkpoint_orbax(path: str | Path, tree: Any) -> Any:
    r"""Restores a pytree saved by :func:`save_checkpoint_orbax`."""

    import orbax.checkpoint as ocp

    arrays, merge = _split(tree)

    with ocp.StandardCheckpointer() as ckpt:
        restored = ckpt.restore(Path(path).absolute(), arrays)

    return merge(restored)


def _split(tree: Any):
    r"""Splits a pytree into its array leaves (as a flat dict orbax accepts)
    and a closure that merges restored arrays back."""

    from .pytree import is_array

    flat, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {
        str(i): leaf for i, leaf in enumerate(flat) if is_array(leaf)
    }

    def merge(restored):
        leaves = [
            restored[str(i)] if str(i) in restored else leaf
            for i, leaf in enumerate(flat)
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return arrays, merge

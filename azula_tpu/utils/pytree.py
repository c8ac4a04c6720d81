r"""Pytree base class and filtered partition/combine.

This is the foundation of the framework: every schedule, denoiser, sampler,
covariance and NN module is a :class:`PyTree`, i.e. a registered JAX pytree whose
instance attributes are its children. Array-valued attributes (parameters, buffers)
are *dynamic* leaves; everything else (hyperparameters, flags, sub-structure) is
*static* and can be hashed for `jax.jit` caching.

This replaces the reference's `torch.nn.Module` inheritance (e.g.
`/root/reference/azula/denoise.py:97`) with a functional design: modules are
immutable-by-convention pytrees that flow through `jit`/`grad`/`scan` directly.
"""

from __future__ import annotations

__all__ = [
    "PyTree",
    "Static",
    "combine",
    "filter_jit",
    "is_array",
    "partition",
    "state_dict",
    "load_state_dict",
]

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from collections.abc import Mapping
from jax.tree_util import (
    DictKey,
    FlattenedIndexKey,
    GetAttrKey,
    SequenceKey,
    register_pytree_with_keys,
)
from typing import Any


def is_array(x: Any) -> bool:
    r"""Returns whether :py:`x` is a JAX or NumPy array."""

    return isinstance(x, (jax.Array, np.ndarray, np.generic))


class PyTree:
    r"""Base class whose subclasses are automatically registered as JAX pytrees.

    Every instance attribute is a pytree child, in insertion order. Containers
    (lists, tuples, dicts) and nested :class:`PyTree` instances are traversed
    recursively by JAX. Use :func:`partition` / :func:`combine` to separate array
    leaves (parameters) from static metadata at transform boundaries.
    """

    def __init_subclass__(cls, **kwargs) -> None:
        super().__init_subclass__(**kwargs)

        register_pytree_with_keys(
            cls,
            flatten_with_keys=cls._flatten_with_keys,
            unflatten_func=cls._unflatten,
            flatten_func=cls._flatten,
        )

    def _flatten(self):
        names = tuple(self.__dict__)
        return tuple(self.__dict__[n] for n in names), names

    def _flatten_with_keys(self):
        names = tuple(self.__dict__)
        return tuple((GetAttrKey(n), self.__dict__[n]) for n in names), names

    @classmethod
    def _unflatten(cls, names, children):
        obj = object.__new__(cls)

        for n, c in zip(names, children):
            object.__setattr__(obj, n, c)

        return obj

    def tree_replace(self, **updates) -> PyTree:
        r"""Returns a shallow copy of the pytree with some attributes replaced."""

        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(updates)

        return obj


@dataclasses.dataclass(frozen=True)
class Static:
    r"""Hashable static half of a partitioned pytree.

    Holds the tree structure and all non-array leaves; array positions are
    :py:`None`. Hashable as long as the static leaves are, which makes it usable
    as a `static_argnums` argument of :func:`jax.jit`.
    """

    treedef: Any
    leaves: tuple

    def __hash__(self) -> int:
        return hash((self.treedef, self.leaves))


def partition(tree: Any) -> tuple[list, Static]:
    r"""Splits a pytree into its array leaves and a hashable static structure.

    Returns:
        A pair `(arrays, static)` where `arrays` is a list aligned with the
        flattened tree (non-array positions are :py:`None`, which JAX treats as
        empty subtrees) and `static` is a :class:`Static`.
    """

    leaves, treedef = jax.tree.flatten(tree)

    arrays = [leaf if is_array(leaf) else None for leaf in leaves]
    statics = tuple(None if is_array(leaf) else leaf for leaf in leaves)

    return arrays, Static(treedef, statics)


def combine(arrays: list, static: Static) -> Any:
    r"""Reassembles a pytree from :func:`partition` output."""

    leaves = [s if a is None else a for a, s in zip(arrays, static.leaves)]

    return jax.tree.unflatten(static.treedef, leaves)


def filter_jit(fn):
    r"""Like :func:`jax.jit`, but arguments may be arbitrary pytrees mixing
    arrays and static values (e.g. :class:`PyTree` modules): array leaves are
    traced, everything else becomes part of the (hashable) static cache key.
    """

    import functools

    @functools.partial(jax.jit, static_argnums=(0,))
    def inner(static, arrays):
        args, kwargs = combine(arrays, static)
        return fn(*args, **kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        arrays, static = partition((args, kwargs))
        return inner(static, arrays)

    return wrapper


def filter_eval_shape(fn, *args, **kwargs):
    r"""Like :func:`jax.eval_shape`, but the result may be any pytree mixing
    arrays and static values (e.g. a module): array leaves come back as
    :class:`jax.ShapeDtypeStruct` with nothing allocated — the skip-init idiom
    for constructing large models before loading converted checkpoints.
    """

    statics = []

    def inner():
        out = fn(*args, **kwargs)
        arrays, static = partition(out)
        statics.append(static)  # static leaves are plain Python values
        return arrays

    arrays = jax.eval_shape(inner)

    return combine(arrays, statics[0])


def _key_str(entry: Any) -> str:
    if isinstance(entry, GetAttrKey):
        return entry.name
    elif isinstance(entry, SequenceKey):
        return str(entry.idx)
    elif isinstance(entry, DictKey):
        return str(entry.key)
    elif isinstance(entry, FlattenedIndexKey):
        return str(entry.key)
    else:
        return str(entry)


def state_dict(tree: Any) -> dict[str, jax.Array]:
    r"""Returns a flat mapping from dotted paths to the array leaves of a pytree.

    Equivalent of `torch.nn.Module.state_dict` (used by the reference for
    checkpointing, see `/root/reference/tests/test_nn_unet.py:63-68`).

    Abstract trees work too: :class:`jax.ShapeDtypeStruct` leaves (the
    skip-init idiom) are mapped like arrays, so manifest generators can walk
    a backbone's expected shapes without allocating it.
    """

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)

    out = {}

    for path, leaf in flat:
        if is_array(leaf) or isinstance(leaf, jax.ShapeDtypeStruct):
            out[".".join(_key_str(p) for p in path)] = leaf

    return out


def load_state_dict(tree: Any, sd: Mapping[str, Any], strict: bool = True) -> Any:
    r"""Returns a copy of the pytree with array leaves replaced from a state dict.

    Abstract trees work too: :class:`jax.ShapeDtypeStruct` leaves (e.g. from
    constructing the module under :func:`jax.eval_shape`, the skip-init idiom)
    are filled in from the state dict without ever allocating initial
    parameters.
    """

    used = set()

    def replace(path, leaf):
        if not (is_array(leaf) or isinstance(leaf, jax.ShapeDtypeStruct)):
            return leaf

        key = ".".join(_key_str(p) for p in path)

        if key in sd:
            used.add(key)
            new = jnp.asarray(sd[key])
            assert new.shape == jnp.shape(leaf), (
                f"shape mismatch for '{key}': {new.shape} != {jnp.shape(leaf)}"
            )
            return new
        elif strict:
            raise KeyError(f"missing key '{key}' in state dict")
        else:
            return leaf

    new_tree = jax.tree_util.tree_map_with_path(replace, tree)

    if strict:
        unused = set(sd) - used
        if unused:
            raise KeyError(f"unexpected keys in state dict: {sorted(unused)}")

    return new_tree

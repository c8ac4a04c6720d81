r"""Utilities: pytree module system, dtype helpers."""

from .pytree import (  # noqa: F401
    PyTree,
    Static,
    combine,
    filter_jit,
    is_array,
    load_state_dict,
    partition,
    state_dict,
)

r"""Module and dtype utilities.

Capability parity with the reference `azula/nn/utils.py` (221 LoC). Several
reference helpers vanish in JAX:

- `CheckpointReentrant` (`nn/utils.py:74-169`) — :func:`jax.checkpoint` already
  composes with both reverse- and forward-mode AD.
- `skip_init` (`nn/utils.py:172-188`) — construction under
  :func:`jax.eval_shape` produces shape-only modules for free.
- `get_module_device` (`nn/utils.py:45-71`) — JAX arrays carry shardings;
  device movement is a sharding annotation, not module state.
"""

__all__ = [
    "checkpoint",
    "get_module_device",
    "get_module_dtype",
    "promote_dtype",
    "skip_init",
]

import functools
import jax
import jax.numpy as jnp

from collections.abc import Callable

from ..utils.pytree import is_array


def get_module_dtype(module) -> jnp.dtype:
    r"""Returns the data type of a module's first floating-point leaf.

    Equivalent of the reference's `get_module_dtype` (`azula/nn/utils.py:24-42`),
    used to run low-precision backbones inside full-precision sampling math.
    """

    for leaf in jax.tree.leaves(module):
        if is_array(leaf) and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return jnp.asarray(leaf).dtype

    return jnp.float32


def promote_dtype(fn: Callable = None, min_dtype: jnp.dtype = jnp.float32) -> Callable:
    r"""Decorator promoting floating-point array arguments to at least ``min_dtype``.

    The outputs are cast back to the highest input precision. Equivalent of the
    reference's `promote_dtype` (`azula/nn/utils.py:191-221`): used to compute
    normalizations and positional encodings in float32 even when activations are
    bfloat16.
    """

    if fn is None:
        return functools.partial(promote_dtype, min_dtype=min_dtype)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        dtypes = [
            jnp.asarray(a).dtype
            for a in jax.tree.leaves((args, kwargs))
            if is_array(a) or isinstance(a, jax.Array)
        ]
        dtypes = [d for d in dtypes if jnp.issubdtype(d, jnp.floating)]

        if not dtypes:
            return fn(*args, **kwargs)

        in_dtype = jnp.result_type(*dtypes)
        up_dtype = jnp.promote_types(in_dtype, min_dtype)

        def up(a):
            if is_array(a) and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                return jnp.asarray(a, dtype=up_dtype)
            return a

        def down(a):
            if is_array(a) and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                return jnp.asarray(a, dtype=in_dtype)
            return a

        args, kwargs = jax.tree.map(up, (args, kwargs))
        out = fn(*args, **kwargs)

        return jax.tree.map(down, out)

    return wrapper


def checkpoint(f: Callable, reentrant: bool = False) -> Callable:
    r"""Applies activation rematerialization to a function — the JAX-native
    equivalent of the reference's torch checkpointing wrapper
    (`azula/nn/utils.py:119-166`).

    JAX has a single (non-reentrant-like) semantics: gradients flow to every
    input, explicit or captured, and both forward and reverse AD compose. The
    ``reentrant`` flag is accepted for API compatibility and ignored.

    Arguments:
        f: A function.
        reentrant: Ignored (reference-API compatibility).
    """

    del reentrant

    return jax.checkpoint(f)


def skip_init(ctor: Callable, *args, **kwargs):
    r"""Constructs a module without materializing its parameters — the
    JAX-native equivalent of the reference's ``skip_init`` TorchFunctionMode
    (`azula/nn/utils.py:170-187`).

    Returns an *abstract* module (ShapeDtypeStruct leaves); fill it with
    :func:`azula_tpu.utils.pytree.load_state_dict` before use. Unlike the
    reference's context-manager form, this takes the constructor directly —
    tracing, not mode-patching, is how JAX skips work.

    Example:
        >>> layer = skip_init(Linear, 3, 5, key=jax.random.key(0))
    """

    from ..utils.pytree import filter_eval_shape

    return filter_eval_shape(ctor, *args, **kwargs)


def get_module_device(module):
    r"""Returns the device (or sharding) of a module's first array leaf, or
    :py:`None` for abstract/empty modules (reference `azula/nn/utils.py:45-64`;
    in JAX, arrays carry their placement, so this is introspection only)."""

    for leaf in jax.tree.leaves(module):
        if hasattr(leaf, "sharding"):
            devices = getattr(leaf, "devices", None)
            if devices is not None:
                ds = devices() if callable(devices) else devices
                if len(ds) == 1:
                    return next(iter(ds))
            return leaf.sharding

    return None

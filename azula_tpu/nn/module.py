r"""Neural-network module base class.

Replaces `torch.nn.Module` in the reference with a pytree module (see
:mod:`azula_tpu.utils.pytree`): parameters are array leaves, hyperparameters are
static, and modules flow through `jit`/`grad`/`vmap`/`scan` directly.
"""

from __future__ import annotations

__all__ = [
    "Module",
]

import jax

from ..utils.pytree import PyTree, is_array


class Module(PyTree):
    r"""Base class for neural-network modules."""

    def n_params(self) -> int:
        r"""Returns the total number of array elements in the module."""

        return sum(leaf.size for leaf in jax.tree.leaves(self) if is_array(leaf))

    def astype(self, dtype) -> Module:
        r"""Returns a copy of the module with floating-point leaves cast to ``dtype``.

        Equivalent of `torch.nn.Module.to(dtype)` for e.g. bfloat16 inference.
        """
        import jax.numpy as jnp

        def cast(leaf):
            if is_array(leaf) and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                return jnp.asarray(leaf, dtype=dtype)
            return leaf

        return jax.tree.map(cast, self)

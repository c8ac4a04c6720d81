r"""Tracing and profiling helpers.

The reference has almost no observability (a tqdm bar, SURVEY.md §5.1). Here:

- :func:`annotate` — named `jax.profiler` trace regions;
- :class:`Throughput` — a synchronized items/sec counter for benchmark loops
  (value-fetch synchronization works on remote-TPU transports where
  `block_until_ready` returns early);
- :func:`enable_nan_checks` — toggles `jax_debug_nans` (the functional-purity
  equivalent of sanitizers, SURVEY.md §5.2).
"""

from __future__ import annotations

__all__ = [
    "annotate",
    "Throughput",
    "enable_nan_checks",
]

import contextlib
import jax
import jax.numpy as jnp
import time


@contextlib.contextmanager
def annotate(name: str):
    r"""Named trace region visible in `jax.profiler` traces."""

    with jax.profiler.TraceAnnotation(name):
        yield


def _sync(tree) -> None:
    r"""Blocks until the computation behind `tree` has completed."""

    leaves = [leaf for leaf in jax.tree.leaves(tree) if isinstance(leaf, jax.Array)]

    if leaves:
        # A scalar fetch forces completion even on transports where
        # block_until_ready returns before execution finishes.
        jax.device_get(jnp.sum(leaves[0].ravel()[:1]))


class Throughput:
    r"""Synchronized throughput counter.

    .. code-block:: python

        meter = Throughput()
        for batch in batches:
            out = step(batch)
            meter.update(out, items=batch.shape[0])
        print(meter.rate(), "items/sec")
    """

    def __init__(self) -> None:
        self.items = 0
        self.start = None
        self.elapsed = 0.0

    def update(self, result, items: int) -> None:
        if self.start is None:
            self.start = time.perf_counter()

        _sync(result)

        self.items += items
        self.elapsed = time.perf_counter() - self.start

    def rate(self) -> float:
        if not self.elapsed:
            return 0.0
        return self.items / self.elapsed


def enable_nan_checks(enable: bool = True) -> None:
    r"""Toggles JAX's NaN debugging (recompiles jitted functions with checks)."""

    jax.config.update("jax_debug_nans", enable)

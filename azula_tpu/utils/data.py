r"""Host-side input pipeline utilities for TPU training.

The reference has no data-loading layer (its tutorials iterate torch
DataLoaders); on TPU the input pipeline must keep the chip busy: batches
should already be on device (or sharded across the mesh) by the time the
train step needs them. These helpers are deliberately dependency-free —
numpy in, `jax.Array` out:

- :func:`batches` — an epoch iterator over host arrays (shuffle, drop-last);
- :func:`prefetch_to_device` — asynchronously stages the next ``size``
  batches onto device (or a mesh sharding) while the current step runs,
  overlapping host→HBM transfer with compute;
- :func:`epochs` — the composition, mirroring the reference tutorial's
  training loop shape (`/root/reference/docs/tutorials/mnist.ipynb`).
"""

from __future__ import annotations

__all__ = [
    "batches",
    "epochs",
    "prefetch_to_device",
    "process_shard",
]

import collections
import itertools

import jax
import numpy as np

from collections.abc import Iterable, Iterator


def process_shard(data, index: int | None = None, count: int | None = None):
    r"""Returns this host's contiguous shard of a dataset (multi-host data
    loading: each process feeds its own slice of the global batch).

    .. code-block:: python

        local = process_shard(x_train)          # on every host, after
        for batch in epochs(local, per_host_bs, key=key):  # initialize_distributed()
            ...

    Arguments:
        data: A pytree of arrays with a shared leading dimension.
        index: The process index (defaults to :func:`jax.process_index`).
        count: The process count (defaults to :func:`jax.process_count`).
    """

    if index is None:
        index = jax.process_index()
    if count is None:
        count = jax.process_count()

    n = jax.tree.leaves(data)[0].shape[0]
    per = n // count

    if per == 0:
        raise ValueError(f"dataset of {n} examples cannot shard over {count} processes")

    return jax.tree.map(lambda x: x[index * per : (index + 1) * per], data)


def batches(
    data,
    batch_size: int,
    *,
    key=None,
    drop_last: bool = True,
) -> Iterator:
    r"""Iterates over mini-batches of a pytree of host arrays.

    Arguments:
        data: A pytree of arrays with a shared leading (example) dimension.
        batch_size: The batch size.
        key: An optional PRNG key; when given, examples are shuffled.
        drop_last: Whether to drop the final ragged batch (keeps shapes
            static under ``jit`` — recommended on TPU).
    """

    leaves = jax.tree.leaves(data)
    n = leaves[0].shape[0]

    if drop_last and batch_size > n:
        raise ValueError(
            f"batch_size {batch_size} exceeds the dataset size {n}; with "
            "drop_last this would yield no batches"
        )

    if key is not None:
        perm = np.asarray(jax.random.permutation(key, n))
    else:
        perm = np.arange(n)

    stop = n - batch_size + 1 if drop_last else n

    for start in range(0, stop, batch_size):
        idx = perm[start : start + batch_size]
        yield jax.tree.map(lambda x: x[idx], data)


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    r"""Stages batches onto device ahead of consumption.

    ``jax.device_put`` is asynchronous, so holding a small queue of
    already-transferred batches overlaps host→HBM copies with the running
    step. With a ``sharding`` (e.g. from
    :func:`azula_tpu.parallel.data_sharding`), batches land directly
    distributed across the mesh.

    Arguments:
        iterator: An iterator of host batch pytrees.
        size: The queue depth (2 is enough to hide the copy).
        sharding: An optional :class:`jax.sharding.Sharding` for the batches.
    """

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    it = iter(iterator)

    if size <= 0:  # prefetching disabled: plain staging
        for batch in it:
            yield put(batch)
        return

    queue = collections.deque()
    done = object()  # exhaustion sentinel (None is a valid batch pytree)

    for batch in itertools.islice(it, size):
        queue.append(put(batch))

    while queue:
        yield queue.popleft()

        batch = next(it, done)
        if batch is not done:
            queue.append(put(batch))


def epochs(
    data,
    batch_size: int,
    *,
    key,
    num_epochs: int | None = None,
    sharding=None,
    prefetch: int = 2,
) -> Iterator:
    r"""Shuffled, device-prefetched epochs over a host dataset.

    .. code-block:: python

        for batch in epochs(x_train, 256, key=key, num_epochs=16,
                            sharding=data_sharding(mesh)):
            params, opt_state, loss = step(params, opt_state, batch, ...)

    Arguments:
        data: A pytree of host arrays with a shared leading dimension.
        batch_size: The batch size.
        key: A PRNG key driving the per-epoch shuffles.
        num_epochs: The number of epochs (:py:`None` for an endless stream).
        sharding: An optional sharding for the staged batches.
        prefetch: The device-side queue depth.
    """

    def stream():
        counter = itertools.count() if num_epochs is None else range(num_epochs)
        for epoch in counter:
            yield from batches(data, batch_size, key=jax.random.fold_in(key, epoch))

    return prefetch_to_device(stream(), size=prefetch, sharding=sharding)

r"""Device meshes and sharding rules.

First-class TPU-native component (no reference equivalent — the reference is
single-device, SURVEY.md §2.8): constructs :class:`jax.sharding.Mesh` over
ICI/DCN and provides the sharding rules used by samplers, training steps and
the benchmark harness:

- **data parallel**: the batch axis of sampler state :math:`(B, *)` shards over
  the `'data'` mesh axis — batch sampling is embarrassingly parallel over ICI;
- **tensor parallel**: optional `'model'` axis for backbone matmul shardings
  (see :func:`azula_tpu.parallel.tp.shard_dit`).

XLA emits all collectives from the sharded `jit` program; there is no
hand-written communication.
"""

from __future__ import annotations

__all__ = [
    "make_mesh",
    "get_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
]

import jax
import numpy as np

from collections.abc import Sequence
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    r"""Creates a `('data', 'model')` device mesh.

    Arguments:
        data: The data-parallel axis size. Defaults to `n_devices / model`.
        model: The tensor-parallel axis size. Keep the `'model'` axis innermost
            so tensor-parallel collectives ride the fastest ICI links.
        devices: The devices to use. Defaults to all local devices.

    Returns:
        A :class:`jax.sharding.Mesh` with axes `('data', 'model')`.
    """

    if devices is None:
        devices = jax.devices()

    if data is None:
        data = len(devices) // model

    assert data * model == len(devices), (
        f"mesh size {data}x{model} != device count {len(devices)}"
    )

    return Mesh(
        np.asarray(devices).reshape(data, model),
        axis_names=("data", "model"),
    )


def get_mesh() -> Mesh:
    r"""Returns a data-parallel mesh over all local devices."""

    return make_mesh()


def data_sharding(mesh: Mesh) -> NamedSharding:
    r"""Returns the sharding of batched tensors: batch over `'data'`, everything
    else replicated."""

    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    r"""Returns the fully replicated sharding (parameters in pure data parallel)."""

    return NamedSharding(mesh, P())


def shard_batch(x: Array, mesh: Mesh | None = None) -> Array:
    r"""Shards the leading (batch) axis of an array — or of every array leaf of a
    pytree — over the mesh's `'data'` axis."""

    if mesh is None:
        mesh = get_mesh()

    sharding = data_sharding(mesh)

    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), x)

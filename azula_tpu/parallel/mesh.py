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
    "initialize_distributed",
    "make_mesh",
    "make_hybrid_mesh",
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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    r"""Initializes the multi-host JAX runtime (SURVEY.md §2.8: the framework
    owns `jax.distributed.initialize`).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly on other platforms. Idempotent: repeated calls are no-ops.
    """

    import jax.distributed

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        # jax wordings vary by version: "...is already initialized" /
        # "distributed.initialize should only be called once".
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def make_hybrid_mesh(
    data: int | None = None,
    model: int = 1,
    replica: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    r"""Creates a `('replica', 'data', 'model')` mesh for multi-slice / multi-host
    topologies: the outer `'replica'` axis maps across slices (DCN — keep only
    gradient/EMA all-reduces on it), while `'data'`/`'model'` stay inside a
    slice (ICI).

    Falls back to a process-major device ordering when slice metadata is
    unavailable (e.g. CPU meshes in tests), which preserves the
    DCN-outer/ICI-inner property: devices of one process stay contiguous in
    the inner axes.

    Arguments:
        data: Per-replica data-parallel size. Defaults to
            `n_devices / (replica * model)`.
        model: Tensor-parallel size (innermost — fastest ICI links).
        replica: The cross-slice axis size. Defaults to the number of slices
            (or processes).
        devices: The devices to use. Defaults to all devices (multi-host:
            `jax.devices()` is global).
    """

    if devices is None:
        devices = jax.devices()

    devices = list(devices)

    # group by slice (TPU multi-slice) or process, preserving locality
    def slice_key(d):
        return (
            getattr(d, "slice_index", None) or 0,
            getattr(d, "process_index", 0),
            d.id,
        )

    devices.sort(key=slice_key)

    if replica is None:
        slices = {slice_key(d)[:1] for d in devices}
        processes = {getattr(d, "process_index", 0) for d in devices}
        replica = len(slices) if len(slices) > 1 else max(len(processes), 1)

    if data is None:
        data = len(devices) // (replica * model)

    assert replica * data * model == len(devices), (
        f"mesh {replica}x{data}x{model} != device count {len(devices)}"
    )

    return Mesh(
        np.asarray(devices).reshape(replica, data, model),
        axis_names=("replica", "data", "model"),
    )

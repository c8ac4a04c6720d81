r"""Pod-scale batch sampling.

The BASELINE.json north-star workload: embarrassingly-parallel image generation
with the batch sharded over the mesh's `data` axis — ICI carries no traffic
during the reverse scan, every chip runs its shard of the batch.
"""

from __future__ import annotations

__all__ = [
    "sample_sharded",
]

import jax

from collections.abc import Sequence
from jax import Array
from jax.sharding import Mesh

from .mesh import get_mesh, shard_batch


def sample_sharded(
    sampler,
    shape: Sequence[int],
    key: Array,
    mesh: Mesh | None = None,
    mean: float | Array = 0.0,
    var: float | Array = 1.0,
    **kwargs,
) -> Array:
    r"""Draws a batch of samples with the batch axis sharded over `data`.

    Arguments:
        sampler: A :class:`azula_tpu.sample.Sampler`.
        shape: The batch shape :math:`(B, *)`; :math:`B` should be divisible by
            the `data` axis size.
        key: A PRNG key (split between initialization and the reverse process).
        mesh: The device mesh. Defaults to a data-parallel mesh over all
            local devices.
        kwargs: Conditioning forwarded to the denoiser at every step.

    Returns:
        Samples with shape :math:`(B, *)`, distributed over the mesh.
    """

    if mesh is None:
        mesh = get_mesh()

    k_init, k_run = jax.random.split(key)

    x1 = sampler.init(k_init, shape)
    x1 = shard_batch(x1, mesh)

    # Array-valued conditioning shards alongside the batch when batched;
    # everything else replicates
    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == shape[0]:
            return shard_batch(leaf, mesh)
        return leaf

    kwargs = {k: jax.tree.map(place, v) for k, v in kwargs.items()}

    run_key = k_run if sampler.requires_key else None

    return sampler(x1, key=run_key, **kwargs)

r"""Ulysses attention — sequence parallelism by head/sequence transposition.

The complement to :mod:`azula_tpu.parallel.ring`: instead of streaming K/V
blocks around the ring (:math:`n - 1` `ppermute` hops, online softmax), two
`all_to_all` collectives reshard the activations from *sequence-sharded* to
*head-sharded* and back. In between, every device runs ordinary **full local
attention** over the whole sequence for its subset of heads — which on TPU
means the measured single-chip path (the Pallas flash kernels or XLA's fused
attention, whichever the dispatch picks), not a hand-rolled loop.

Trade-offs vs ring attention (both exact):

- Ulysses moves :math:`3 L_\mathrm{local} \cdot C` bytes per device twice
  through `all_to_all`; ring moves :math:`2 L \cdot C` through
  :math:`n - 1` hops. On an ICI torus both ride neighbor links, but Ulysses
  issues 2 collectives instead of :math:`n - 1` and keeps the softmax
  single-pass — better for *short-per-device* sequences where the ring's
  per-hop latency dominates.
- Ulysses requires :math:`H \bmod n = 0` (heads divide over devices); ring
  has no head constraint but holds the full :math:`O(L_\mathrm{local} \cdot L)`
  logits tile only blockwise.

Reference: no equivalent (the reference is single-device); the pattern is
DeepSpeed-Ulysses.

References:
    | DeepSpeed Ulysses: System Optimizations for Enabling Training of Extreme
      Long Sequence Transformer Models (Jacobs et al., 2023)
    | https://arxiv.org/abs/2309.14509
"""

from __future__ import annotations

__all__ = [
    "ulysses_attention",
    "ulysses_attention_local",
]

import jax
import math

from jax import Array
from jax.sharding import Mesh, PartitionSpec as P


def _ulysses_body(axis_name: str, scale: float):
    def local_attention(q: Array, k: Array, v: Array) -> Array:
        from ..ops.attention import dot_product_attention

        n = jax.lax.psum(1, axis_name)

        H = q.shape[1]
        if H % n != 0:
            raise ValueError(
                f"Ulysses attention needs heads ({H}) divisible by the "
                f"'{axis_name}' axis size ({n}); use ring attention otherwise."
            )

        def gather_seq(x):
            # (B, H, L_local, D) -> (B, H / n, L, D): scatter heads, gather
            # sequence — one all_to_all on the ICI.
            return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

        q, k, v = gather_seq(q), gather_seq(k), gather_seq(v)

        o = dot_product_attention(q, k, v, scale=scale)

        # (B, H / n, L, D) -> (B, H, L_local, D): back to sequence shards
        return jax.lax.all_to_all(o, axis_name, split_axis=2, concat_axis=1, tiled=True)

    return local_attention


def ulysses_attention_local(
    q: Array,
    k: Array,
    v: Array,
    axis: str,
    scale: float | None = None,
) -> Array:
    r"""Ulysses attention on *local shards*, for use inside an enclosing
    `shard_map` whose ``axis`` shards the sequence dimension.

    This is the model-layer entry point — a sequence-sharded backbone (e.g. a
    :class:`azula_tpu.nn.dit.DiT` with ``implementation='ulysses'``) calls
    this from every :class:`~azula_tpu.nn.attention.MultiheadSelfAttention`
    with its local :math:`(B, H, L_\mathrm{local}, D)` blocks. For a
    standalone call on globally-sharded arrays use :func:`ulysses_attention`.

    Arguments:
        q: Local queries, with shape :math:`(B, H, L_\mathrm{local}, D)`.
        k: Local keys, same shape.
        v: Local values, same shape.
        axis: The manual-mesh axis name carrying the sequence shards.
        scale: Logit scale; defaults to :math:`1/\sqrt{D}`.

    Returns:
        The local attention output, with shape :math:`(B, H, L_\mathrm{local}, D)`.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    return _ulysses_body(axis, scale)(q, k, v)


def ulysses_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
) -> Array:
    r"""Computes exact attention with the sequence axis sharded over the mesh,
    resharding to head parallelism with `all_to_all` (DeepSpeed-Ulysses).

    Arguments:
        q: Queries, with shape :math:`(B, H, L, D)`; :math:`L` sharded over ``axis``.
        k: Keys, same shape/sharding.
        v: Values, same shape/sharding.
        mesh: The device mesh.
        axis: The mesh axis name carrying the sequence shards.
        scale: Logit scale; defaults to :math:`1/\sqrt{D}`.

    Returns:
        The attention output, sequence-sharded like the inputs.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    spec = P(None, None, axis, None)

    fn = jax.shard_map(
        _ulysses_body(axis, scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )

    return fn(q, k, v)

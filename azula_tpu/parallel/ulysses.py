r"""Ulysses attention — sequence parallelism by head/sequence transposition.

The complement to :mod:`azula_tpu.parallel.ring`: instead of streaming K/V
blocks around the ring (:math:`n - 1` `ppermute` hops, online softmax), two
`all_to_all` collectives reshard the activations from *sequence-sharded* to
*head-sharded* and back. In between, every device runs ordinary **full local
attention** over the whole sequence for its subset of heads — which on TPU
means the measured single-chip path (the Pallas flash kernels or XLA's fused
attention, whichever the dispatch picks), not a hand-rolled loop.

Because the per-device attention sees the *whole* sequence, masks and dropout
compose with no extra machinery: a head-broadcast mask (shape :math:`(L, L)`
or :math:`(B, 1, L, L)`) applies as-is after the reshard, and dropout draws an
independent key per head-shard (`fold_in` of the device's axis index) — the
exact semantics of single-device attention over the same head partition. This
is the supported SP path for masked/dropout attention; ring attention supports
masks (sliced per hop) but rejects dropout (see :mod:`azula_tpu.parallel.ring`).

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


def _ulysses_body(axis_name: str, scale: float, dropout_rate: float = 0.0):
    def local_attention(q: Array, k: Array, v: Array, mask=None, key=None) -> Array:
        from ..ops.attention import dot_product_attention

        n = jax.lax.psum(1, axis_name)

        H = q.shape[1]
        if H % n != 0:
            raise ValueError(
                f"Ulysses attention needs heads ({H}) divisible by the "
                f"'{axis_name}' axis size ({n}); use ring attention otherwise."
            )

        if mask is not None and mask.ndim >= 3 and mask.shape[-3] != 1:
            raise ValueError(
                "Ulysses attention requires a head-broadcast mask — shape "
                "(L, L) or (*, 1, L, L) — since heads are sharded during the "
                f"attention product; got {mask.shape}."
            )

        def gather_seq(x):
            # (B, H, L_local, D) -> (B, H / n, L, D): scatter heads, gather
            # sequence — one all_to_all on the ICI.
            return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

        q, k, v = gather_seq(q), gather_seq(k), gather_seq(v)

        if key is not None and dropout_rate > 0:
            # An independent key per head-shard: the same semantics as a
            # single device running these heads with this key.
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        o = dot_product_attention(
            q,
            k,
            v,
            mask=mask,
            dropout_rate=dropout_rate if key is not None else 0.0,
            key=key,
            scale=scale,
        )

        # (B, H / n, L, D) -> (B, H, L_local, D): back to sequence shards
        return jax.lax.all_to_all(o, axis_name, split_axis=2, concat_axis=1, tiled=True)

    return local_attention


def ulysses_attention_local(
    q: Array,
    k: Array,
    v: Array,
    axis: str,
    scale: float | None = None,
    mask: Array | None = None,
    dropout_rate: float = 0.0,
    key: Array | None = None,
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
        mask: An optional head-broadcast boolean mask over the *global*
            sequence, with shape :math:`(L, L)` or :math:`(*, 1, L, L)`,
            replicated across the ``axis`` shards.
        dropout_rate: Attention-weight dropout probability.
        key: A PRNG key (replicated across shards); required for dropout.

    Returns:
        The local attention output, with shape :math:`(B, H, L_\mathrm{local}, D)`.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    return _ulysses_body(axis, scale, dropout_rate)(q, k, v, mask=mask, key=key)


def ulysses_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
    mask: Array | None = None,
    dropout_rate: float = 0.0,
    key: Array | None = None,
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
        mask: An optional head-broadcast boolean mask, shape :math:`(L, L)` or
            :math:`(*, 1, L, L)`, replicated over the mesh.
        dropout_rate: Attention-weight dropout probability.
        key: A PRNG key; required for dropout.

    Returns:
        The attention output, sequence-sharded like the inputs.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    spec = P(None, None, axis, None)

    args = [q, k, v]
    specs = [spec, spec, spec]
    has_mask, has_key = mask is not None, key is not None

    if has_mask:
        args.append(mask)
        specs.append(P(*(None,) * mask.ndim))  # replicated
    if has_key:
        args.append(key)
        specs.append(P())

    def body(q, k, v, *rest):
        it = iter(rest)
        m = next(it) if has_mask else None
        kk = next(it) if has_key else None
        return _ulysses_body(axis, scale, dropout_rate)(q, k, v, mask=m, key=kk)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=spec,
    )

    return fn(*args)

r"""Ring attention — sequence-parallel attention over the device mesh.

First-class TPU-native component with no reference equivalent (SURVEY.md §5.7
documents sequence parallelism as the extension point once image token counts
exceed one chip — e.g. video or >1K-resolution latents).

Queries, keys and values are sharded along the *sequence* axis across devices;
each device holds its query block and streams K/V blocks around the ring with
`jax.lax.ppermute`, accumulating with an online softmax. Communication is
overlapped by XLA and rides the ICI ring; memory per device is
:math:`O(L_\mathrm{local})`.

Composition contract (SP hardening, VERDICT r3 #10):

- **Masks**: supported. A replicated boolean mask over the global sequence
  (:math:`(L, L)` or :math:`(*, 1, L, L)`) is sliced per hop — at step
  :math:`i`, device :math:`r` holds the K/V block that originated on device
  :math:`(r - i) \bmod n`, so the mask tile is
  ``mask[.., r·L_loc : (r+1)·L_loc, j·L_loc : (j+1)·L_loc]``.
- **Dropout**: rejected by design. Per-weight dropout would need a
  per-(query-block, key-block) counter scheme coordinated with the backward's
  recomputation across hops; Ulysses attention (full local attention per head
  shard) composes with dropout exactly, so masked/dropout training at long
  context routes there (`azula_tpu.parallel.ulysses`).

References:
    | Ring Attention with Blockwise Transformers for Near-Infinite Context (Liu et al., 2023)
    | https://arxiv.org/abs/2310.01889
"""

from __future__ import annotations

__all__ = [
    "ring_attention",
    "ring_attention_local",
]

import functools
import jax
import jax.numpy as jnp
import math

from jax import Array
from jax.sharding import Mesh, PartitionSpec as P


_MASKED_OUT = -1e30  # finite large-negative logit for masked positions


def _ring_body(axis_name: str, scale: float):
    def local_attention(q: Array, k: Array, v: Array, mask: Array | None = None) -> Array:
        n = jax.lax.psum(1, axis_name)

        B, H, Lq, D = q.shape

        if mask is not None:
            if mask.ndim >= 3 and mask.shape[-3] != 1:
                raise ValueError(
                    "ring attention requires a head-broadcast mask — shape "
                    f"(L, L) or (*, 1, L, L); got {mask.shape}"
                )
            r = jax.lax.axis_index(axis_name)
            rows = jax.lax.dynamic_slice_in_dim(mask, r * Lq, Lq, axis=mask.ndim - 2)

        # Dots run in the *input* dtype with float32 accumulation
        # (``preferred_element_type``): for bf16 operands this is the MXU's
        # native bf16-in/f32-accumulate mode — bit-identical to upcasting the
        # operands to f32 first, at 8x the fp32 matmul rate on v5e. Softmax
        # statistics (m, l) and the output accumulator stay f32.
        acc = jnp.float32

        # Derive accumulators from q so they carry the shard_map axis-varying
        # type of the inputs
        m = jnp.full_like(q[..., :1], -jnp.inf, dtype=acc)
        l = jnp.zeros_like(q[..., :1], dtype=acc)
        o = jnp.zeros_like(q, dtype=acc)

        def step(i, carry):
            k_blk, v_blk, m, l, o = carry

            logits = (
                jnp.einsum("bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=acc)
                * scale
            )

            if mask is not None:
                # The K/V block at step i originated on device (r - i) mod n.
                r = jax.lax.axis_index(axis_name)
                j = jax.lax.rem(r - i + n, n)
                Lk = k_blk.shape[2]
                tile = jax.lax.dynamic_slice_in_dim(
                    rows, j * Lk, Lk, axis=rows.ndim - 1
                )  # (..., Lq, Lk), broadcasts against (B, H, Lq, Lk)
                logits = jnp.where(tile, logits, _MASKED_OUT)

            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m - m_new)

            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            # PV weights round to the operand dtype (the standard flash
            # trade); exact when the inputs are f32.
            o = o * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(q.dtype), v_blk, preferred_element_type=acc
            )

            # Pass K/V to the next device in the ring
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

            return k_blk, v_blk, m_new, l, o

        _, _, _, l, o = jax.lax.fori_loop(0, n, step, (k, v, m, l, o))

        return (o / l).astype(q.dtype)

    return local_attention


def ring_attention_local(
    q: Array,
    k: Array,
    v: Array,
    axis: str,
    scale: float | None = None,
    mask: Array | None = None,
) -> Array:
    r"""Ring attention on *local shards*, for use inside an enclosing
    `shard_map` whose ``axis`` shards the sequence dimension.

    This is the model-layer entry point: a sequence-sharded backbone (e.g. a
    :class:`azula_tpu.nn.dit.DiT` with ``implementation='ring'``) runs its
    entire forward under one `shard_map`, and each
    :class:`~azula_tpu.nn.attention.MultiheadSelfAttention` calls this with
    its local :math:`(B, H, L_\mathrm{local}, D)` blocks. For a standalone
    call on globally-sharded arrays use :func:`ring_attention`, which wraps
    this in its own `shard_map`.

    Arguments:
        q: Local queries, with shape :math:`(B, H, L_\mathrm{local}, D)`.
        k: Local keys, same shape.
        v: Local values, same shape.
        axis: The manual-mesh axis name carrying the sequence shards.
        scale: Logit scale; defaults to :math:`1/\sqrt{D}`.
        mask: An optional head-broadcast boolean mask over the *global*
            sequence (:math:`(L, L)` or :math:`(*, 1, L, L)`), replicated
            across the ``axis`` shards; sliced per hop (module docstring).

    Returns:
        The local attention output, with shape :math:`(B, H, L_\mathrm{local}, D)`.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    return _ring_body(axis, scale)(q, k, v, mask=mask)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
    mask: Array | None = None,
) -> Array:
    r"""Computes exact attention with the sequence axis sharded over the mesh.

    Arguments:
        q: Queries, with shape :math:`(B, H, L, D)`; :math:`L` sharded over ``axis``.
        k: Keys, same shape/sharding.
        v: Values, same shape/sharding.
        mesh: The device mesh.
        axis: The mesh axis name carrying the sequence shards.
        scale: Logit scale; defaults to :math:`1/\sqrt{D}`.
        mask: An optional head-broadcast boolean mask (:math:`(L, L)` or
            :math:`(*, 1, L, L)`), replicated over the mesh.

    Returns:
        The attention output, sequence-sharded like the inputs.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    spec = P(None, None, axis, None)

    args = [q, k, v]
    specs = [spec, spec, spec]
    if mask is not None:
        args.append(mask)
        specs.append(P(*(None,) * mask.ndim))  # replicated

    def body(q, k, v, *rest):
        return _ring_body(axis, scale)(q, k, v, mask=rest[0] if rest else None)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=spec,
    )

    return fn(*args)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _jit_ring(q, k, v, mesh, axis):
    return ring_attention(q, k, v, mesh, axis)

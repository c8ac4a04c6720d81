r"""Ring attention — sequence-parallel attention over the device mesh.

First-class TPU-native component with no reference equivalent (SURVEY.md §5.7
documents sequence parallelism as the extension point once image token counts
exceed one chip — e.g. video or >1K-resolution latents).

Queries, keys and values are sharded along the *sequence* axis across devices;
each device holds its query block and streams K/V blocks around the ring with
`jax.lax.ppermute`, accumulating with an online softmax. Communication is
overlapped by XLA and rides the ICI ring; memory per device is
:math:`O(L_\mathrm{local})`.

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


def _ring_body(axis_name: str, scale: float):
    def local_attention(q: Array, k: Array, v: Array) -> Array:
        n = jax.lax.psum(1, axis_name)

        B, H, Lq, D = q.shape

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

    Returns:
        The local attention output, with shape :math:`(B, H, L_\mathrm{local}, D)`.
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    return _ring_body(axis, scale)(q, k, v)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
) -> Array:
    r"""Computes exact attention with the sequence axis sharded over the mesh.

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
        _ring_body(axis, scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )

    return fn(q, k, v)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _jit_ring(q, k, v, mesh, axis):
    return ring_attention(q, k, v, mesh, axis)

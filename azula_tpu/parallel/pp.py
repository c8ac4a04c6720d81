r"""Pipeline parallelism: GPipe-style microbatched execution of a block stack
over a mesh axis.

First-class TPU-native component (SURVEY.md §2.8 — the reference has no
multi-device support at all). A transformer is a stack of :math:`L`
identical blocks; :func:`pipeline_blocks` places :math:`L/S` consecutive
blocks on each of the :math:`S` devices of a mesh axis and streams
:math:`M` microbatches through the stages. Activations move stage-to-stage
with a single `ppermute` per tick (ICI neighbor traffic only); the schedule
is the classic :math:`M + S - 1`-tick GPipe fill-and-drain, expressed as one
`lax.fori_loop` inside `shard_map` so the whole pipeline is a single compiled
SPMD program.

This trades :math:`(S-1)/(M+S-1)` bubble overhead for an :math:`S`-fold
reduction in per-device parameter memory — the alternative to tensor
parallelism (:mod:`azula_tpu.parallel.tp`) when a model's blocks fit a chip
but the stack does not, or when the ICI all-reduce of TP is the bottleneck.

References:
    | GPipe: Efficient Training of Giant Neural Networks using Pipeline Parallelism (Huang et al., 2019)
    | https://arxiv.org/abs/1811.06965
"""

from __future__ import annotations

__all__ = [
    "pipeline_blocks",
    "stack_modules",
]

import jax
import jax.numpy as jnp

from collections.abc import Callable, Sequence
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.pytree import combine, partition


def _pvary(x, axes):
    r"""Marks an array as varying over manual axes, across jax versions
    (`pcast` replaces the deprecated `pvary`; older versions need neither)."""

    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axes, to="varying")
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, axes)
    return x


def stack_modules(modules: Sequence):
    r"""Stacks structurally identical modules into a scan/pipeline layout.

    Turns a list of :math:`L` modules (e.g. the transformer blocks of a DiT)
    into ``(params, apply)`` where ``params`` array leaves carry a leading
    :math:`L` dimension and ``apply(block_params, x, *args)`` runs one block —
    the form :func:`pipeline_blocks` (and `lax.scan`) consume.

    Arguments:
        modules: Structurally identical modules (same static half).

    Returns:
        The ``(params, apply)`` pair.
    """

    parts = [partition(m) for m in modules]
    arrays, static = parts[0]

    for _, other in parts[1:]:
        assert other == static, "modules are not structurally identical"

    stacked = [
        None if a is None else jnp.stack([p[0][i] for p in parts])
        for i, a in enumerate(arrays)
    ]

    def apply(block_params, x, *args, **kwargs):
        return combine(block_params, static)(x, *args, **kwargs)

    return stacked, apply


def pipeline_blocks(
    block_fn: Callable,
    params,
    x,
    mesh: Mesh,
    axis: str = "model",
    microbatches: int | None = None,
    consts=(),
):
    r"""Applies a stack of identical blocks to ``x`` as a pipeline over a mesh
    axis.

    Equivalent to ``for i in range(L): x = block_fn(params[i], x, *consts)``
    with the :math:`L` blocks split into :math:`S` contiguous stages, one per
    device of the ``axis``.

    Arguments:
        block_fn: The per-block function
            ``block_fn(block_params, x, *consts) -> x``; must preserve the
            structure and shapes of ``x``.
        params: A pytree whose array leaves carry a leading block dimension
            :math:`L` (a stacked scan layout), with :math:`L` divisible by the
            axis size.
        x: The batched input — an array or a pytree of arrays, every leaf with
            a shared leading batch dimension :math:`B` divisible by
            ``microbatches``. Non-array per-microbatch state (a modulation
            vector, a position tensor) rides along as extra pytree leaves and
            is streamed stage-to-stage with the activation.
        mesh: The device mesh.
        axis: The mesh axis to pipeline over.
        microbatches: The number of microbatches :math:`M` (defaults to the
            axis size). Larger :math:`M` shrinks the pipeline bubble
            :math:`(S-1)/(M+S-1)`.
        consts: A tuple/list of pytrees shared by every microbatch (e.g.
            unbatched positions). Replicated to all stages once — never
            streamed — and unpacked as positional arguments to ``block_fn``
            after the state (``block_fn(params, x, *consts)``), so it must be
            a sequence: a dict would unpack to its keys, a bare array along
            its leading axis.

    Returns:
        The output, matching the structure and shapes of ``x``, replicated
        over the axis.
    """

    assert isinstance(consts, (tuple, list)), (
        "consts must be a tuple/list of pytrees (it is unpacked as "
        "positional block_fn arguments)"
    )

    S = mesh.shape[axis]
    M = S if microbatches is None else microbatches

    L = jax.tree.leaves(params)[0].shape[0]
    B = jax.tree.leaves(x)[0].shape[0]

    assert L % S == 0, f"block count {L} must divide into {S} stages"
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    assert all(a.shape[0] == B for a in jax.tree.leaves(x)), (
        "all state leaves must share the leading batch dimension"
    )

    # (L, ...) -> (S, L/S, ...): stage-major, contiguous blocks per stage
    staged = jax.tree.map(lambda p: p.reshape(S, L // S, *p.shape[1:]), params)
    xm = jax.tree.map(lambda a: a.reshape(M, B // M, *a.shape[1:]), x)

    def device_fn(staged, xm, consts):
        # staged leaves: (1, L/S, ...); xm leaves: (M, B/M, ...)
        s = jax.lax.axis_index(axis)

        local = jax.tree.map(lambda p: p[0], staged)

        def stage_apply(h):
            def body(h, block):
                return block_fn(block, h, *consts), None

            h, _ = jax.lax.scan(body, h, local)
            return h

        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(t, carry):
            state, outputs = carry

            # receive the previous stage's activation; stage 0 injects
            # microbatch t instead (the wrap-around value is discarded)
            shifted = jax.lax.ppermute(state, axis, perm)
            mb = jnp.clip(t, 0, M - 1)
            state = jax.tree.map(
                lambda inj, sh: jnp.where(s == 0, inj[mb], sh), xm, shifted
            )

            # Stage s holds real data only during ticks s <= t < s + M; skip
            # the block applications on fill/drain garbage (saves ~(S-1)/(M+S-1)
            # of the stage FLOPs; the per-device predicate is scalar, so this
            # is a genuine conditional, not a select)
            valid = (t >= s) & (t < s + M)
            state = jax.lax.cond(valid, stage_apply, lambda h: h, state)

            # the last stage finishes microbatch t - (S - 1)
            out_idx = t - (S - 1)
            valid = (s == S - 1) & (out_idx >= 0)
            slot = jnp.clip(out_idx, 0, M - 1)
            outputs = jax.tree.map(
                lambda o, st: jnp.where(valid, o.at[slot].set(st), o),
                outputs,
                state,
            )

            return state, outputs

        # mark the carries as device-varying (they mix in axis_index/ppermute)
        state = jax.tree.map(lambda a: _pvary(jnp.zeros_like(a[0]), (axis,)), xm)
        outputs = jax.tree.map(lambda a: _pvary(jnp.zeros_like(a), (axis,)), xm)

        _, outputs = jax.lax.fori_loop(0, M + S - 1, tick, (state, outputs))

        # results live on the last stage; zero elsewhere and psum to replicate
        outputs = jax.tree.map(
            lambda o: jnp.where(s == S - 1, o, jnp.zeros_like(o)), outputs
        )
        return jax.lax.psum(outputs, axis)

    spec_p = jax.tree.map(lambda _: P(axis), staged)

    out = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(spec_p, P(), P()),
        out_specs=P(),
    )(staged, xm, consts)

    return jax.tree.map(lambda o, a: o.reshape(B, *a.shape[1:]), out, x)

r"""Model-family pipeline-parallel recipes.

:mod:`azula_tpu.parallel.pp` provides the generic GPipe machinery
(:func:`pipeline_blocks`); this module binds it to concrete model families so
a user gets a pipelined forward in one call instead of hand-splitting a
model. The first recipe covers the DiT family (reference architecture:
`azula/nn/dit.py:137-218`): the patch/position embedding and the output
projection are tiny and run replicated on every stage, while the transformer
block stack — all of the FLOPs — is pipelined over a mesh axis.

The recipe streams exactly what varies per microbatch (the token activations
and, when batched, the modulation and position tensors) and replicates what
does not (unbatched or broadcastable modulation/position) via the ``consts``
channel of :func:`pipeline_blocks`, so ppermute traffic stays one activation
tensor per tick.
"""

from __future__ import annotations

__all__ = [
    "pipeline_dit",
]

import jax.numpy as jnp

from collections.abc import Callable
from jax import Array
from jax.sharding import Mesh

from ..nn.dit import DiT
from .pp import pipeline_blocks, stack_modules


def pipeline_dit(
    dit: DiT,
    mesh: Mesh,
    axis: str = "model",
    microbatches: int | None = None,
) -> Callable:
    r"""Builds a pipeline-parallel forward for a :class:`azula_tpu.nn.dit.DiT`.

    The returned function matches ``dit(x, mod, pos, cond)`` (inference path;
    dropout keys are not threaded through the pipeline) with the
    ``hid_blocks`` transformer blocks split into contiguous stages over the
    ``axis`` devices of ``mesh``. Differentiable: gradients flow back through
    the ppermute schedule, so the recipe serves training as well as serving.

    Arguments:
        dit: The DiT module. The axis size must divide its block count.
        mesh: The device mesh.
        axis: The mesh axis to pipeline over.
        microbatches: Microbatch count (defaults to the axis size); the
            leading batch dimension of ``x`` must divide by it.

    Returns:
        ``forward(x, mod=None, pos=None, cond=None)`` — output equals the
        sequential ``dit`` forward, replicated over the axis.
    """

    stacked, apply = stack_modules(dit.blocks)

    def forward(
        x: Array,
        mod: Array | None = None,
        pos: Array | None = None,
        cond: Array | None = None,
    ) -> Array:
        if cond is not None:
            x = jnp.concatenate((x, cond), axis=-1)

        h = dit.in_proj(x)

        if pos is None:
            pos = jnp.arange(h.shape[-2], dtype=h.dtype)[..., None]

        emb = dit.pos_encoding(pos)
        emb = emb.reshape(*emb.shape[:-2], -1)
        h = h + dit.pos_proj(emb)

        # Stream per-microbatch state; replicate microbatch-invariant tensors.
        # A tensor is streamed only when its leading dimension IS the batch —
        # broadcastable shapes like a (1, D) modulation or an unbatched
        # (L, P) position are microbatch-invariant and ride in the consts
        # channel (matching the sequential forward's broadcasting semantics).
        B = h.shape[0]
        stream = {"h": h}
        consts = {}

        if pos.ndim > 2 and pos.shape[0] == B:
            stream["pos"] = pos
        else:
            consts["pos"] = pos

        if mod is not None:
            if mod.ndim > 1 and mod.shape[0] == B:
                stream["mod"] = mod
            else:
                consts["mod"] = mod

        def block_fn(block_params, state, consts):
            bound = {**consts, **state}
            h = apply(block_params, bound["h"], bound.get("mod"), pos=bound["pos"])
            return {**state, "h": h}

        out = pipeline_blocks(
            block_fn,
            stacked,
            stream,
            mesh,
            axis=axis,
            microbatches=microbatches,
            consts=(consts,),
        )

        return dit.out_proj(out["h"])

    return forward

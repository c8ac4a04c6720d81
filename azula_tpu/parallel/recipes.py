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
    "flux_serving_shardings",
    "serve_flux",
]

import jax
import jax.numpy as jnp
import re

from collections.abc import Callable
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.dit import DiT
from ..utils.pytree import is_array
from .mesh import replicated, shard_batch
from .pp import pipeline_blocks, stack_modules
from .tp import FLUX_TP_RULES, _path_str


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


def flux_serving_shardings(
    denoiser,
    mesh: Mesh,
    min_size: int = 2**16,
):
    r"""Parameter shardings that make the 12B Flux MMDiT servable: Megatron
    tensor parallelism composed with ZeRO-3 weight sharding on one
    `('data', 'model')` mesh.

    The FLUX.1 transformer holds ~11.9B parameters (~24 GB in bf16) — more
    than one v5e (16 GB) or even one v5p (95 GB, but serving wants headroom)
    wants to hold replicated. Per leaf, first match wins:

    1. :data:`azula_tpu.parallel.tp.FLUX_TP_RULES` — attention heads and FFN
       hidden dims shard over `'model'` (one all-reduce per block in forward);
       the leaf's *remaining* largest divisible dimension additionally shards
       over `'data'` (ZeRO-3: XLA all-gathers it just-in-time per layer), so a
       TP-matched weight occupies `1 / (data * model)` of its full size per
       device.
    2. Any other parameter at least ``min_size`` elements shards its largest
       divisible dimension over `'data'`.
    3. Small leaves (norm scales, biases under the threshold) replicate.

    The reference serves Flux through diffusers on one 80 GB GPU
    (`azula/plugins/flux/__init__.py:219-256`); this is the TPU-first
    equivalent for chips that hold a fraction of that.

    Arguments:
        denoiser: The Flux denoiser (or any pytree holding the transformer).
        mesh: A mesh with `('data', 'model')` axes; `'model'` must divide the
            head count (24 for FLUX.1).
        min_size: Leaves smaller than this stay replicated.

    Returns:
        A pytree of :class:`jax.sharding.NamedSharding` (or None for
        non-array leaves) congruent with ``denoiser``.
    """

    n_data = mesh.shape["data"]

    def extend_over_data(spec, shape):
        # Add 'data' on the largest dimension the TP spec leaves unsharded.
        spec = list(spec) + [None] * (len(shape) - len(spec))
        dims = sorted(range(len(shape)), key=lambda d: shape[d], reverse=True)
        for d in dims:
            if spec[d] is None and shape[d] % n_data == 0:
                spec[d] = "data"
                break
        return P(*spec)

    def spec_for(path, leaf):
        if not is_array(leaf):
            return None

        name = _path_str(path)

        for pattern, spec in FLUX_TP_RULES:
            if re.search(pattern, name):
                return NamedSharding(mesh, extend_over_data(spec, leaf.shape))

        if leaf.size >= min_size:
            dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True)
            for d in dims:
                if leaf.shape[d] % n_data == 0:
                    spec = [None] * leaf.ndim
                    spec[d] = "data"
                    return NamedSharding(mesh, P(*spec))

        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec_for, denoiser)


def serve_flux(
    denoiser,
    mesh: Mesh,
    steps: int = 28,
    eta: float = 0.0,
    microbatch: int | None = None,
    min_size: int = 2**16,
) -> Callable:
    r"""Builds the sharded Flux serving path: TP x ZeRO-3 parameter placement
    (:func:`flux_serving_shardings`) composed with the compiled DDIM scan and
    optional classifier-free guidance, batch sharded over `'data'`.

    The reference's text-to-image entry point is `FluxPipe.__call__`
    (`azula/plugins/flux/__init__.py:219-256`): encode the prompt, run the
    sampler, decode. This recipe is the denoiser-side equivalent at pod
    scale — text encoding and VAE decode stay outside (they are small and
    run data-parallel as-is).

    Arguments:
        denoiser: A :class:`azula_tpu.models.flux.FluxDenoiser` (tiny configs
            work too — the recipe only assumes the checkpoint parameter
            naming that :data:`FLUX_TP_RULES` match).
        mesh: A `('data', 'model')` mesh; `'model'` must divide the head count.
        steps: DDIM steps.
        eta: DDIM stochasticity.
        microbatch: When set, the batch is generated in host-level chunks of
            this size (each chunk one compiled scan) to bound activation
            memory at 4k-token sequences; `None` runs the whole batch in one
            call. Must be a multiple of the `'data'` axis size (each chunk is
            batch-sharded over it).
        min_size: Replication threshold forwarded to
            :func:`flux_serving_shardings`.

    Returns:
        ``sample(x1, positive, negative=None, guidance=1.0, key=None)`` —
        ``positive``/``negative`` are conditioning dicts (``prompt_clip``,
        ``prompt_t5``, and optionally the distilled ``guidance`` scalar).
        Without ``negative``, runs the distilled-guidance path (one backbone
        call per step — FLUX.1-dev). With ``negative``, runs fused-batch
        classifier-free guidance (`guidance` is the CFG strength
        :math:`\omega`; the positive/negative pair rides one :math:`2B`
        backbone call whose batch is sharded over `'data'`).
    """

    from ..guidance import CFGDenoiser
    from ..sample import DDIMSampler

    if microbatch is not None:
        assert microbatch % mesh.shape["data"] == 0, (microbatch, mesh.shape)

    shardings = flux_serving_shardings(denoiser, mesh, min_size=min_size)
    placed = jax.tree.map(
        lambda leaf, s: leaf if s is None else jax.device_put(leaf, s),
        denoiser,
        shardings,
    )

    plain = DDIMSampler(placed, eta=eta, steps=steps)
    fused = DDIMSampler(CFGDenoiser(placed, batched=True), eta=eta, steps=steps)

    def shard_cond(cond, batch: int):
        def place(leaf):
            leaf = jnp.asarray(leaf)
            if leaf.ndim >= 1 and leaf.shape[0] == batch:
                return shard_batch(leaf, mesh)
            return leaf

        return jax.tree.map(place, cond)

    def sample_chunk(x1, positive, negative, guidance, key):
        B = x1.shape[0]
        x1 = shard_batch(x1, mesh)
        positive = shard_cond(positive, B)

        if negative is None:
            return plain(x1, key=key, **positive)

        negative = shard_cond(negative, B)
        return fused(
            x1, key=key, positive=positive, negative=negative, guidance=guidance
        )

    def sample(x1, positive, negative=None, guidance=1.0, key=None):
        B = x1.shape[0]

        if microbatch is None or microbatch >= B:
            return sample_chunk(x1, positive, negative, guidance, key)

        assert B % microbatch == 0, (B, microbatch)

        def chunk(tree, i):
            def take(leaf):
                leaf = jnp.asarray(leaf)
                if leaf.ndim >= 1 and leaf.shape[0] == B:
                    return leaf[i * microbatch : (i + 1) * microbatch]
                return leaf

            return jax.tree.map(take, tree)

        outs = []
        for i in range(B // microbatch):
            k = None if key is None else jax.random.fold_in(key, i)
            outs.append(
                sample_chunk(
                    chunk(x1, i),
                    chunk(positive, i),
                    None if negative is None else chunk(negative, i),
                    guidance,
                    k,
                )
            )

        return jnp.concatenate(outs, axis=0)

    return sample

r"""Scaled dot-product attention.

TPU-native replacement for the reference's call into
`torch.nn.functional.scaled_dot_product_attention` (`azula/nn/attention.py:98-104`)
and the vendored einsum attention (`azula/plugins/adm/_src/unet.py:328-345`): a
blockwise Pallas flash-attention kernel with float32 accumulation, plus a pure-XLA
fallback used on non-TPU backends, for masked/dropout attention, and for the
backward pass.

Image-diffusion sequence lengths are moderate (≤ 4096 tokens at 512px latents,
SURVEY.md §5.7), so the kernel keeps each (batch, head)'s full K/V block resident
in VMEM and tiles over query blocks — no online-softmax rescaling passes, maximal
MXU occupancy.
"""

from __future__ import annotations

__all__ = [
    "dot_product_attention",
]

import functools
import jax
import jax.numpy as jnp
import math

from jax import Array


def _xla_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Array | None = None,
    scale: float | None = None,
) -> Array:
    r"""Reference XLA implementation: softmax(q kᵀ / √D) v with fp32 softmax.

    The softmax is decomposed so the value matmul consumes *unnormalized*
    exp-weights and the denominator divides the (L, D) product afterwards —
    mathematically identical (the denominator is constant per query row),
    but it keeps the f32 L x L tensor out of the matmul's operand fusion and
    runs ~3.4x faster than `softmax -> cast -> dot` on TPU at DiT shapes
    (measured 0.139 vs 0.478 ms at B=128, H=6, L=256, D=64).
    """

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, -jnp.inf)
        else:
            logits = logits + mask

    m = jnp.max(logits, axis=-1, keepdims=True)
    weights = jnp.exp(logits - m)
    denom = jnp.sum(weights, axis=-1, dtype=jnp.float32)

    if q.dtype == jnp.float32:
        out = jnp.einsum("...qk,...kd->...qd", weights / denom[..., None], v)
    else:
        out = jnp.einsum(
            "...qk,...kd->...qd",
            weights.astype(q.dtype),
            v,
            preferred_element_type=jnp.float32,
        )
        out = out / denom[..., None]

    return out.astype(q.dtype)


# How a flattened (B*H,) program index maps into a broadcast bias of
# shape (Gm, L, L): "full" (Gm == B*H), "batch" (Gm == B, heads broadcast),
# "head" (Gm == H, batch broadcast), "one" (Gm == 1).
def _bias_group_fn(mode: str, H: int):
    if mode == "full":
        return lambda b: b
    if mode == "batch":
        return lambda b: b // H
    if mode == "head":
        return lambda b: b % H
    return lambda b: 0


def _pallas_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    bias: Array | None = None,
    bias_mode: str = "one",
    with_lse: bool = True,
    max_free: bool = False,
) -> tuple[Array, Array | None]:
    r"""Flash attention forward as a Pallas TPU kernel.

    Shapes: q, k, v are (B, H, L, D). Grid is (B * H, L / BLOCK_Q); each program
    holds one query block and the full K/V of its (batch, head) in VMEM.

    Returns the output and the per-query log-sum-exp (B, H, L) in float32 —
    the residual the backward kernels need to rebuild the softmax blockwise.
    With ``with_lse=False`` (inference) the LSE is neither computed nor
    written: the lane-replicated (L, 128) float32 residual costs real HBM
    bandwidth — as much as Q, K, V and O combined at D = 64 — so the primal
    path must not pay for it.

    ``max_free=True`` replaces the exact row max with a clamp at
    :data:`_MAX_FREE_CLAMP` (see :func:`dot_product_attention`): one select
    per logit instead of a full max-reduction pass — the softmax here is
    VPU-bound, so dropping a pass over the :math:`L \times L` logits is a
    direct win on serving latency.
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    BLOCK_Q = min(512, L)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    def kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        b_ref = refs.pop(0) if bias is not None else None
        o_ref = refs.pop(0)
        lse_ref = refs.pop(0) if with_lse else None

        qb = q_ref[0]  # (BLOCK_Q, D)
        kb = k_ref[0]  # (L, D)
        vb = v_ref[0]  # (L, D)

        logits = jax.lax.dot_general(
            qb,
            kb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale

        if b_ref is not None:
            logits = logits + b_ref[0].astype(jnp.float32)

        if max_free:
            m = jnp.zeros((qb.shape[0], 1), dtype=jnp.float32)
            p = jnp.exp(jnp.minimum(logits, _MAX_FREE_CLAMP))
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
        d = jnp.sum(p, axis=-1, keepdims=True)

        # bf16: normalize after the PV matmul — dividing the (BLOCK_Q, D)
        # product is L/D x fewer VPU divisions than normalizing the
        # (BLOCK_Q, L) weights, and under the bf16 truncation either order
        # carries the same relative error. f32: normalize first, which
        # reproduces the XLA attention bit pattern under the default (bf16
        # passes) TPU matmul precision (measured: deferring shifts f32
        # outputs by ~1e-3 relative to XLA while being equally accurate).
        if q.dtype == jnp.float32:
            o = jnp.dot((p / d).astype(vb.dtype), vb, preferred_element_type=jnp.float32)
            o_ref[0] = o.astype(o_ref.dtype)
        else:
            o = jnp.dot(p.astype(vb.dtype), vb, preferred_element_type=jnp.float32)
            o_ref[0] = (o / d).astype(o_ref.dtype)

        if lse_ref is not None:
            # LSE is written lane-replicated (BLOCK_Q, 128) to satisfy TPU tiling
            lse_ref[0] = jnp.broadcast_to(m + jnp.log(d), lse_ref.shape[1:])

    gfn = _bias_group_fn(bias_mode, H)
    in_specs = [
        pl.BlockSpec(
            (1, BLOCK_Q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, BLOCK_Q, L),
                lambda b, i: (gfn(b), i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)

    out_specs = [
        pl.BlockSpec(
            (1, BLOCK_Q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((B * H, L, D), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, BLOCK_Q, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((B * H, L, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B * H, pl.cdiv(L, BLOCK_Q)),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=3 * B * H * L * D * q.dtype.itemsize
            + B * H * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(*operands)

    out = outs[0].reshape(B, H, L, D)
    return out, (outs[1] if with_lse else None)


def _dropout_threshold(rate: float) -> int:
    r"""*Signed* int32 threshold such that P(bits >= threshold) = 1 - rate for
    uniform random bits reinterpreted as int32.

    The comparison happens in signed space on purpose: the PRNG's raw bits
    compared against a uint32 threshold would silently promote (and a rate-0.5
    threshold of 2^31 wraps to INT32_MIN, keeping everything). Mapping the
    uint threshold u to u - 2^31 preserves P(keep) exactly under the
    signed reinterpretation.
    """

    return min(int(rate * 2**32), 2**32 - 1) - 2**31


def _fmix32(h):
    r"""murmur3 finalizer on int32 lanes (wrapping int32 arithmetic computes
    the same bits as uint32)."""

    import numpy as np

    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(np.int32(np.uint32(0x85EBCA6B)))
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(np.int32(np.uint32(0xC2B2AE35)))
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _hash_bits(rows, cols, b, s0, s1):
    r"""int32 hash of (query, key, batch*head) coordinates and two seed words
    (one murmur fmix32 round per seed word)."""

    import numpy as np

    h = (
        (rows * jnp.int32(np.int32(np.uint32(0x9E3779B1))))
        ^ (cols * jnp.int32(1000003))
        ^ (b * jnp.int32(np.int32(np.uint32(0x27D4EB2F))))
        ^ s0
    )
    return _fmix32(_fmix32(h) ^ s1)


def _keep_mask(shape, row0, col0, b, s_ref, threshold):
    r"""Counter-based dropout keep-mask over *absolute* (query, key) token
    coordinates.

    A deliberate replacement for the hardware PRNG
    (`pltpu.prng_seed`/`prng_random_bits`): the HW stream's mapping from seed
    to bit *positions* is a compiler layout decision, so two differently
    structured kernels (forward vs the two backward kernels) cannot be
    guaranteed to agree on which position gets which bit even with identical
    seeds. Hashing the absolute coordinates with murmur3 finalizer rounds is
    deterministic by construction — independent of kernel structure, blocking,
    or grid — which is exactly the property mask regeneration in the backward
    needs (and it lets :func:`dropout_keep_mask` reproduce the mask outside
    the kernels). A few integer VPU ops per element, negligible next to the
    attention matmuls.
    """

    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    return _hash_bits(rows, cols, b, s_ref[0], s_ref[1]) >= jnp.int32(threshold)


def dropout_keep_mask(B: int, H: int, L: int, seed: Array, rate: float) -> Array:
    r"""The exact (B, H, L, L) keep-mask the flash dropout kernels apply for a
    given seed pair — the same pure-integer hash evaluated outside Pallas.

    Lets host-side code (tests, or an XLA twin of the kernels) reproduce the
    in-kernel dropout bit-for-bit.

    Arguments:
        B, H, L: Batch, heads, and sequence length.
        seed: Two int32 seed words, as passed to the kernels.
        rate: The dropout rate.

    Returns:
        A boolean array of shape :math:`(B, H, L, L)`; True keeps the weight.
    """

    rows = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    cols = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    b = jnp.arange(B * H, dtype=jnp.int32)[:, None, None]

    bits = _hash_bits(rows, cols, b, seed[0], seed[1])
    return (bits >= jnp.int32(_dropout_threshold(rate))).reshape(B, H, L, L)


def _divisor_block_k(L: int, cap: int = 1024, floor: int = 256) -> int:
    r"""Largest K-block size in [floor, cap] that divides L, else ``cap``.

    A divisible block count keeps the inner loop ragged-free: the ragged
    final K block otherwise costs an iota + two selects on the (Q, K) logits
    in *every* grid step plus up to a near-empty trailing block (e.g. at
    L = 4608 the cap-1024 tiling wastes 10% of the K columns and masks on
    every iteration; 768 divides L and measures ~9% faster end-to-end on the
    Flux dual-stream block)."""

    for cand in range(cap, floor - 1, -128):
        if L % cand == 0:
            return cand
    return cap


def _pallas_attention_blocked(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    bias: Array | None = None,
    bias_mode: str = "one",
    dropout_rate: float = 0.0,
    seed: Array | None = None,
    block: int | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    with_lse: bool = True,
    max_free: bool = False,
) -> tuple[Array, Array | None]:
    r"""Flash attention with K/V blocking and online softmax, for sequences too
    long to keep K/V resident in VMEM.

    ``max_free=True`` (see :func:`dot_product_attention`) drops the online
    max entirely: no running-max scratch, no correction rescale of the
    accumulator between K blocks, and one clamp-select per logit instead of
    a max-reduction pass — the three VPU passes this removes are what bound
    this kernel at long L (the MXU sits under 30% busy at L = 4608, D = 128).

    Grid is (B*H, L/BLOCK_Q, L/BLOCK_K) with the K dimension innermost and
    sequential; the running max / denominator / output accumulator live in
    VMEM scratch across K blocks and are finalized on the last block.

    With ``dropout_rate > 0`` the post-softmax weights are dropped in-kernel:
    the keep-mask is a counter-based hash of ``seed`` and the *absolute*
    (query, key) token coordinates (:func:`_keep_mask`), so the backward
    kernels regenerate the identical mask independent of their own blocking.
    The softmax denominator uses the *undropped* weights — dropout applies
    after normalization, matching
    `torch.nn.functional.scaled_dot_product_attention`
    (reference `azula/nn/attention.py:98-104`).
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    BLOCK_Q = block_q or (min(512, L) if block is None else block)
    BLOCK_K = block_k or (min(1024, L) if block is None else _divisor_block_k(L))

    if dropout_rate > 0:
        assert seed is not None and block is not None and L % block == 0
        assert not max_free, "max_free is an inference path; dropout keeps exact softmax"
        threshold = _dropout_threshold(dropout_rate)

    nq = pl.cdiv(L, BLOCK_Q)
    nk = pl.cdiv(L, BLOCK_K)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    def kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        b_ref = refs.pop(0) if bias is not None else None
        s_ref = refs.pop(0) if dropout_rate > 0 else None
        if with_lse:
            o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        else:
            o_ref, m_scr, l_scr, acc_scr = refs
            lse_ref = None

        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
            if not max_free:
                m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        qb = q_ref[0]
        kb_ = k_ref[0]
        vb = v_ref[0]

        logits = jax.lax.dot_general(
            qb,
            kb_,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale

        if b_ref is not None:
            logits = logits + b_ref[0].astype(jnp.float32)

        if L % BLOCK_K != 0:
            # Ragged final K block: out-of-bounds K/V rows arrive as undefined
            # padding — mask their logits out of the softmax and zero the V
            # rows (0 * NaN would otherwise poison the accumulator).
            k_idx = kb * BLOCK_K + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(k_idx < L, logits, _MASKED_OUT)

            v_idx = kb * BLOCK_K + jax.lax.broadcasted_iota(
                jnp.int32, vb.shape, 0
            )
            vb = jnp.where(v_idx < L, vb, 0)

        if max_free:
            # No running max, no correction rescale between K blocks: one
            # clamp-select per logit replaces the max-reduction pass. (An
            # exp2 variant with the scale folded into q and the denominator
            # as a ones-matmul on the MXU measured *slower* end-to-end —
            # 13.0 vs 12.6 ms on the Flux dual block — so the simple form
            # stays.)
            p = jnp.exp(jnp.minimum(logits, _MAX_FREE_CLAMP))
            l_scr[:] = l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                p.astype(vb.dtype),
                vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m_prev - m_new)

            l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)

            if s_ref is None:
                p_acc = p
            else:
                # In-kernel dropout of the (normalized) weights: the
                # denominator keeps the undropped p; only the V-accumulation
                # is masked.
                keep = _keep_mask(
                    p.shape,
                    pl.program_id(1) * BLOCK_Q,
                    kb * BLOCK_K,
                    pl.program_id(0),
                    s_ref,
                    threshold,
                )
                p_acc = jnp.where(keep, p, 0.0) / (1 - dropout_rate)

            acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
                p_acc.astype(vb.dtype),
                vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:] = m_new

        @pl.when(kb == nk - 1)
        def _():
            o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
            if lse_ref is not None:
                m_fin = 0.0 if max_free else m_scr[:]
                lse_ref[0] = jnp.broadcast_to(
                    m_fin + jnp.log(l_scr[:]), lse_ref.shape[1:]
                )

    gfn = _bias_group_fn(bias_mode, H)
    in_specs = [
        pl.BlockSpec(
            (1, BLOCK_Q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, BLOCK_K, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, BLOCK_K, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [qf, kf, vf]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, BLOCK_Q, BLOCK_K),
                lambda b, i, j: (gfn(b), i, j),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)
    if dropout_rate > 0:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        operands.append(seed)

    out_specs = [
        pl.BlockSpec(
            (1, BLOCK_Q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((B * H, L, D), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, BLOCK_Q, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((B * H, L, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B * H, nq, nk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=4 * B * H * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(*operands)

    return outs[0].reshape(B, H, L, D), (outs[1] if with_lse else None)


def _pallas_attention_batched(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    bias: Array | None = None,
    bias_mode: str = "one",
    with_lse: bool = True,
) -> tuple[Array, Array | None]:
    r"""Flash attention for *short* sequences: several (batch, head) pairs per
    program.

    At image-diffusion lengths (L ≤ 512) a per-(batch, head) grid runs
    B·H tiny programs whose fixed dispatch cost dominates (measured: the
    per-pair kernel lost to XLA by 1.7x at L = 256 on the DiT-S bench, while
    the XLA path pays ~200 MB of materialized fp32 logits per layer). This
    kernel keeps the whole softmax in VMEM like the others but amortizes the
    grid: each program holds G pairs and unrolls the per-pair matmuls.
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    N = B * H

    G = 1
    for g in (8, 4, 2):
        if N % g == 0:
            G = g
            break

    qf = q.reshape(N, L, D)
    kf = k.reshape(N, L, D)
    vf = v.reshape(N, L, D)

    def kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref = refs[:3]
        refs = refs[3:]
        b_ref = refs.pop(0) if bias is not None else None
        o_ref = refs.pop(0)
        lse_ref = refs.pop(0) if with_lse else None

        for g in range(G):
            logits = jax.lax.dot_general(
                q_ref[g],
                k_ref[g],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale

            if b_ref is not None:
                logits = logits + b_ref[g if bias_mode == "full" else 0].astype(
                    jnp.float32
                )

            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            d = jnp.sum(p, axis=-1, keepdims=True)

            # Normalize the (L, D) product, not the (L, L) weights (bf16);
            # f32 normalizes first for XLA bit parity — see _pallas_attention.
            if q.dtype == jnp.float32:
                o = jnp.dot(
                    (p / d).astype(v_ref.dtype), v_ref[g],
                    preferred_element_type=jnp.float32,
                )
                o_ref[g] = o.astype(o_ref.dtype)
            else:
                o = jnp.dot(
                    p.astype(v_ref.dtype), v_ref[g], preferred_element_type=jnp.float32
                )
                o_ref[g] = (o / d).astype(o_ref.dtype)

            if lse_ref is not None:
                lse_ref[g] = jnp.broadcast_to(m + jnp.log(d), lse_ref.shape[1:])

    in_specs = [
        pl.BlockSpec((G, L, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, L, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, L, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if bias is not None:
        # Only the per-pair ("full") and broadcast ("one") layouts tile
        # contiguously with G pairs per program; _pallas_dispatch falls back
        # to the per-pair kernel for per-batch/per-head masks.
        assert bias_mode in ("one", "full")
        if bias_mode == "full":
            in_specs.append(
                pl.BlockSpec((G, L, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((1, L, L), lambda n: (0, 0, 0), memory_space=pltpu.VMEM)
            )
        operands.append(bias)

    out_specs = [
        pl.BlockSpec((G, L, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((N, L, D), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((G, L, 128), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((N, L, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * L * L * D,
            bytes_accessed=4 * N * L * D * q.dtype.itemsize,
            transcendentals=N * L * L,
        ),
    )(*operands)

    return outs[0].reshape(B, H, L, D), (outs[1] if with_lse else None)


def _blhd_layout(B: int, H: int, L: int, D: int):
    r"""Grid and block spec for kernels that consume (B, L, H*D) arrays
    directly — the fused QKV projection's native layout: per program, G full
    batch rows arrive as a (G, L, H*D) block and the kernel lane-slices
    heads in VMEM (the fused-MSA kernel's packing idiom) — no host-side head
    transpose is ever materialized."""

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Per unrolled (g, h) iteration: s/p transients ~16 L^2 bytes (Mosaic
    # allocates every unrolled iteration separately).
    budget = 12 * 2**20
    G = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * H * 16 * L * L <= budget:
            G = cand
            break

    spec = pl.BlockSpec(
        (G, L, H * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return G, (B // G,), spec


def _flash_blhd_fwd_kernel(scale, G, H, D, q_ref, k_ref, v_ref, o_ref):
    # A head-PAIR packed variant (adjacent heads as one 128-lane slice
    # attending against block-diagonal K/V stacks, full MXU depth) measured
    # *slower* end-to-end (dit32 train step 57.8 -> 63.2 ms): the stack
    # masking, per-half reductions and repeats outweigh the depth win at
    # these tile sizes. The simple per-head loop stays.
    for i in range(G):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qb, kb, vb = q_ref[i, :, sl], k_ref[i, :, sl], v_ref[i, :, sl]

            logits = jax.lax.dot_general(
                qb,
                kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            d = jnp.sum(p, axis=-1, keepdims=True)

            o = jax.lax.dot_general(
                p.astype(vb.dtype),
                vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[i, :, sl] = (o / d).astype(o_ref.dtype)


def _flash_blhd_bwd_kernel(
    scale, G, H, D, q_ref, k_ref, v_ref, o_ref, g_ref, dq_ref, dk_ref, dv_ref
):
    for i in range(G):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qb, kb, vb = q_ref[i, :, sl], k_ref[i, :, sl], v_ref[i, :, sl]
            ob, gb = o_ref[i, :, sl], g_ref[i, :, sl]

            s = jax.lax.dot_general(
                qb,
                kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)

            dp = jax.lax.dot_general(
                gb,
                vb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                gb.astype(jnp.float32) * ob.astype(jnp.float32),
                axis=-1,
                keepdims=True,
            )

            ds = (p * (dp - delta) * scale).astype(qb.dtype)
            p16 = p.astype(qb.dtype)

            dq_ref[i, :, sl] = jax.lax.dot_general(
                ds, kb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[i, :, sl] = jax.lax.dot_general(
                ds, qb, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)
            dv_ref[i, :, sl] = jax.lax.dot_general(
                p16, gb, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_blhd(q: Array, k: Array, v: Array, heads: int, scale: float) -> Array:
    r"""Flash attention over (B, L, H*D) arrays — the layout the fused QKV
    projection produces — for short self-attention (L <= 512, no mask or
    dropout, TPU only; callers guarantee eligibility).

    The (B, H, L, D) kernels force XLA to materialize a head transpose of
    q/k/v on the way in and o on the way out (plus the same four around the
    backward): at dit32 training shapes that is ~200 MB of pure layout
    traffic per layer per step. These kernels instead read (G, L, H*D)
    blocks straight out of the projection-layout arrays and lane-slice
    heads in VMEM (the fused-MSA kernel's idiom).
    """

    from jax.experimental import pallas as pl

    B, L, C = q.shape
    H, D = heads, C // heads
    G, grid, spec = _blhd_layout(B, H, L, D)

    return pl.pallas_call(
        functools.partial(_flash_blhd_fwd_kernel, scale, G, H, D),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=4 * B * L * C * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v)


def _flash_blhd_fwd(q, k, v, heads, scale):
    o = _flash_blhd(q, k, v, heads, scale)
    return o, (q, k, v, o)


def _flash_blhd_bwd(heads, scale, residuals, g):
    from jax.experimental import pallas as pl

    q, k, v, o = residuals
    B, L, C = q.shape
    H, D = heads, C // heads
    G, grid, spec = _blhd_layout(B, H, L, D)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_blhd_bwd_kernel, scale, G, H, D),
        grid=grid,
        in_specs=[spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, L, C), q.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * L * L * D,
            bytes_accessed=8 * B * L * C * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v, o, g.astype(q.dtype))

    return dq, dk, dv


_flash_blhd.defvjp(_flash_blhd_fwd, _flash_blhd_bwd)


# Above this sequence length, K/V no longer stay resident in VMEM and the
# blocked online-softmax kernel takes over.
_FULL_KV_MAX_L = 2048

# At or below this length the multi-pair batched kernel is used instead of a
# per-(batch, head) grid.
_BATCHED_MAX_L = 512


def _use_pallas(q: Array, k: Array, v: Array, mask, floor: int = 512) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if q.ndim != 4:
        return False

    # Self-attention shapes only: the kernels tile K/V with the query length.
    # Cross-attention (S != L, e.g. text conditioning) keeps the XLA path —
    # its K/V are short, so full softmax is cheap there anyway.
    if k.shape != q.shape or v.shape != q.shape:
        return False

    B, H, L, D = q.shape

    # Lane/sublane alignment; small or ragged shapes fall back to XLA.
    # The default L >= 512 floor is measured END-TO-END, not on micros: the
    # multi-pair batched kernel beats standalone XLA attention at L = 256
    # (1.19x, tools/attn_micro.py), but in context XLA fuses the attention
    # chain with the surrounding projections and the dit32 bench regresses
    # 110.5 -> 97.5 img/s if the kernel takes over there; at L >= 512 the
    # kernel wins both standalone (1.86x) and in context.
    if not (L >= max(floor, 128) and L % 128 == 0 and D % 64 == 0 and D <= 256):
        return False

    if mask is not None:
        # Boolean masks (padding / causal) are folded into the kernels as an
        # additive bias. Float (additive) masks keep the XLA path: their
        # gradient would silently be dropped by the flash backward.
        if mask.dtype != jnp.bool_ or mask.ndim > 4:
            return False
        shp = (1,) * (4 - mask.ndim) + tuple(mask.shape)
        if shp[2:] != (L, L):
            return False
        if shp[0] not in (1, B) or shp[1] not in (1, H):
            return False

    return True


_MASKED_OUT = -1e30  # large-negative logit for masked positions (exp -> 0)

# Clamp for the max-free softmax: exp saturates safely below float32
# overflow (exp(88) ~ 1.6e38). Callers opt in only when their logits are
# bounded well under this (QK-RMS-normalized attention; see
# `dot_product_attention`), so the clamp is insurance, not a code path.
_MAX_FREE_CLAMP = 80.0


def _mask_to_bias(mask: Array, q: Array) -> tuple[Array, str]:
    r"""Folds a boolean mask (broadcastable to (B, H, L, L)) into a flattened
    (Gm, L, L) additive bias plus its program-index broadcast mode."""

    B, H, L, _ = q.shape

    shp = (1,) * (4 - mask.ndim) + tuple(mask.shape)
    m = mask.reshape(shp)
    Bm, Hm = shp[0], shp[1]

    mode = {
        (True, True): "full",
        (True, False): "batch",
        (False, True): "head",
        (False, False): "one",
    }[(Bm > 1, Hm > 1)]

    bias = jnp.where(m, 0.0, _MASKED_OUT).astype(q.dtype)
    return bias.reshape(Bm * Hm, L, L), mode


def _pallas_dispatch(
    q, k, v, scale, bias=None, bias_mode="one", with_lse=True, max_free=False
):
    L = q.shape[-2]
    if L <= _BATCHED_MAX_L and (bias is None or bias_mode in ("one", "full")):
        # The multi-pair batched kernel's softmax passes are cheap at short
        # L; max_free is not threaded there.
        return _pallas_attention_batched(q, k, v, scale, bias, bias_mode, with_lse)
    elif L > _FULL_KV_MAX_L:
        return _pallas_attention_blocked(
            q, k, v, scale, bias, bias_mode, with_lse=with_lse, max_free=max_free
        )
    else:
        return _pallas_attention(
            q, k, v, scale, bias, bias_mode, with_lse, max_free=max_free
        )


def _bwd_block(L: int) -> int:
    for blk in (512, 256, 128):
        if L % blk == 0:
            return blk
    return L


def _pallas_attention_batched_bwd(
    q: Array,
    k: Array,
    v: Array,
    o: Array,
    lse: Array | None,
    g: Array,
    scale: float,
) -> tuple[Array, Array, Array]:
    r"""Flash attention backward for *short* sequences: several (batch, head)
    pairs per program, one single-block pass producing dQ, dK and dV together.

    The two-kernel FA-2 backward runs `2 * B * H` tiny programs at L <= 512 —
    per-program DMA/dispatch cost dominates exactly as it did for the forward
    (see :func:`_pallas_attention_batched`), and P is rebuilt twice. Here the
    whole (L, L) softmax block stays in VMEM, each program unrolls G pairs,
    and every tensor is touched once. Measured on the dit32 train step
    (B=128, H=6, L=256, D=64): the attention fwd+bwd share of the step drops
    ~2x vs either the FA-2 kernels or the materialized XLA backward.

    With ``lse=None`` the softmax max/denominator are recomputed in-VMEM from
    the rebuilt logits — two cheap passes over an (L, L) tile that spare the
    forward from writing the lane-replicated (B*H, L, 128) float32 residual
    at all (~200 MB per dit32-shaped layer, written forward + read backward).
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    N = B * H

    # Per-pair f32 transients: s, p, dp, ds = 16 L^2 bytes. Mosaic allocates
    # every unrolled iteration's transients separately, so G is bounded by a
    # VMEM budget (same constraint as the fused-MSA kernel's unroll bound).
    budget = 8 * 2**20
    G = 1
    for cand in (8, 4, 2):
        if N % cand == 0 and cand * 16 * L * L <= budget:
            G = cand
            break

    qf = q.reshape(N, L, D)
    kf = k.reshape(N, L, D)
    vf = v.reshape(N, L, D)
    of = o.reshape(N, L, D)
    gf = g.reshape(N, L, D).astype(q.dtype)

    def kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref, o_ref, g_ref = refs[:5]
        refs = refs[5:]
        lse_ref = refs.pop(0) if lse is not None else None
        dq_ref, dk_ref, dv_ref = refs

        for i in range(G):
            qb, kb, vb = q_ref[i], k_ref[i], v_ref[i]
            ob, gb = o_ref[i], g_ref[i]

            s = jax.lax.dot_general(
                qb,
                kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

            if lse_ref is None:
                # Single-block softmax recomputed in-VMEM: no lse residual.
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                # lse arrives lane-replicated (L, 128); any lane is the value
                p = jnp.exp(s - lse_ref[i][:, 0:1])

            dp = jax.lax.dot_general(
                gb,
                vb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                gb.astype(jnp.float32) * ob.astype(jnp.float32),
                axis=-1,
                keepdims=True,
            )

            ds = (p * (dp - delta) * scale).astype(qb.dtype)
            p16 = p.astype(qb.dtype)

            dq_ref[i] = jax.lax.dot_general(
                ds,
                kb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[i] = jax.lax.dot_general(
                ds,
                qb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)
            dv_ref[i] = jax.lax.dot_general(
                p16,
                gb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)

    spec = pl.BlockSpec((G, L, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [spec, spec, spec, spec, spec]
    operands = [qf, kf, vf, of, gf]
    if lse is not None:
        in_specs.append(
            pl.BlockSpec((G, L, 128), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(lse)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((N, L, D), q.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * N * L * L * D,
            bytes_accessed=8 * N * L * D * q.dtype.itemsize,
            transcendentals=N * L * L,
        ),
    )(*operands)

    shape = (B, H, L, D)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


def _pallas_attention_bwd(
    q: Array,
    k: Array,
    v: Array,
    o: Array,
    lse: Array,
    g: Array,
    scale: float,
    bias: Array | None = None,
    bias_mode: str = "one",
    dropout_rate: float = 0.0,
    seed: Array | None = None,
) -> tuple[Array, Array, Array]:
    r"""Flash attention backward as two Pallas TPU kernels.

    Standard FlashAttention-2 recipe: the softmax is rebuilt blockwise from the
    saved log-sum-exp, `delta = rowsum(dO * O)` is folded in-kernel, and the
    L x L weight matrix is never materialized in HBM. The dQ kernel accumulates
    over sequential key blocks; the dK/dV kernel over sequential query blocks.
    Replaces the reference's cuDNN SDPA backward (`azula/nn/attention.py:98-104`).

    With dropout, the forward's mask is regenerated per tile from the same
    coordinate hash the forward used (:func:`_keep_mask`, a pure function of
    seed and absolute token coordinates). Writing P̃ = M ⊙ P / (1-r)
    for the dropped weights, the identity delta = rowsum(dO ⊙ O) =
    rowsum(P ⊙ dL/dP) still holds, so
    dS = P ⊙ (M ⊙ (dO Vᵀ) / (1-r) - delta) · scale and dV = P̃ᵀ dO.
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape

    # Short sequences: one multi-pair single-block pass (dQ/dK/dV together)
    # instead of 2*B*H tiny two-kernel programs.
    if L <= _BATCHED_MAX_L and bias is None and dropout_rate == 0:
        return _pallas_attention_batched_bwd(q, k, v, o, lse, g, scale)

    assert lse is not None, "the blocked backward needs the forward's LSE residual"

    BQ = _bwd_block(L)
    BK = _bwd_block(L)
    nq = L // BQ
    nk = L // BK

    if dropout_rate > 0:
        assert seed is not None and BQ == BK
        threshold = _dropout_threshold(dropout_rate)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)
    of = o.reshape(B * H, L, D)
    gf = g.reshape(B * H, L, D).astype(q.dtype)
    lsef = lse  # (B*H, L, 128), lane-replicated (see forward kernels)

    def _p_ds(q_blk, g_blk, o_blk, k_blk, v_blk, lse_blk, b_blk, s_ref=None, qb=None, kb=None):
        r"""Rebuilds P, P̃ (dropped) and dS for one (query, key) block pair,
        in float32."""

        s = jax.lax.dot_general(
            q_blk, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        if b_blk is not None:
            s = s + b_blk.astype(jnp.float32)

        # lse arrives lane-replicated (BQ, 128); any single lane is the value
        p = jnp.exp(s - lse_blk[:, 0:1])

        dp = jax.lax.dot_general(
            g_blk, v_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(
            g_blk.astype(jnp.float32) * o_blk.astype(jnp.float32),
            axis=-1, keepdims=True,
        )

        if dropout_rate > 0:
            # Regenerate the forward's keep-mask for this tile: the hash is a
            # pure function of absolute coordinates, so it is identical to the
            # forward's regardless of kernel structure or blocking.
            keep = _keep_mask(
                p.shape, qb * BQ, kb * BK, pl.program_id(0), s_ref, threshold
            )
            p_tilde = jnp.where(keep, p, 0.0) / (1 - dropout_rate)
            dp = jnp.where(keep, dp, 0.0) / (1 - dropout_rate)
        else:
            p_tilde = p

        ds = p * (dp - delta) * scale
        return p_tilde, ds

    def dq_kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref = refs[:6]
        refs = refs[6:]
        b_ref = refs.pop(0) if bias is not None else None
        s_ref = refs.pop(0) if dropout_rate > 0 else None
        dq_ref, acc = refs

        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        _, ds = _p_ds(
            q_ref[0], g_ref[0], o_ref[0], k_ref[0], v_ref[0], lse_ref[0],
            None if b_ref is None else b_ref[0],
            s_ref, i, j,
        )

        acc[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), k_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == nk - 1)
        def _():
            dq_ref[0] = acc[:].astype(dq_ref.dtype)

    gfn = _bias_group_fn(bias_mode, H)
    dq_in_specs = [
        pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BK, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BK, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, BQ, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    dq_operands = [qf, kf, vf, of, gf, lsef]
    if bias is not None:
        dq_in_specs.append(
            pl.BlockSpec(
                (1, BQ, BK),
                lambda b, i, j: (gfn(b), i, j),
                memory_space=pltpu.VMEM,
            )
        )
        dq_operands.append(bias)
    if dropout_rate > 0:
        dq_in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        dq_operands.append(seed)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, nq, nk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec(
            (1, BQ, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * L * L * D,
            bytes_accessed=5 * B * H * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(*dq_operands)

    def dkv_kernel(*refs):
        refs = list(refs)
        q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref = refs[:6]
        refs = refs[6:]
        b_ref = refs.pop(0) if bias is not None else None
        s_ref = refs.pop(0) if dropout_rate > 0 else None
        dk_ref, dv_ref, kacc, vacc = refs

        j = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            kacc[:] = jnp.zeros_like(kacc)
            vacc[:] = jnp.zeros_like(vacc)

        p, ds = _p_ds(
            q_ref[0], g_ref[0], o_ref[0], k_ref[0], v_ref[0], lse_ref[0],
            None if b_ref is None else b_ref[0],
            s_ref, i, j,
        )

        vacc[:] += jax.lax.dot_general(
            p.astype(q_ref.dtype), g_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kacc[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == nq - 1)
        def _():
            dk_ref[0] = kacc[:].astype(dk_ref.dtype)
            dv_ref[0] = vacc[:].astype(dv_ref.dtype)

    dkv_in_specs = [
        pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, BQ, 128), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    dkv_operands = [qf, kf, vf, of, gf, lsef]
    if bias is not None:
        dkv_in_specs.append(
            pl.BlockSpec(
                (1, BQ, BK),
                lambda b, j, i: (gfn(b), i, j),
                memory_space=pltpu.VMEM,
            )
        )
        dkv_operands.append(bias)
    if dropout_rate > 0:
        dkv_in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        dkv_operands.append(seed)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, nk, nq),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, D), jnp.float32),
            pltpu.VMEM((BK, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * L * L * D,
            bytes_accessed=5 * B * H * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(*dkv_operands)

    shape = (B, H, L, D)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q: Array, k: Array, v: Array, scale: float, max_free: bool = False) -> Array:
    # Primal (inference) path: no LSE residual computed or written
    return _pallas_dispatch(q, k, v, scale, with_lse=False, max_free=max_free)[0]


def _flash_fwd(q, k, v, scale, max_free):
    # Training keeps the exact online max: the LSE residual and the backward
    # softmax reconstruction stay untouched by the serving-path shortcut.
    # At short L the batched backward recomputes the single-block softmax
    # in-VMEM, so no LSE residual is computed or written at all.
    with_lse = q.shape[-2] > _BATCHED_MAX_L
    o, lse = _pallas_dispatch(q, k, v, scale, with_lse=with_lse)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, max_free, residuals, g):
    q, k, v, o, lse = residuals
    return _pallas_attention_bwd(q, k, v, o, lse, g, scale)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_biased(
    q: Array, k: Array, v: Array, bias: Array, scale: float, bias_mode: str
) -> Array:
    return _pallas_dispatch(q, k, v, scale, bias, bias_mode, with_lse=False)[0]


def _flash_biased_fwd(q, k, v, bias, scale, bias_mode):
    o, lse = _pallas_dispatch(q, k, v, scale, bias, bias_mode)
    return o, (q, k, v, bias, o, lse)


def _flash_biased_bwd(scale, bias_mode, residuals, g):
    q, k, v, bias, o, lse = residuals
    dq, dk, dv = _pallas_attention_bwd(q, k, v, o, lse, g, scale, bias, bias_mode)
    # The bias is derived from a boolean mask (see _use_pallas), so there is
    # no gradient path through it; zeros keep custom_vjp's signature happy.
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_biased.defvjp(_flash_biased_fwd, _flash_biased_bwd)


def _seed_cotangent(seed: Array):
    r"""Zero cotangent for the integer seed operand (float0, as custom_vjp
    requires for integer primals)."""

    import numpy as np

    return np.zeros(seed.shape, dtype=jax.dtypes.float0)


def _flash_dropout_impl(q, k, v, seed, rate, scale, bias=None, bias_mode="one", with_lse=True):
    # The hash-based mask is blocking-independent; using the backward's block
    # size in the forward too just keeps the two passes' tilings aligned.
    return _pallas_attention_blocked(
        q, k, v, scale, bias, bias_mode,
        dropout_rate=rate, seed=seed, block=_bwd_block(q.shape[-2]),
        with_lse=with_lse,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_dropout(q: Array, k: Array, v: Array, seed: Array, rate: float, scale: float) -> Array:
    return _flash_dropout_impl(q, k, v, seed, rate, scale, with_lse=False)[0]


def _flash_dropout_fwd(q, k, v, seed, rate, scale):
    o, lse = _flash_dropout_impl(q, k, v, seed, rate, scale)
    return o, (q, k, v, seed, o, lse)


def _flash_dropout_bwd(rate, scale, residuals, g):
    q, k, v, seed, o, lse = residuals
    dq, dk, dv = _pallas_attention_bwd(
        q, k, v, o, lse, g, scale, dropout_rate=rate, seed=seed
    )
    return dq, dk, dv, _seed_cotangent(seed)


_flash_dropout.defvjp(_flash_dropout_fwd, _flash_dropout_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_dropout_biased(
    q: Array, k: Array, v: Array, bias: Array, seed: Array,
    rate: float, scale: float, bias_mode: str,
) -> Array:
    return _flash_dropout_impl(q, k, v, seed, rate, scale, bias, bias_mode, with_lse=False)[0]


def _flash_dropout_biased_fwd(q, k, v, bias, seed, rate, scale, bias_mode):
    o, lse = _flash_dropout_impl(q, k, v, seed, rate, scale, bias, bias_mode)
    return o, (q, k, v, bias, seed, o, lse)


def _flash_dropout_biased_bwd(rate, scale, bias_mode, residuals, g):
    q, k, v, bias, seed, o, lse = residuals
    dq, dk, dv = _pallas_attention_bwd(
        q, k, v, o, lse, g, scale, bias, bias_mode,
        dropout_rate=rate, seed=seed,
    )
    return dq, dk, dv, jnp.zeros_like(bias), _seed_cotangent(seed)


_flash_dropout_biased.defvjp(_flash_dropout_biased_fwd, _flash_dropout_biased_bwd)


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Array | None = None,
    dropout_rate: float = 0.0,
    key: Array | None = None,
    scale: float | None = None,
    implementation: str | None = None,
    max_free: bool = False,
) -> Array:
    r"""Computes scaled dot-product attention.

    .. math:: \mathrm{softmax}\left(\frac{q k^\top}{\sqrt{D}}\right) v

    Dispatches to the Pallas flash-attention kernels on TPU for self-attention
    with aligned shapes — above the measured :math:`L \ge 512` crossover when
    dropout-free, and for any eligible :math:`L` when training with attention
    dropout (the dropout keep-mask is computed *in-kernel* as a counter-based
    hash of the seed and absolute coordinates — see :func:`dropout_keep_mask`
    — so the :math:`L \times L` weights are never materialized) — and to a
    fused XLA implementation otherwise.

    Arguments:
        q: Queries, with shape :math:`(*, H, L, D)`.
        k: Keys, with shape :math:`(*, H, L, D)`.
        v: Values, with shape :math:`(*, H, L, D)`.
        mask: Optional boolean or additive mask, broadcastable to :math:`(L, L)`.
        dropout_rate: Attention-weight dropout rate.
        key: PRNG key, required when ``dropout_rate > 0``.
        scale: Logit scale; defaults to :math:`1 / \sqrt{D}`.
        implementation: :py:`None` (measured auto-dispatch), `'pallas'`
            (force the flash kernels; raises if the shape is ineligible), or
            `'xla'` — mirroring :func:`jax.nn.dot_product_attention`.
        max_free: Opt-in softmax shortcut for callers whose logits are
            *bounded by construction*: replaces the exact row max with a
            fixed clamp at :data:`_MAX_FREE_CLAMP` (= 80) on the unmasked
            inference flash path. Correct whenever
            :math:`|q_i \cdot k_j| \cdot \mathrm{scale} \ll 80` — e.g. with
            per-head RMS-normalized queries and keys (Flux, SD3-style MMDiT:
            row norms are :math:`\le \sqrt{D}\,\max|\gamma|`, so
            :math:`|\mathrm{logit}| \le \sqrt{D}\,\max|\gamma_q|\max|\gamma_k|
            \approx 11` at :math:`D = 128` for unit-scale gains). The flash
            softmax is VPU-bound; skipping the max pass and the online
            rescaling is a direct serving-latency win (measured on the Flux
            dual-stream block, tools/flux_block_micro.py). Ignored on the
            XLA path, under masks/dropout, and in the backward pass.

    Returns:
        The attention output, with shape :math:`(*, H, L, D)`.
    """

    if implementation not in (None, "auto", "pallas", "xla"):
        raise ValueError(f"unknown attention implementation '{implementation}'")

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    if dropout_rate > 0 and key is None:
        raise ValueError("attention dropout requires a PRNG `key`")

    # With dropout, any eligible shape routes to the kernels (floor 128): the
    # XLA path materializes the L x L weights *and* an L x L bernoulli mask,
    # so the flash memory profile matters most exactly there (training).
    floor = 1 if implementation == "pallas" else (128 if dropout_rate > 0 else 512)
    eligible = _use_pallas(q, k, v, mask, floor=floor)

    if implementation == "pallas" and not eligible:
        raise ValueError(
            "implementation='pallas' requires a TPU backend and a "
            "self-attention with L % 128 == 0, D % 64 == 0, D <= 256 and a "
            "boolean (or no) mask"
        )

    if eligible and implementation in (None, "auto", "pallas"):
        if dropout_rate > 0:
            # Two independent 32-bit seeds drawn from the key; the kernels
            # mix in (batch*head, q-block, k-block) per tile.
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(key, (2,), jnp.uint32), jnp.int32
            )
            if mask is None:
                return _flash_dropout(q, k, v, seed, dropout_rate, scale)
            bias, mode = _mask_to_bias(mask, q)
            return _flash_dropout_biased(q, k, v, bias, seed, dropout_rate, scale, mode)
        if mask is None:
            return _flash(q, k, v, scale, max_free)
        bias, mode = _mask_to_bias(mask, q)
        return _flash_biased(q, k, v, bias, scale, mode)

    if dropout_rate > 0:
        # Non-TPU / ineligible-shape fallback: materialized weights + mask
        logits = (
            jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        if mask is not None:
            if mask.dtype == jnp.bool_:
                logits = jnp.where(mask, logits, -jnp.inf)
            else:
                logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1)
        keep = jax.random.bernoulli(key, 1 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1 - dropout_rate), 0.0)
        return jnp.einsum("...qk,...kd->...qd", weights.astype(q.dtype), v)

    return _xla_attention(q, k, v, mask=mask, scale=scale)

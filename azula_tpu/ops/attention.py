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
    r"""Reference XLA implementation: softmax(q kᵀ / √D) v with fp32 softmax."""

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

    weights = jax.nn.softmax(logits, axis=-1)

    return jnp.einsum(
        "...qk,...kd->...qd", weights.astype(q.dtype), v
    )


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
) -> tuple[Array, Array]:
    r"""Flash attention forward as a Pallas TPU kernel.

    Shapes: q, k, v are (B, H, L, D). Grid is (B * H, L / BLOCK_Q); each program
    holds one query block and the full K/V of its (batch, head) in VMEM.

    Returns the output and the per-query log-sum-exp (B, H, L) in float32 —
    the residual the backward kernels need to rebuild the softmax blockwise.
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    BLOCK_Q = min(512, L)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    def kernel(*refs):
        if bias is None:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
            b_ref = None
        else:
            q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref = refs

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

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        d = jnp.sum(p, axis=-1, keepdims=True)
        w = (p / d).astype(vb.dtype)

        o_ref[0] = jnp.dot(w, vb, preferred_element_type=jnp.float32).astype(
            o_ref.dtype
        )
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

    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, pl.cdiv(L, BLOCK_Q)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, BLOCK_Q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, BLOCK_Q, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=3 * B * H * L * D * q.dtype.itemsize
            + B * H * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(*operands)

    return out.reshape(B, H, L, D), lse


def _pallas_attention_blocked(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    bias: Array | None = None,
    bias_mode: str = "one",
) -> tuple[Array, Array]:
    r"""Flash attention with K/V blocking and online softmax, for sequences too
    long to keep K/V resident in VMEM.

    Grid is (B*H, L/BLOCK_Q, L/BLOCK_K) with the K dimension innermost and
    sequential; the running max / denominator / output accumulator live in
    VMEM scratch across K blocks and are finalized on the last block.
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    BLOCK_Q = min(512, L)
    BLOCK_K = min(1024, L)

    nq = pl.cdiv(L, BLOCK_Q)
    nk = pl.cdiv(L, BLOCK_K)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    def kernel(*refs):
        if bias is None:
            q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
            b_ref = None
        else:
            q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs

        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
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

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m_prev - m_new)

        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(vb.dtype),
            vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

        @pl.when(kb == nk - 1)
        def _():
            o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:] + jnp.log(l_scr[:]), lse_ref.shape[1:]
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

    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, nq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, BLOCK_Q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, BLOCK_Q, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, 128), jnp.float32),
        ),
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

    return out.reshape(B, H, L, D), lse


# Above this sequence length, K/V no longer stay resident in VMEM and the
# blocked online-softmax kernel takes over.
_FULL_KV_MAX_L = 2048


def _use_pallas(q: Array, k: Array, v: Array, mask, dropout_rate: float, floor: int = 512) -> bool:
    if dropout_rate > 0:
        return False
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
    # The default L >= 512 floor is measured, not aesthetic: below it XLA's
    # fused attention wins in context (dit32 bench 1.74x faster at L=256 via
    # XLA; adm256 neutral) and the L x L materialization is tiny anyway.
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


def _pallas_dispatch(q, k, v, scale, bias=None, bias_mode="one"):
    if q.shape[-2] > _FULL_KV_MAX_L:
        return _pallas_attention_blocked(q, k, v, scale, bias, bias_mode)
    else:
        return _pallas_attention(q, k, v, scale, bias, bias_mode)


def _bwd_block(L: int) -> int:
    for blk in (512, 256, 128):
        if L % blk == 0:
            return blk
    return L


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
) -> tuple[Array, Array, Array]:
    r"""Flash attention backward as two Pallas TPU kernels.

    Standard FlashAttention-2 recipe: the softmax is rebuilt blockwise from the
    saved log-sum-exp, `delta = rowsum(dO * O)` is folded in-kernel, and the
    L x L weight matrix is never materialized in HBM. The dQ kernel accumulates
    over sequential key blocks; the dK/dV kernel over sequential query blocks.
    Replaces the reference's cuDNN SDPA backward (`azula/nn/attention.py:98-104`).
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    BQ = _bwd_block(L)
    BK = _bwd_block(L)
    nq = L // BQ
    nk = L // BK

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)
    of = o.reshape(B * H, L, D)
    gf = g.reshape(B * H, L, D).astype(q.dtype)
    lsef = lse  # (B*H, L, 128), lane-replicated (see forward kernels)

    def _p_ds(q_blk, g_blk, o_blk, k_blk, v_blk, lse_blk, b_blk):
        r"""Rebuilds P and dS for one (query, key) block pair, in float32."""

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
        ds = p * (dp - delta) * scale
        return p, ds

    def dq_kernel(*refs):
        if bias is None:
            q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref, dq_ref, acc = refs
            b_ref = None
        else:
            q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref, b_ref, dq_ref, acc = refs

        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        _, ds = _p_ds(
            q_ref[0], g_ref[0], o_ref[0], k_ref[0], v_ref[0], lse_ref[0],
            None if b_ref is None else b_ref[0],
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
        if bias is None:
            q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref, dk_ref, dv_ref, kacc, vacc = refs
            b_ref = None
        else:
            (q_ref, k_ref, v_ref, o_ref, g_ref, lse_ref, b_ref,
             dk_ref, dv_ref, kacc, vacc) = refs

        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            kacc[:] = jnp.zeros_like(kacc)
            vacc[:] = jnp.zeros_like(vacc)

        p, ds = _p_ds(
            q_ref[0], g_ref[0], o_ref[0], k_ref[0], v_ref[0], lse_ref[0],
            None if b_ref is None else b_ref[0],
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _pallas_dispatch(q, k, v, scale)[0]


def _flash_fwd(q, k, v, scale):
    o, lse = _pallas_dispatch(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    return _pallas_attention_bwd(q, k, v, o, lse, g, scale)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_biased(
    q: Array, k: Array, v: Array, bias: Array, scale: float, bias_mode: str
) -> Array:
    return _pallas_dispatch(q, k, v, scale, bias, bias_mode)[0]


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


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Array | None = None,
    dropout_rate: float = 0.0,
    key: Array | None = None,
    scale: float | None = None,
    implementation: str | None = None,
) -> Array:
    r"""Computes scaled dot-product attention.

    .. math:: \mathrm{softmax}\left(\frac{q k^\top}{\sqrt{D}}\right) v

    Dispatches to the Pallas flash-attention kernel on TPU for long
    (:math:`L \ge 512`), dropout-free self-attention with aligned shapes —
    the measured crossover — and to a fused XLA implementation otherwise.

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

    Returns:
        The attention output, with shape :math:`(*, H, L, D)`.
    """

    if implementation not in (None, "auto", "pallas", "xla"):
        raise ValueError(f"unknown attention implementation '{implementation}'")

    if scale is None:
        scale = 1 / math.sqrt(q.shape[-1])

    if dropout_rate > 0:
        if key is None:
            raise ValueError("attention dropout requires a PRNG `key`")

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

    eligible = _use_pallas(q, k, v, mask, dropout_rate, floor=1 if implementation == "pallas" else 512)

    if implementation == "pallas" and not eligible:
        raise ValueError(
            "implementation='pallas' requires a TPU backend and a dropout-free "
            "self-attention with L % 128 == 0, D % 64 == 0, D <= 256 and a "
            "boolean (or no) mask"
        )

    if eligible and implementation in (None, "auto", "pallas"):
        if mask is None:
            return _flash(q, k, v, scale)
        bias, mode = _mask_to_bias(mask, q)
        return _flash_biased(q, k, v, bias, scale, mode)

    return _xla_attention(q, k, v, mask=mask, scale=scale)

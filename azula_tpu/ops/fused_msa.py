r"""Fused multi-head self-attention: QK-norm + RoPE + attention in one kernel.

TPU-native serving path for the transformer backbones (DiT / ViT / Flux / Sana
MSA blocks). The reference runs separate ops — head split, RMS norm, rotary
embedding, `F.scaled_dot_product_attention` (`azula/nn/attention.py:84-109`) —
which on TPU costs three materialized round trips per block: an f32
:math:`L \times L` softmax tensor at the XLA fusion boundary, layout copies for
the :math:`(B, L, 3HD) \to (3, B, H, L, D)` head transpose, and the norm/rope
elementwise passes (measured 40% of the DiT-S forward at B=128, L=256).

This kernel instead consumes the QKV projection output in its **native
matmul layout** :math:`(B, L, 3 H D)` and emits :math:`(B, L, H D)` — the
exact tensors the surrounding projections produce and consume, so XLA's
matmul fusions on either side stay intact and no transpose ever touches HBM.
Per program, the whole per-head pipeline runs in VMEM:

1. slice head :math:`h`'s query/key/value columns,
2. reduce the per-row RMS-norm factors :math:`r_q, r_k` of q, k — the
   normalization itself is **deferred**: since RoPE is a rotation and the
   dots are bilinear, :math:`\mathrm{norm}` commutes all the way to the
   logits, where it becomes an outer-product scaling
   :math:`(q k^\top) \cdot r_q r_k^\top` folded into the exp pass (no f32
   normalize-and-materialize of q/k, the kernel's hottest VPU phase),
3. rotate pairs by the positional angles. The interleaved pair swap
   :math:`x_{2i} \leftrightarrow x_{2i+1}` is lane-hostile on the VPU, so it
   runs as a :math:`D \times D` permutation matmul on the MXU (exact: one
   product per output lane), against precomputed full-width
   :math:`\cos` / signed-:math:`\sin` tables,
4. attention with f32 logits that never leave the core. With QK-norm on,
   the logits are bounded by :math:`\mathrm{scale} \cdot D` (Cauchy-Schwarz
   on unit-RMS rows), so the softmax exponentiates directly — the
   max-subtraction pass over the :math:`L \times L` tile is provably
   unnecessary.

Backward: gradients flow through an XLA reference implementation of the same
math (`custom_vjp` recomputes the forward — one extra forward per step, the
standard flash-attention trade).
"""

from __future__ import annotations

__all__ = [
    "fused_msa_attention",
    "fused_msa_eligible",
    "rope_tables",
]

import functools
import jax
import jax.numpy as jnp
import math

from jax import Array

# Full-K/V residency bound: Mosaic allocates the per-head f32 logits and
# softmax transients of every unrolled (batch, head) iteration separately on
# the kernel stack (no reuse), so the resident-L cap and the G * heads unroll
# bound below are what keep a program inside the raised VMEM limit.
_MAX_L = 512
_VMEM_LIMIT = 32 * 1024 * 1024


def rope_tables(theta: Array, heads: int) -> tuple[Array, Array]:
    r"""Expands per-head rotary angles into full-width cos / signed-sin tables.

    ``theta`` has shape :math:`(L, H \cdot D / 2)` with head-blocked features
    (the layout `MultiheadSelfAttention` produces). Returns f32 ``(cos2,
    sin2)`` of shape :math:`(L, H \cdot D)` such that the interleaved rotation
    (`nn.attention.apply_rope`) becomes

    .. math:: \mathrm{rope}(x) = x \cdot \mathrm{cos2} + \mathrm{swap}(x) \cdot \mathrm{sin2}

    where ``swap`` exchanges each even/odd lane pair. The sign of the sine is
    folded in per lane: :math:`-\sin` on even lanes, :math:`+\sin` on odd.
    """

    L, half = theta.shape
    D2 = half // heads

    th = theta.astype(jnp.float32).reshape(L, heads, D2)
    cos2 = jnp.repeat(jnp.cos(th), 2, axis=-1).reshape(L, 2 * half)
    sgn = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), D2)
    sin2 = (jnp.repeat(jnp.sin(th), 2, axis=-1) * sgn).reshape(L, 2 * half)

    return cos2, sin2


def _reference(
    qkv: Array,
    cos2: Array | None,
    sin2: Array | None,
    heads: int,
    eps: float | None,
    scale: float,
) -> Array:
    r"""XLA twin of the kernel math (same op order and rounding points);
    drives the backward pass and non-TPU backends."""

    B, L, C3 = qkv.shape
    C = C3 // 3
    D = C // heads

    x = qkv.reshape(B, L, 3, heads, D)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (B, L, H, D)

    def norm(z):
        z = z.astype(jnp.float32)
        return z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=-1, keepdims=True) + eps)

    if eps is not None:
        q, k = norm(q), norm(k)
    else:
        q, k = q.astype(jnp.float32), k.astype(jnp.float32)

    if cos2 is not None:
        c = cos2.astype(jnp.float32).reshape(L, heads, D)
        s = sin2.astype(jnp.float32).reshape(L, heads, D)

        def swap(z):
            return z.reshape(*z.shape[:-1], D // 2, 2)[..., ::-1].reshape(z.shape)

        q = q * c + swap(q) * s
        k = k * c + swap(k) * s

    q = q.astype(qkv.dtype)
    k = k.astype(qkv.dtype)

    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    d = jnp.sum(p, axis=-1, keepdims=True)

    if qkv.dtype == jnp.float32:
        o = jnp.einsum("bhqk,bkhd->bqhd", (p / d).astype(qkv.dtype), v)
        o = o.astype(qkv.dtype)
    else:
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(qkv.dtype), v, preferred_element_type=jnp.float32
        )
        o = (o / d.swapaxes(1, 2)).astype(qkv.dtype)

    return o.reshape(B, L, C)


def _reference_core_flash(qkv, cos2, sin2, heads, eps, scale):
    r"""The :func:`_reference` math with the attention core swapped for the
    flash `custom_vjp` (:func:`azula_tpu.ops.attention._flash`).

    Drives the backward on TPU: differentiating this instead of the
    materialized-softmax reference routes the attention core's forward
    recompute AND its gradient through the multi-pair Pallas kernels
    (`_pallas_attention_batched` / `_pallas_attention_batched_bwd`), which
    never write an :math:`L \times L` tensor to HBM. The norm/rope pre- and
    post-processing stays XLA but runs *mixed precision*: RMS statistics in
    float32, the normalization/rotation applied in the input dtype — for
    bf16 training the extra rounding is within the noise bf16 q/k already
    carry, and skipping the f32 round trips over the :math:`(B, L, H, D)`
    tensors (forward and in their vjp) measured 7.6 ms off the dit32 train
    step (66.6 -> 59.1 ms).
    """

    from .attention import _flash_blhd

    B, L, C3 = qkv.shape
    C = C3 // 3
    D = C // heads

    x = qkv.reshape(B, L, 3, heads, D)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (B, L, H, D)

    def norm(z):
        r = jax.lax.rsqrt(
            jnp.mean(jnp.square(z.astype(jnp.float32)), axis=-1, keepdims=True) + eps
        )
        return z * r.astype(z.dtype)

    if eps is not None:
        q, k = norm(q), norm(k)

    if cos2 is not None:
        c = cos2.astype(qkv.dtype).reshape(L, heads, D)
        s = sin2.astype(qkv.dtype).reshape(L, heads, D)

        def swap(z):
            return z.reshape(*z.shape[:-1], D // 2, 2)[..., ::-1].reshape(z.shape)

        q = q * c + swap(q) * s
        k = k * c + swap(k) * s

    # Projection-layout kernels: no head transpose materialized anywhere.
    o = _flash_blhd(
        q.reshape(B, L, C), k.reshape(B, L, C), v.reshape(B, L, C), heads, scale
    )

    return o


def _kernel_call(qkv, cos2, sin2, heads, eps, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    f32 = qkv.dtype == jnp.float32
    rope = cos2 is not None

    # Group several batch rows per program to amortize grid dispatch, but
    # bound the G * heads unroll: each unrolled iteration's f32 (L, L)
    # softmax transients live on the kernel stack simultaneously.
    G = 1
    for g in (8, 4, 2):
        if (
            B % g == 0
            and g * heads <= 12
            and g * L * C3 * qkv.dtype.itemsize <= 4 << 20
        ):
            G = g
            break

    # With QK-norm on, the softmax shortcut below exponentiates *unshifted*
    # logits; they are bounded by scale * D (Cauchy-Schwarz on unit-RMS rows,
    # |q_i . k_j| <= ||q_i|| ||k_j|| = D), so exp stays finite in f32 as long
    # as the bound is moderate. exp(30) * L < 1e17 — comfortably inside f32.
    nomax = eps is not None and scale * C / heads <= 30.0

    # Head-pair packing (r4 roofline fix): at D = 64 every per-head matmul
    # contracts over 64 (half the 128-deep MXU) or emits 64 lanes (half the
    # VPU/store width). Processing heads in PAIRS as lane-aligned (L, 128)
    # tiles restores full width everywhere:
    #
    #   logits = q01 (L, 128) @ [k0 | 0; 0 | k1] (2L, 128)^T -> (L, 2L)
    #
    # where the block-diagonal key stack (two lane-mask multiplies + a
    # sublane concat) kills the cross-head terms, so the packed contraction
    # is exact per head. PV runs as p (L, 2L) @ [v0 | 0; 0 | v1] (2L, 128)
    # -> (L, 128): one full-width op per pair instead of two half-width ones.
    # Same matmul FLOP-time as the half-depth pair, but half the op count and
    # full-lane VPU passes — measured 1.67 -> 1.36 ms/call harness-inclusive
    # on the dit32 block (tools/fused_msa_paired.py), ~1.9x on kernel time.
    R = 2 if (D == 64 and heads % 2 == 0) else 1
    W = R * D

    def kernel(*refs):
        refs = list(refs)
        qkv_ref = refs.pop(0)
        c_ref = refs.pop(0) if rope else None
        s_ref = refs.pop(0) if rope else None
        o_ref = refs.pop(0)

        if rope:
            # Pair-swap as a permutation matmul: P[i, j] = [j == i ^ 1]. The
            # MXU is idle during the rope/norm phase, so this is cheaper than
            # lane rolls on the VPU (measured: rolls+select lost ~5% e2e).
            # A 0/1 selection matrix is exact in every dtype; native-dtype
            # operands keep the MXU in single-pass mode (HIGHEST on f32
            # operands would cost 6 passes). The even/odd swap never crosses
            # a head boundary (D is even), so one (W, W) matrix serves the
            # packed tile as well.
            i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
            P = ((i ^ 1) == j).astype(qkv.dtype)

        if R > 1:
            # Lane masks selecting each head's D-lane half of a packed tile.
            lane = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
            masks = [((lane // D) == r).astype(qkv.dtype) for r in range(R)]
            if eps is not None:
                # Mean-over-own-head-lanes operator: one MXU op computes both
                # heads' per-row mean squares, replicated across each lane
                # half (so the fold factors below are plain lane slices).
                mi = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
                mj = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
                mavg = ((mi // D) == (mj // D)).astype(jnp.float32) / D

        def packed(xb, g, pk):
            c0 = pk * W
            qp = xb[:, c0 : c0 + W]  # (L, W) = [q0 | q1]
            kp = xb[:, C + c0 : C + c0 + W]
            vp = xb[:, 2 * C + c0 : 2 * C + c0 + W]

            if eps is not None:
                rq = jax.lax.rsqrt(
                    jax.lax.dot_general(
                        jnp.square(qp.astype(jnp.float32)), mavg,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + eps
                )  # (L, W), constant within each lane half
                rk = jax.lax.rsqrt(
                    jax.lax.dot_general(
                        jnp.square(kp.astype(jnp.float32)), mavg,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + eps
                )

            if rope:
                cp = c_ref[0][:, c0 : c0 + W]
                sp = s_ref[0][:, c0 : c0 + W]
                prec = None if not f32 else jax.lax.Precision.HIGHEST
                swap_q = jnp.dot(qp, P, preferred_element_type=jnp.float32, precision=prec)
                swap_k = jnp.dot(kp, P, preferred_element_type=jnp.float32, precision=prec)
                qp = (qp.astype(jnp.float32) * cp + swap_q * sp).astype(qkv.dtype)
                kp = (kp.astype(jnp.float32) * cp + swap_k * sp).astype(qkv.dtype)

            bd_k = jnp.concatenate([kp * m for m in masks], axis=0)  # (R L, W)
            logits = jax.lax.dot_general(
                qp, bd_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (L, R L) = [q0 k0^T | q1 k1^T]

            ps, ds = [], []
            for r in range(R):
                lr = logits[:, r * L : (r + 1) * L]
                if eps is not None:
                    lr = (lr * (scale * rq[:, r * D : r * D + 1])) * rk[
                        :, r * D : r * D + 1
                    ].reshape(1, L)
                else:
                    lr = lr * scale
                if nomax:
                    pr = jnp.exp(lr)
                else:
                    pr = jnp.exp(lr - jnp.max(lr, axis=-1, keepdims=True))
                dr = jnp.sum(pr, axis=-1, keepdims=True)
                ps.append((pr / dr) if f32 else pr)
                ds.append(dr)

            p = jnp.concatenate(ps, axis=1).astype(vp.dtype)  # (L, R L)
            bd_v = jnp.concatenate([vp * m for m in masks], axis=0)  # (R L, W)
            o = jax.lax.dot_general(
                p, bd_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (L, W) = [o0 | o1]

            if not f32:
                dinv = jnp.concatenate(
                    [jnp.broadcast_to(d, (L, D)) for d in ds], axis=1
                )
                o = o / dinv
            o_ref[g, :, c0 : c0 + W] = o.astype(o_ref.dtype)

        if R > 1:
            for g in range(G):
                xb = qkv_ref[g]  # (L, 3C)
                for pk in range(heads // R):
                    packed(xb, g, pk)
            return

        for g in range(G):
            xb = qkv_ref[g]  # (L, 3C)
            for h in range(heads):
                qh = xb[:, h * D : (h + 1) * D]
                kh = xb[:, C + h * D : C + (h + 1) * D]
                vh = xb[:, 2 * C + h * D : 2 * C + (h + 1) * D]

                if eps is not None:
                    # RMS-norm commutes through the dots: norm(q) @ norm(k)^T
                    # = (q @ k^T) * rq rk^T, an outer-product scaling of the
                    # logits. Computing only the per-row factors here (two
                    # (L, 1) reductions) and folding the scaling into the exp
                    # pass below skips the f32 normalize-and-materialize of q
                    # and k entirely — the kernel's hottest VPU phase.
                    rq = jax.lax.rsqrt(
                        jnp.mean(
                            jnp.square(qh.astype(jnp.float32)), -1, keepdims=True
                        )
                        + eps
                    )
                    rk = jax.lax.rsqrt(
                        jnp.mean(
                            jnp.square(kh.astype(jnp.float32)), -1, keepdims=True
                        )
                        + eps
                    )

                if rope:
                    # RoPE is a rotation — it commutes with the row scaling
                    # rq/rk, so it can act on the raw (unnormalized) heads.
                    ch = c_ref[0][:, h * D : (h + 1) * D]
                    sh = s_ref[0][:, h * D : (h + 1) * D]
                    # bf16 operands are exact under a 0/1 selection matrix in
                    # a single MXU pass; f32 operands need HIGHEST or the
                    # default bf16 pass truncates their mantissa.
                    prec = None if not f32 else jax.lax.Precision.HIGHEST
                    swap_q = jnp.dot(
                        qh, P, preferred_element_type=jnp.float32, precision=prec
                    )
                    swap_k = jnp.dot(
                        kh, P, preferred_element_type=jnp.float32, precision=prec
                    )
                    qh = (qh.astype(jnp.float32) * ch + swap_q * sh).astype(
                        qkv.dtype
                    )
                    kh = (kh.astype(jnp.float32) * ch + swap_k * sh).astype(
                        qkv.dtype
                    )

                logits = jax.lax.dot_general(
                    qh,
                    kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if eps is not None:
                    # Associated as (logits * col) * row: the two broadcast
                    # multiplies fuse into the exp pass below for free
                    # (measured: folding them into the rope epilogue instead
                    # lost 7% end-to-end), and no (L, L) outer-product
                    # intermediate is formed.
                    logits = (logits * (scale * rq)) * rk.reshape(1, L)
                else:
                    logits = logits * scale

                if nomax:
                    # Bounded logits (see above): exponentiate directly, no
                    # max pass over the (L, L) tile.
                    p = jnp.exp(logits)
                else:
                    m = jnp.max(logits, axis=-1, keepdims=True)
                    p = jnp.exp(logits - m)
                d = jnp.sum(p, axis=-1, keepdims=True)

                # Same normalization order as the standalone flash kernels:
                # f32 divides the weights (XLA bit parity), bf16 divides the
                # (L, D) product — L/D x fewer divisions, equal rounding.
                if f32:
                    o = jnp.dot(
                        (p / d).astype(vh.dtype), vh, preferred_element_type=jnp.float32
                    )
                    o_ref[g, :, h * D : (h + 1) * D] = o.astype(o_ref.dtype)
                else:
                    o = jnp.dot(
                        p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
                    )
                    o_ref[g, :, h * D : (h + 1) * D] = (o / d).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((G, L, C3), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qkv]
    if rope:
        for t in (cos2, sin2):
            in_specs.append(
                pl.BlockSpec((1, L, C), lambda n: (0, 0, 0), memory_space=pltpu.VMEM)
            )
            operands.append(t[None])

    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, L, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * L * L * D + (4 * B * L * C * D if rope else 0),
            bytes_accessed=(3 + 1) * B * L * C * qkv.dtype.itemsize,
            transcendentals=B * heads * L * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(qkv, cos2, sin2, heads, eps, scale):
    return _kernel_call(qkv, cos2, sin2, heads, eps, scale)


def _fused_fwd(qkv, cos2, sin2, heads, eps, scale):
    # This runs ONLY under differentiation (the no-grad primal above keeps
    # the serving kernel). Running the flash composition here — instead of
    # the serving kernel plus a full recompute in the backward — saves one
    # attention forward per layer per train step; the returned vjp closure
    # (a pytree of residual arrays) rides as the custom_vjp residual.
    ref = _reference_core_flash if jax.default_backend() == "tpu" else _reference
    out, vjp = jax.vjp(
        lambda a, b, c: ref(a, b, c, heads, eps, scale), qkv, cos2, sin2
    )
    return out, vjp


def _fused_bwd(heads, eps, scale, residuals, g):
    return residuals(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_msa_eligible(
    x: Array, heads: int, theta: Array | None, mask, dropout: float, key
) -> bool:
    r"""True when the fused path applies: TPU backend, 3D unbatched-position
    self-attention, aligned resident shapes, no mask, no dropout."""

    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 3 or mask is not None:
        return False
    if key is not None and dropout > 0:
        return False
    if theta is not None and theta.ndim != 2:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False

    L = x.shape[-2]
    C = x.shape[-1]
    D = C // heads

    # heads bound: one (L, L) f32 transient per unrolled head (see _kernel_call)
    return (
        L % 128 == 0
        and 128 <= L <= _MAX_L
        and D % 64 == 0
        and D <= 256
        and heads <= 12
    )


def fused_msa_attention(
    qkv: Array,
    heads: int,
    theta: Array | None = None,
    eps: float | None = 1e-5,
    scale: float | None = None,
) -> Array:
    r"""Computes QK-normalized, rotary-embedded multi-head self-attention
    directly on the fused QKV projection output.

    Arguments:
        qkv: The QKV projection output, with shape :math:`(B, L, 3 H D)` and
            feature layout :math:`[q | k | v]`, each head-blocked.
        heads: The number of attention heads :math:`H`.
        theta: Optional rotary angles, with shape :math:`(L, H D / 2)`
            (head-blocked, as produced by the learned `theta_proj`).
        eps: The QK RMS-norm epsilon, or :py:`None` to skip normalization.
        scale: Logit scale; defaults to :math:`1 / \sqrt{D}`.

    Returns:
        The attention output, with shape :math:`(B, L, H D)`, ready for the
        output projection — heads are merged in the same feature layout the
        unfused path produces.
    """

    C = qkv.shape[-1] // 3
    D = C // heads

    if scale is None:
        scale = 1 / math.sqrt(D)

    if theta is not None:
        cos2, sin2 = rope_tables(theta, heads)
    else:
        cos2 = sin2 = None

    if jax.default_backend() != "tpu":
        return _reference(qkv, cos2, sin2, heads, eps, scale)

    return _fused(qkv, cos2, sin2, heads, eps, scale)

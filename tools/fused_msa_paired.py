r"""Head-pair packed fused-MSA kernel prototype vs the shipped structure.

The shipped kernel (ops/fused_msa.py) iterates heads one at a time: every
matmul contracts over D=64 (half the 128-deep MXU) or emits N=64 (half the
lane width), and every VPU op runs on (L, 64) half-width tiles. This
prototype processes heads in PAIRS as lane-aligned (L, 128) tiles:

- q/k/v pair slices are contiguous 128-lane columns of the qkv row (free),
- QK^T runs as q01 (L, 128) @ bd(k01) (2L, 128)^T -> (L, 2L) where bd() is
  the block-diagonal stack [k0 | 0; 0 | k1] built with two lane-mask
  multiplies and a sublane concat: the contraction is 128 deep (full MXU)
  and head cross-terms are killed by the zero blocks,
- the QK-norm factors fold per lane-half into the logits exactly as the
  shipped kernel folds them per head,
- PV runs as p (L, 2L) @ bd(v01) (2L, 128) -> (L, 128): 2L-deep contraction,
  full-width output, one aligned store per pair.

Same matmul FLOP *time* as the half-depth pair of ops, but in one full-width
op each — the win is op-count, instruction overhead, and full-lane VPU.

Usage: python tools/fused_msa_paired.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, C, H = 128, 256, 384, 6
D = C // H
EPS = 1e-5
SCALE = D**-0.5
G = 2


def make_current():
    r"""The shipped per-head structure (ops/fused_msa.py), minus rope."""

    def kernel(qkv_ref, o_ref):
        for g in range(G):
            xb = qkv_ref[g]
            for h in range(H):
                qh = xb[:, h * D : (h + 1) * D]
                kh = xb[:, C + h * D : C + (h + 1) * D]
                vh = xb[:, 2 * C + h * D : 2 * C + (h + 1) * D]

                rq = jax.lax.rsqrt(
                    jnp.mean(jnp.square(qh.astype(jnp.float32)), -1, keepdims=True) + EPS
                )
                rk = jax.lax.rsqrt(
                    jnp.mean(jnp.square(kh.astype(jnp.float32)), -1, keepdims=True) + EPS
                )
                logits = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                logits = (logits * (SCALE * rq)) * rk.reshape(1, L)
                p = jnp.exp(logits)
                d = jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
                o_ref[g, :, h * D : (h + 1) * D] = (o / d).astype(o_ref.dtype)

    return kernel


def make_paired():
    def kernel(qkv_ref, o_ref):
        # Lane masks for the block-diagonal builds, shared across pairs.
        lane = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * D), 1)
        left = (lane < D).astype(jnp.bfloat16)
        right = 1.0 - left
        # Per-head mean-over-lane-half operator: (2D, 2D) block matrix.
        i = jax.lax.broadcasted_iota(jnp.int32, (2 * D, 2 * D), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (2 * D, 2 * D), 1)
        mavg = ((i < D) == (j < D)).astype(jnp.float32) / D

        for g in range(G):
            xb = qkv_ref[g]
            for pair in range(H // 2):
                c0 = pair * 2 * D
                q01 = xb[:, c0 : c0 + 2 * D]  # (L, 128) = [q0 | q1]
                k01 = xb[:, C + c0 : C + c0 + 2 * D]
                v01 = xb[:, 2 * C + c0 : 2 * C + c0 + 2 * D]

                # Per-row, per-half mean square -> rsqrt, replicated per lane
                # half: one MXU op instead of two half-width reductions.
                msq_q = jax.lax.dot_general(
                    jnp.square(q01.astype(jnp.float32)), mavg,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                msq_k = jax.lax.dot_general(
                    jnp.square(k01.astype(jnp.float32)), mavg,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                rq = jax.lax.rsqrt(msq_q + EPS)  # (L, 128), half-constant
                rk = jax.lax.rsqrt(msq_k + EPS)

                # Block-diagonal key stack: rows 0..L-1 hold [k0 | 0], rows
                # L..2L-1 hold [0 | k1]; the zero blocks kill cross-head terms.
                bd_k = jnp.concatenate([k01 * left, k01 * right], axis=0)  # (2L, 2D)
                logits = jax.lax.dot_general(
                    q01, bd_k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (L, 2L) = [q0 k0^T | q1 k1^T], 128-deep contraction

                # Fold the norm factors per half: row factors from rq's
                # constant lane-halves, column factors via the (L,1)->(1,L)
                # reshape the shipped kernel uses.
                l0 = (logits[:, :L] * (SCALE * rq[:, :1])) * rk[:, :1].reshape(1, L)
                l1 = (logits[:, L:] * (SCALE * rq[:, D : D + 1])) * rk[
                    :, D : D + 1
                ].reshape(1, L)
                p = jnp.exp(jnp.concatenate([l0, l1], axis=1))  # (L, 2L)

                d0 = jnp.sum(p[:, :L], axis=-1, keepdims=True)  # (L, 1)
                d1 = jnp.sum(p[:, L:], axis=-1, keepdims=True)

                bd_v = jnp.concatenate([v01 * left, v01 * right], axis=0)  # (2L, 2D)
                o = jax.lax.dot_general(
                    p.astype(v01.dtype), bd_v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (L, 2D) = [p0 v0 | p1 v1]

                dinv = jnp.concatenate(
                    [jnp.broadcast_to(d0, (L, D)), jnp.broadcast_to(d1, (L, D))], axis=1
                )
                o_ref[g, :, c0 : c0 + 2 * D] = (o / dinv).astype(o_ref.dtype)

    return kernel


def call(kernel, qkv):
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, L, 3 * C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, L, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qkv)


def timeit(fn, qkv, reps=32, n=3):
    @jax.jit
    def loop(qkv):
        def body(c, _):
            o = fn(c)
            return c + (jnp.min(o) * 1e-20).astype(c.dtype), None

        c, _ = jax.lax.scan(body, qkv, length=reps)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(qkv))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(qkv))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    qkv = jax.random.normal(jax.random.key(0), (B, L, 3 * C), dtype=jnp.bfloat16)

    cur = jax.jit(lambda x: call(make_current(), x))
    par = jax.jit(lambda x: call(make_paired(), x))

    a = cur(qkv)
    b = par(qkv)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |current - paired| = {err:.2e}")

    for tag, k in (("current", make_current()), ("paired ", make_paired())):
        dt = timeit(lambda x, k=k: call(k, x), qkv)
        print(f"  {tag}: {dt * 1e3:7.3f} ms/call (harness-inclusive)")


if __name__ == "__main__":
    main()

r"""Micro-benchmark: fused-MSA kernel structure variants at the dit32 shape.

The r4 roofline audit (tools/dit_roofline.py) put the shipped fused-MSA kernel
at 0.646 ms standalone per DiTBlock (B=128, L=256, C=384, H=6, bf16) — ~10 us
per program against a ~7 us serial MXU+VPU floor and a 0.13 ms HBM roofline.
This micro sweeps the kernel's structural knobs to find where the time goes:

- G (batch rows per program): sets the per-program unroll (G * heads
  iterations) and the grid size (B / G programs). Large G amortizes grid
  dispatch but piles every iteration's f32 (L, L) softmax transients onto the
  kernel stack simultaneously (Mosaic does not reuse them).
- dimension_semantics 'arbitrary' vs 'parallel': whether Mosaic may pipeline
  programs across the grid.

Usage: python tools/fused_msa_micro.py
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


def make_kernel(G, semantics):
    def kernel(qkv_ref, o_ref):
        for g in range(G):
            xb = qkv_ref[g]  # (L, 3C)
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

    def call(qkv):
        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, L, 3 * C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, L, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * L * L * D,
                bytes_accessed=4 * B * L * C * 2,
                transcendentals=B * H * L * L,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,),
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
        )(qkv)

    return call


def timeit(fn, qkv, reps=32, n=3):
    @jax.jit
    def loop(qkv):
        def body(c, _):
            o = fn(c)
            # data-dependent reinjection so scan iterations cannot CSE
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

    print(f"fused MSA variants at dit32 shape B={B} L={L} C={C} H={H} bf16")
    for G in (1, 2, 4, 8):
        for semantics in ("arbitrary", "parallel"):
            try:
                dt = timeit(make_kernel(G, semantics), qkv)
                tf = 4 * B * H * L * L * D / dt / 1e12
                print(f"  G={G} {semantics:9s}: {dt * 1e3:7.3f} ms  {tf:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"  G={G} {semantics:9s}: FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()

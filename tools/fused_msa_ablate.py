r"""Phase ablation of the fused-MSA kernel at the dit32 shape.

Same harness as tools/fused_msa_micro.py; each variant removes one phase of
the per-head pipeline so the difference against 'full' prices that phase:

- noexp: replace exp(logits) with logits (kills the VPU transcendental pass)
- nonorm: skip the rq/rk fold into the logits
- noqk: replace the QK^T matmul with a broadcast of q's first column
- nopv: write the row-sum of p instead of the PV matmul

Usage: python tools/fused_msa_ablate.py
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


def make_kernel(variant):
    def kernel(qkv_ref, o_ref):
        for g in range(G):
            xb = qkv_ref[g]
            for h in range(H):
                qh = xb[:, h * D : (h + 1) * D]
                kh = xb[:, C + h * D : C + (h + 1) * D]
                vh = xb[:, 2 * C + h * D : 2 * C + (h + 1) * D]

                if variant != "nonorm":
                    rq = jax.lax.rsqrt(
                        jnp.mean(jnp.square(qh.astype(jnp.float32)), -1, keepdims=True)
                        + EPS
                    )
                    rk = jax.lax.rsqrt(
                        jnp.mean(jnp.square(kh.astype(jnp.float32)), -1, keepdims=True)
                        + EPS
                    )

                if variant == "noqk":
                    logits = jnp.broadcast_to(
                        qh.astype(jnp.float32)[:, :1], (L, L)
                    )
                else:
                    logits = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if variant == "nonorm":
                    logits = logits * SCALE
                else:
                    logits = (logits * (SCALE * rq)) * rk.reshape(1, L)

                if variant == "noexp":
                    p = logits
                else:
                    p = jnp.exp(logits)
                d = jnp.sum(p, axis=-1, keepdims=True)

                if variant == "nopv":
                    o_ref[g, :, h * D : (h + 1) * D] = jnp.broadcast_to(
                        d, (L, D)
                    ).astype(o_ref.dtype)
                else:
                    o = jnp.dot(
                        p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
                    )
                    o_ref[g, :, h * D : (h + 1) * D] = (o / d).astype(o_ref.dtype)

    def call(qkv):
        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, L, 3 * C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((G, L, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
        )(qkv)

    return call


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

    print(f"fused MSA phase ablation, dit32 shape, G={G}")
    base = None
    for variant in ("full", "noexp", "nonorm", "noqk", "nopv"):
        dt = timeit(make_kernel(variant), qkv)
        if variant == "full":
            base = dt
        print(f"  {variant:7s}: {dt * 1e3:7.3f} ms  (delta {1e3 * (base - dt):+.3f})")


if __name__ == "__main__":
    main()

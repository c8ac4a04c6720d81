r"""Capture a profiler trace of the dit32 bench forward (DiT-S-class ViT).

Usage: python tools/profile_dit.py [outdir=/tmp/dittrace]
Then:  python tools/trace_breakdown.py /tmp/dittrace 40
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dittrace"

    sys.path.insert(0, ".")
    from bench import _dit32

    from azula_tpu.utils.pytree import combine, partition

    key = jax.random.key(0)
    _, denoiser, B, shape, _ = _dit32(key)

    params, static = partition(denoiser)

    x = jax.random.normal(jax.random.key(1), (B, *shape), dtype=jnp.bfloat16)
    t = jnp.full((B,), 0.5, dtype=jnp.bfloat16)

    @jax.jit
    def fwd(params, x, t):
        def body(c, _):
            return combine(params, static)(c, t).mean, None

        y, _ = jax.lax.scan(body, x, length=8)
        return jnp.sum(y.astype(jnp.float32))

    float(fwd(params, x, t))  # compile

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(params, x, t))
        ts.append(time.perf_counter() - t0)
    print(f"8-forward scan: {min(ts) * 1000:.2f} ms -> {min(ts) / 8 * 1000:.3f} ms/fwd")

    with jax.profiler.trace(outdir):
        float(fwd(params, x, t))

    print("trace written to", outdir)


if __name__ == "__main__":
    main()

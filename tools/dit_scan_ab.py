r"""A/B: unrolled DiT block stack vs `lax.scan` over stacked block params.

Measures the dit32 bench backbone's 12-block stack both ways (plus the full
forward) to decide whether scan-over-blocks helps serving throughput
(VERDICT r2 next-step #1).

Usage: PYTHONPATH=/root/.axon_site:. python tools/dit_scan_ab.py
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=8, n=3):
    @jax.jit
    def loop(*args):
        def body(c, _):
            return fn(*((c,) + args[1:])), None

        y, _ = jax.lax.scan(body, args[0], length=reps)
        return jnp.sum(y.astype(jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    from bench import _dit32

    from azula_tpu.parallel.pp import stack_modules

    key = jax.random.key(0)
    _, denoiser, B, shape, _ = _dit32(key)

    blocks = denoiser.backbone.backbone.blocks  # Modulated(ViT).blocks

    L, C = 256, 384
    x = jax.random.normal(jax.random.key(1), (B, L, C), dtype=jnp.bfloat16)
    mod = jax.random.normal(
        jax.random.key(2), (B, blocks[0].ada_zero.lin1.weight.shape[0]), dtype=jnp.bfloat16
    )

    def unrolled(x, mod):
        for b in blocks:
            x = b(x, mod)
        return x

    stacked, apply = stack_modules(blocks)

    def scanned(x, stacked, mod):
        def body(c, p):
            return apply(p, c, mod), None

        y, _ = jax.lax.scan(body, x, stacked)
        return y

    t_unroll = timeit(unrolled, x, mod)
    t_scan = timeit(scanned, x, stacked, mod)

    print(f"unrolled 12-block stack: {t_unroll * 1e3:7.3f} ms")
    print(f"scanned  12-block stack: {t_scan * 1e3:7.3f} ms  ({t_unroll / t_scan:.2f}x)")


if __name__ == "__main__":
    main()

r"""Micro-benchmark: XLA attention vs the Pallas kernels across sequence
lengths, to set the auto-dispatch floor (`_use_pallas`).

Each variant runs inside a `lax.scan` of 32 applications so per-call dispatch
cost through the remote-TPU transport does not pollute the numbers.

Usage: python tools/attn_micro.py
"""

import time

import jax
import jax.numpy as jnp

from azula_tpu.ops.attention import _flash, _xla_attention


def timeit(fn, *args, reps=32, n=3):
    @jax.jit
    def loop(*args):
        def body(c, _):
            q, k, v = c
            o = fn(q, k, v)
            return (o, k, v), None

        (o, _, _), _ = jax.lax.scan(body, args, length=reps)
        return jnp.sum(o.astype(jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    key = jax.random.key(0)
    scale = None

    cases = [
        # (tag, B, H, L, D)
        ("dit32 ", 128, 6, 256, 64),
        ("dit-L1", 128, 6, 128, 64),
        ("dit-L5", 128, 6, 512, 64),
        ("adm64 ", 8, 4, 64, 64),
        ("adm256", 8, 4, 256, 64),
        ("adm1k ", 8, 4, 1024, 64),
        ("sana1k", 2, 36, 1024, 32),
        ("big4k ", 2, 8, 4096, 64),
    ]

    for tag, B, H, L, D in cases:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, hash(tag) % 2**31), 3)
        q = jax.random.normal(k1, (B, H, L, D), dtype=jnp.bfloat16)
        k = jax.random.normal(k2, (B, H, L, D), dtype=jnp.bfloat16)
        v = jax.random.normal(k3, (B, H, L, D), dtype=jnp.bfloat16)

        import math

        s = 1 / math.sqrt(D)

        t_xla = timeit(lambda q, k, v: _xla_attention(q, k, v, scale=s), q, k, v)
        try:
            t_pls = timeit(lambda q, k, v: _flash(q, k, v, s), q, k, v)
        except Exception as e:
            t_pls = float("nan")
            print(tag, "pallas failed:", type(e).__name__, str(e)[:100])

        flops = 4 * B * H * L * L * D
        print(
            f"{tag} B={B:<3} H={H:<2} L={L:<5} D={D}: "
            f"xla {t_xla * 1e3:7.3f} ms ({flops / t_xla / 1e12:6.1f} TF/s)  "
            f"pallas {t_pls * 1e3:7.3f} ms ({flops / t_pls / 1e12:6.1f} TF/s)  "
            f"speedup {t_xla / t_pls:5.2f}x"
        )


if __name__ == "__main__":
    main()

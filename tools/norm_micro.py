r"""Micro-benchmark of group-norm statistics variants at ADM-256 shapes.

Context: the shifted-moment fix (ADVICE r2 — raw E[x^2]-E[x]^2 cancels
catastrophically in float32 when |mean| >> std) regressed the adm256 bench
1.129 -> 1.067 img/s. This micro isolates the statistics pass to find a
variant that keeps the cancellation robustness without losing the fused
single-pass reduction.

Variants:
  raw      — one-pass E[x^2] - E[x]^2 (r2 fast path, cancellation-prone)
  pilot    — shift by x[:, 0, :] inside the same fusion (current, slow?)
  barrier  — pilot behind lax.optimization_barrier (cuts the fusion edge)
  twopass  — mean pass then centered sumsq pass (2x bandwidth reference)

Usage: python tools/norm_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, x, reps=128, n=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(x + c)
            return jnp.min(y).astype(x.dtype) * jnp.asarray(1e-20, x.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), length=reps)
        return c.astype(jnp.float32)

    float(loop(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def apply_stats(x, mean, var, groups, eps=1e-5):
    B, *spatial, C = x.shape
    inv = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(inv, C // groups, axis=-1)
    b = jnp.repeat(-mean * inv, C // groups, axis=-1)
    shape = (B,) + (1,) * len(spatial) + (C,)
    y = x * a.reshape(shape).astype(x.dtype) + b.reshape(shape).astype(x.dtype)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


def gn_raw(x, groups, eps=1e-5):
    B, *spatial, C = x.shape
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(jnp.square(xf), axis=1)
    n = (x.size // B) // groups
    gs1 = jnp.sum(s1.reshape(B, groups, -1), axis=-1)
    gs2 = jnp.sum(s2.reshape(B, groups, -1), axis=-1)
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
    return apply_stats(x, mean, var, groups, eps)


def _gn_shifted(x, groups, shift, eps=1e-5):
    B, *spatial, C = x.shape
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    d = xf - shift
    t1 = jnp.sum(d, axis=1)
    t2 = jnp.sum(jnp.square(d), axis=1)
    HW = x.size // (B * C)
    n = HW * (C // groups)
    Kg = shift.reshape(B, groups, -1)
    t1g = t1.reshape(B, groups, -1)
    t2g = t2.reshape(B, groups, -1)
    mean = jnp.sum(t1g + HW * Kg, axis=-1) / n
    e = Kg - mean[..., None]
    var = (
        jnp.sum(t2g, axis=-1)
        + 2 * jnp.sum(e * t1g, axis=-1)
        + HW * jnp.sum(jnp.square(e), axis=-1)
    ) / n
    var = jnp.maximum(var, 0.0)
    return apply_stats(x, mean, var, groups, eps)


def gn_pilot(x, groups, eps=1e-5):
    B, *spatial, C = x.shape
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    return _gn_shifted(x, groups, xf[:, :1, :], eps)


def gn_barrier(x, groups, eps=1e-5):
    B, *spatial, C = x.shape
    shift = x.reshape(B, -1, C)[:, :1, :].astype(jnp.float32)
    shift = jax.lax.optimization_barrier(shift)
    return _gn_shifted(x, groups, shift, eps)


def gn_twopass(x, groups, eps=1e-5):
    B, *spatial, C = x.shape
    xf = x.reshape(B, -1, C).astype(jnp.float32)
    n = (x.size // B) // groups
    s1 = jnp.sum(xf, axis=1)
    mean = jnp.sum(s1.reshape(B, groups, -1), axis=-1) / n
    mc = jnp.repeat(mean, C // groups, axis=-1)[:, None, :]
    s2 = jnp.sum(jnp.square(xf - mc), axis=1)
    var = jnp.maximum(jnp.sum(s2.reshape(B, groups, -1), axis=-1) / n, 0.0)
    return apply_stats(x, mean, var, groups, eps)


def gn_lazy(x, groups, eps=1e-5):
    r"""The shipped default (`ops/norm.py` 'lazy'): raw fused moments with a
    `lax.cond` exact rescue above the 16 MB adaptive cutoff, pilot-shifted
    single pass below it; dispatched through the fused group-norm+SiLU."""

    from azula_tpu.ops.norm import group_norm_silu

    return group_norm_silu(x, groups, eps=eps)


VARIANTS = {
    "raw": gn_raw,
    "pilot": gn_pilot,
    "barrier": gn_barrier,
    "twopass": gn_twopass,
    "lazy": gn_lazy,
}

# Dominant ADM-256 stage shapes (B=8): (spatial, channels)
SHAPES = [
    (256, 256),
    (128, 256),
    (64, 512),
    (32, 512),
    (16, 1024),
]


def main():
    key = jax.random.key(0)
    print(f"{'shape':>16s}", *(f"{k:>9s}" for k in VARIANTS), sep="  ")
    for hw, c in SHAPES:
        x = jax.random.normal(key, (8, hw, hw, c), dtype=jnp.bfloat16)
        row = []
        for name, fn in VARIANTS.items():
            dt = timeit(lambda z, fn=fn: fn(z, 32), x)
            row.append(f"{dt * 1e6:8.1f}u")
        print(f"{f'8x{hw}x{hw}x{c}':>16s}", *row, sep="  ")

    # numerics check: large-mean robustness. Two shapes: C=32 exercises the
    # XLA fallback, C=256 (aligned, multi-block spatial) the Pallas kernel.
    for shape, groups in [((2, 16, 16, 32), 8), ((2, 96, 96, 256), 32)]:
        x = (4096.0 + 0.1 * jax.random.normal(key, shape)).astype(jnp.float32)
        print(f"shape {shape}:")
        for name, fn in VARIANTS.items():
            y = fn(x, groups)
            # silu(gn) of well-scaled stats stays bounded; cancellation blows up
            print(f"{name:>9s}: max|y| = {float(jnp.max(jnp.abs(y))):.3f}")


if __name__ == "__main__":
    main()

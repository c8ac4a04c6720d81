r"""Per-op roofline audit of the dit32 bench forward (VERDICT r2 next-step #1).

Times every constituent primitive of one DiTBlock standalone — jitted and
scanned on-device at the exact bench shapes (B=128, L=256, C=384, H=6, bf16)
— then compares

    sum(standalone achievable times) x 12 blocks + patch/head overhead
        vs
    the measured end-to-end forward.

If end-to-end <= ~1.1x the sum of parts, the composed program is at >=90%
of what the chip achieves on its own constituent ops: the remaining MFU gap
is per-shape primitive efficiency (the D=64 attention QK dot can use at most
half of the 128-deep MXU; the C=384 contraction runs below peak), not
composition/fusion losses we can recover.

Harness: each iteration computes ``fn(x + c)`` where ``c`` is a data-dependent
scalar carry (``min(y) * 1e-20``) — the scan cannot CSE across iterations, the
host->device dispatch of the remote TPU relay is paid once per 256 iterations,
and the per-iteration overhead is one scalar broadcast-add (fused into the
op's operand read by XLA) plus a reduce, instead of the ~0.8 ms full-tensor
carry copy of the previous harness. The measured identity floor is printed
and subtracted from the Pallas row (a kernel boundary cannot fuse the add);
XLA rows absorb it into their operand fusions.

Usage: python tools/dit_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, L, C, H = 128, 256, 384, 6
F = 4 * C  # ffn width
M = B * L
PEAK = 197e12  # v5e bf16 peak FLOP/s


def timeit(fn, x, *args, reps=256, n=3):
    r"""On-device scan timing with a scalar dependency carry (see module doc)."""

    @jax.jit
    def loop(x, *args):
        def body(c, _):
            y = fn(x + c, *args)
            return jnp.min(y).astype(x.dtype) * jnp.asarray(1e-20, x.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), length=reps)
        return c.astype(jnp.float32)

    float(loop(x, *args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(x, *args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)

    x = jax.random.normal(ks[0], (M, C), dtype=jnp.bfloat16)
    w_qkv = jax.random.normal(ks[1], (C, 3 * C), dtype=jnp.bfloat16) * 0.02
    b_qkv = jnp.zeros((3 * C,), dtype=jnp.bfloat16)
    w_proj = jax.random.normal(ks[2], (C, C), dtype=jnp.bfloat16) * 0.02
    w_f1 = jax.random.normal(ks[3], (C, F), dtype=jnp.bfloat16) * 0.02
    b_f1 = jnp.zeros((F,), dtype=jnp.bfloat16)
    w_f2 = jax.random.normal(ks[4], (F, C), dtype=jnp.bfloat16) * 0.02
    qkv = jax.random.normal(ks[5], (B, L, 3 * C), dtype=jnp.bfloat16)
    mod3 = jax.random.normal(ks[9], (B, 1, 3 * C), dtype=jnp.bfloat16)
    theta = jax.random.normal(ks[10], (L, C // 2), dtype=jnp.bfloat16)

    rows = []

    def row(name, dt, flops, count=1):
        rows.append((name, dt * 1e3, flops / dt / 1e12 if flops else 0.0, count))

    # -- harness floor on the kernel-input shape --
    floor = timeit(lambda z: z, qkv)

    # -- matmuls (scalar-carry chained to defeat CSE; weights constant) --
    row("qkv  (M,C)@(C,3C)+b", timeit(lambda x: x @ w_qkv + b_qkv, x), 2 * M * C * 3 * C)
    row("proj (M,C)@(C,C)", timeit(lambda x: x @ w_proj, x), 2 * M * C * C)
    row(
        "ffn  fc1+silu+fc2",
        timeit(lambda x: jax.nn.silu(x @ w_f1 + b_f1) @ w_f2, x),
        2 * 2 * M * C * F,
    )

    # -- the fused MSA kernel, exactly as the model dispatches it --
    from azula_tpu.ops.fused_msa import _fused, rope_tables

    cos2, sin2 = rope_tables(theta, H)
    scale = (C // H) ** -0.5

    dt_msa = timeit(lambda qkv: _fused(qkv, cos2, sin2, H, 1e-5, scale), qkv)
    row(
        "fused MSA kernel (norm+rope+attn)",
        max(dt_msa - floor, 0.0),
        2 * B * H * (2 * L * L * (C // H)),
    )

    # -- elementwise / norm bundle --
    def rms(y, dim=-1):
        s = jax.lax.rsqrt(
            jnp.mean(jnp.square(y.astype(jnp.float32)), axis=dim, keepdims=True) + 1e-5
        )
        return y * s.astype(y.dtype)

    def norm_mod(x):
        a, b, c = jnp.split(mod3, 3, axis=-1)
        y = (a + 1) * rms(x.reshape(B, L, C)) + b
        return (x.reshape(B, L, C) + c * y).reshape(M, C)

    row("rmsnorm+adaLN+gate+residual", timeit(norm_mod, x), 0)

    print(f"{'op':36s} {'ms':>8s} {'TF/s':>7s} {'%peak':>6s}")
    total = 0.0
    for name, ms, tf, count in rows:
        total += ms * count
        pct = f"{100 * tf * 1e12 / PEAK:5.1f}%" if tf else "     -"
        print(f"{name:36s} {ms:8.3f} {tf:7.1f} {pct}")
    print(f"{'(harness floor, subtracted above)':36s} {floor * 1e3:8.3f}")

    print(f"\nsum of parts (1 block):  {total:.3f} ms")
    print(f"x 12 blocks:             {12 * total:.3f} ms")

    # -- end-to-end forward at bench config for comparison --
    from bench import _dit32

    from azula_tpu.utils.pytree import combine, partition

    _, denoiser, Bb, shape, _ = _dit32(jax.random.key(0))
    params, static = partition(denoiser.backbone)

    xi = jax.random.normal(jax.random.key(1), (Bb, *shape), dtype=jnp.bfloat16)
    t = jnp.full((Bb,), 0.5, dtype=jnp.bfloat16)

    dt = timeit(lambda xi: combine(params, static)(xi, t), xi, reps=32)
    print(
        f"\nend-to-end backbone fwd: {dt * 1e3:.3f} ms  "
        f"({12.33e9 * Bb / dt / 1e12:.1f} TF/s, {100 * 12.33e9 * Bb / dt / PEAK:.1f}% "
        f"of peak on XLA-counted FLOPs)"
    )
    print(
        f"e2e / sum-of-parts:      {dt * 1e3 / (12 * total):.3f}x "
        f"(patch/head/embed included in e2e only)"
    )


if __name__ == "__main__":
    main()

r"""Per-op roofline audit of the dit32 bench forward (VERDICT r2 next-step #1).

Times every constituent primitive of one DiTBlock standalone — jitted and
scanned on-device, at the exact bench shapes (B=128, L=256, C=384, H=6,
bf16) — then compares:

    sum(standalone achievable times) x 12 blocks + patch/head overhead
        vs
    the measured end-to-end forward

If end-to-end <= ~1.1x the sum of parts, the composed program is at >=90%
of what the chip achieves on its own constituent ops: the remaining MFU gap
is per-shape primitive efficiency (small-K matmuls, VPU elementwise), not
composition/fusion losses we can recover.

Usage: PYTHONPATH=/root/.axon_site:. python tools/dit_roofline.py
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


def timeit(fn, *args, reps=16, n=4):
    @jax.jit
    def loop(*args):
        def body(c, _):
            return fn(c, *args[1:]), None

        y, _ = jax.lax.scan(body, args[0], length=reps)
        return jnp.sum(y[0].astype(jnp.float32) if isinstance(y, tuple) else y.astype(jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(loop(*args))
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
    q = jax.random.normal(ks[6], (B, H, L, C // H), dtype=jnp.bfloat16)
    kk = jax.random.normal(ks[7], (B, H, L, C // H), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[8], (B, H, L, C // H), dtype=jnp.bfloat16)
    mod3 = jax.random.normal(ks[9], (B, 1, 3 * C), dtype=jnp.bfloat16)
    theta = jax.random.normal(ks[10], (B, H, L, C // H // 2), dtype=jnp.bfloat16)
    pos = jax.random.normal(ks[11], (B, L, 2), dtype=jnp.bfloat16)
    w_theta = jax.random.normal(ks[0], (2, C // 2), dtype=jnp.bfloat16)

    rows = []

    def row(name, dt, flops, count=1):
        rows.append((name, dt * 1e3, flops / dt / 1e12, count))

    # -- matmuls (x carried to defeat CSE; weight args constant) --
    row("qkv  (M,C)@(C,3C)+b", timeit(lambda x: (x @ w_qkv + b_qkv)[:, :C], x), 2 * M * C * 3 * C)
    row("proj (M,C)@(C,C)", timeit(lambda x: x @ w_proj, x), 2 * M * C * C)
    row("ffn  fc1+silu+fc2", timeit(lambda x: jax.nn.silu(x @ w_f1 + b_f1) @ w_f2, x), 2 * 2 * M * C * F)

    # -- attention, exactly as the model dispatches it (XLA at L=256) --
    from azula_tpu.ops.attention import dot_product_attention

    def attn(q):
        return dot_product_attention(q, kk, v)

    row("attention XLA (B,H,L,64)", timeit(attn, q), 2 * B * H * (2 * L * L * (C // H)))

    # -- elementwise / norm bundles --
    def rms(y, dim=-1):
        return y * jax.lax.rsqrt(jnp.mean(jnp.square(y.astype(jnp.float32)), axis=dim, keepdims=True) + 1e-5).astype(y.dtype)

    def norm_mod(x):
        a, b, c = jnp.split(mod3, 3, axis=-1)
        y = (a + 1) * rms(x.reshape(B, L, C)) + b
        return (x.reshape(B, L, C) + c * y).reshape(M, C)

    row("rmsnorm+adaLN+residual", timeit(norm_mod, x), 0)

    def qknorm_rope(q):
        qn, kn = rms(q), rms(kk)
        th = (pos @ w_theta).reshape(B, L, H, C // H // 2).transpose(0, 2, 1, 3)
        cos, sin = jnp.cos(th), jnp.sin(th)

        def rot(z):
            z1, z2 = jnp.split(z, 2, axis=-1)
            return jnp.concatenate([z1 * cos - z2 * sin, z1 * sin + z2 * cos], axis=-1)

        return rot(qn) + rot(kn)

    row("qk_norm+theta+rope", timeit(qknorm_rope, q), 0)

    print(f"{'op':34s} {'ms':>8s} {'TF/s':>7s} {'%peak':>6s}")
    total = 0.0
    for name, ms, tf, count in rows:
        total += ms * count
        pct = f"{100 * tf * 1e12 / PEAK:5.1f}%" if tf else "     -"
        print(f"{name:34s} {ms:8.3f} {tf:7.1f} {pct}")

    print(f"\nsum of parts (1 block):  {total:.3f} ms")
    print(f"x 12 blocks:             {12 * total:.3f} ms")

    # -- end-to-end forward at bench config for comparison --
    from bench import _dit32

    from azula_tpu.utils.pytree import combine, partition

    _, denoiser, Bb, shape, _ = _dit32(jax.random.key(0))
    params, static = partition(denoiser.backbone)

    xi = jax.random.normal(jax.random.key(1), (Bb, *shape), dtype=jnp.bfloat16)
    t = jnp.full((Bb,), 0.5, dtype=jnp.bfloat16)

    dt = timeit(lambda xi: combine(params, static)(xi, t), xi, reps=8)
    print(f"\nend-to-end backbone fwd: {dt * 1e3:.3f} ms  "
          f"({12.33e9 * Bb / dt / 1e12:.1f} TF/s, {100 * 12.33e9 * Bb / dt / PEAK:.1f}% peak)")
    print(f"composition overhead:    {dt * 1e3 - 12 * total:.3f} ms "
          f"(e2e / sum-of-parts = {dt * 1e3 / (12 * total):.3f}x; "
          f"patch/head/embed included in e2e only)")


if __name__ == "__main__":
    main()

r"""Isolates the output-side resblock slowdown: concat-input convs vs plain
convs at the 256x256 level."""

import time

import jax
import jax.numpy as jnp

B = 8
DT = jnp.bfloat16
RTT = [0.0]


def timeit(fn, args, reps, n=3):
    def loop(args):
        def body(c, _):
            return fn(*c), None

        c, _ = jax.lax.scan(body, args, length=reps)
        return sum(jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(c))

    f = jax.jit(loop)
    float(f(args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - RTT[0], 1e-9) / reps


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    key = jax.random.key(0)

    f = jax.jit(lambda x: jnp.sum(x))
    float(f(jnp.ones((8, 128))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.ones((8, 128))))
        ts.append(time.perf_counter() - t0)
    RTT[0] = min(ts)
    print(f"RTT {RTT[0]*1e3:.1f} ms")

    H = 256
    k1, k2, k3 = jax.random.split(key, 3)

    a = jax.random.normal(k1, (B, H, H, 256), DT)
    b = jax.random.normal(k2, (B, H, H, 256), DT)
    w512 = jax.random.normal(k3, (3, 3, 512, 256), DT) * 0.02
    w256 = jax.random.normal(k3, (3, 3, 256, 256), DT) * 0.02
    fl512 = 2 * B * H * H * 512 * 256 * 9
    fl256 = 2 * B * H * H * 256 * 256 * 9

    # 1. plain 512->256 conv on a materialized input
    x512 = jnp.concatenate([a, b], axis=-1)

    def plain(x, a2):
        y = conv(x, w512)
        # chain: rebuild a 512-channel input from the output
        return jnp.concatenate([y, a2], axis=-1).astype(DT), y.astype(DT)

    dt = timeit(plain, (x512, a), reps=12)
    print(f"conv 512->256 (materialized): {dt*1e3:7.2f} ms {fl512/dt/1e12:5.1f} TF/s")

    # 2. concat fused into the conv consumer
    def fused(a, b):
        y = conv(jnp.concatenate([a, b], axis=-1), w512)
        return y.astype(DT), (y * 1e-30 + b.astype(DT)).astype(DT)

    dt = timeit(fused, (a, b), reps=12)
    print(f"conv(concat(a, b)) 512->256:  {dt*1e3:7.2f} ms {fl512/dt/1e12:5.1f} TF/s")

    # 3. split-accumulate: conv(a, w_a) + conv(b, w_b) — concat-free form
    wa, wb = w512[:, :, :256], w512[:, :, 256:]

    def split_acc(a, b):
        y = conv(a, wa) + conv(b, wb)
        return y.astype(DT), (y * 1e-30 + b.astype(DT)).astype(DT)

    dt = timeit(split_acc, (a, b), reps=12)
    print(f"conv(a,wa)+conv(b,wb):        {dt*1e3:7.2f} ms {fl512/dt/1e12:5.1f} TF/s")

    # 4. reference: 256->256 conv
    def plain256(a):
        return (conv(a, w256).astype(DT),)

    dt = timeit(lambda a: plain256(a)[0], (a,), reps=12)
    print(f"conv 256->256:                {dt*1e3:7.2f} ms {fl256/dt/1e12:5.1f} TF/s")

    # 5. the actual output-side resblock (concat input, GN, FiLM, 2 convs, skip)
    from azula_tpu.models.adm.backbone import ADMResBlock

    rb = ADMResBlock(512, 1024, out_channels=256, use_scale_shift_norm=True, key=key)
    rb = rb.astype(DT)
    from azula_tpu.utils.pytree import combine, partition

    arrays, static = partition(rb)
    emb = jax.random.normal(key, (B, 1024), DT)

    def rb_step(p, ab):
        a, b = ab
        y = combine(p, static)(jnp.concatenate([a, b], axis=-1), emb)
        return (y.astype(DT), a)

    def loop(p, args):
        c, _ = jax.lax.scan(lambda c, _: (rb_step(p, c), None), args, length=8)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in c)

    fj = jax.jit(loop)
    float(fj(arrays, (a, b)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fj(arrays, (a, b)))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - RTT[0]) / 8
    fl_rb = fl512 + fl256 + 2 * B * H * H * 512 * 256  # in_conv + out_conv + 1x1 skip
    print(f"output-side ADMResBlock:      {dt*1e3:7.2f} ms {fl_rb/dt/1e12:5.1f} TF/s (expect ~2x conv time + GN)")


if __name__ == "__main__":
    main()

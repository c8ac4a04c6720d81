r"""Roofline audit for the ADM-256 sampling workload (BENCH north star).

Times the full bf16 forward and each primitive class at every model level.
Timing protocol for the tunneled single-chip transport: each measurement jits
a CHAIN of `reps` dependent invocations (x = f(x)), so XLA cannot CSE the
repetitions, and synchronizes through a scalar fetch whose ~29 ms RTT
amortizes over the chain.

Run on the real chip: `PYTHONPATH=/root/.axon_site:. python tools/profile_adm.py`.
"""

import time

import jax
import jax.numpy as jnp

B = 8
DT = jnp.bfloat16


RTT = [0.0]


def timeit_chain(step, x0, reps=20, n=3, params=None):
    r"""step: (params, x) -> x or x -> x. Returns seconds per invocation.

    Params are passed as explicit jit arguments — closed-over weight arrays
    would be serialized as constants into the remote compile request (HTTP
    413). lax.scan keeps the program size constant.
    """

    if params is None:
        params = ()
        step_fn = lambda p, x: step(x)  # noqa: E731
    else:
        step_fn = step

    def loop(p, x):
        x, _ = jax.lax.scan(lambda c, _: (step_fn(p, c), None), x, length=reps)
        return jnp.sum(x.astype(jnp.float32))

    fn = jax.jit(loop)
    float(fn(params, x0))  # compile + warmup
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(params, x0))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - RTT[0], 1e-9) / reps


def rtt():
    fn = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 128))
    float(fn(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.key(0)

    RTT[0] = rtt()
    print(f"dispatch+fetch RTT: {RTT[0]*1e3:.1f} ms")

    # ---- full model forward ----
    from azula_tpu.models.adm import make_model
    from azula_tpu.models.utils import load_cards
    from azula_tpu.utils.pytree import combine, partition

    card = load_cards("azula_tpu.models.adm")["imagenet_256x256"]
    denoiser = make_model(**card.config, key=key)
    denoiser = denoiser.tree_replace(backbone=denoiser.backbone.astype(DT))

    arrays, static = partition(denoiser.backbone)

    x0 = jax.random.normal(key, (B, 256, 256, 3), DT)
    t = jnp.full((B,), 500.0)

    def fwd_step(params, x):
        out = combine(params, static)(x, t)
        return out[..., :3].astype(DT)  # learn_var doubles channels; chain back

    dt_full = timeit_chain(fwd_step, x0, reps=8, n=3, params=arrays)
    flops = 17.72e12  # XLA cost analysis of one forward (B=8)
    print(f"full forward: {dt_full*1e3:.1f} ms -> {flops/dt_full/1e12:.1f} TFLOP/s "
          f"(peak 197, MFU {flops/dt_full/197e12*100:.0f}%)")

    # ---- per-level primitives ----
    levels = [
        (256, 256, 50),
        (128, 256, 150),
        (64, 512, 150),
        (32, 512, 400),
        (16, 1024, 400),
        (8, 1024, 800),
    ]

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    from azula_tpu.ops.conv import _pallas_conv3x3, can_use_conv3x3
    from azula_tpu.ops.norm import group_norm_silu

    print("\nlevel            xla conv           pallas conv        gn_silu")
    for H, C, reps in levels:
        xx = jax.random.normal(key, (B, H, H, C), DT)
        ww = jax.random.normal(key, (3, 3, C, C), DT) * 0.02
        fl = 2 * B * H * H * C * C * 9

        dt_x = timeit_chain(lambda a: conv(a, ww).astype(DT), xx, reps=reps)
        msg = f"{H:4d}x{H:<4d} C={C:<5d} {dt_x*1e3:7.3f} ms {fl/dt_x/1e12:5.1f} TF/s"

        if can_use_conv3x3(xx.shape, ww.shape, (1, 1), ((1, 1), (1, 1)), False):
            dt_p = timeit_chain(lambda a: _pallas_conv3x3(a, ww).astype(DT), xx, reps=reps)
            msg += f"   {dt_p*1e3:7.3f} ms {fl/dt_p/1e12:5.1f} TF/s"
        else:
            msg += "   " + " " * 19

        dt_g = timeit_chain(lambda a: group_norm_silu(a, 32).astype(DT), xx, reps=reps)
        bw = 2 * B * H * H * C * 2 / dt_g
        msg += f"   {dt_g*1e3:6.3f} ms ({bw/1e9:4.0f} GB/s)"
        print(msg)

    # ---- attention ----
    from azula_tpu.ops.attention import dot_product_attention

    print()
    for H, C in [(32, 512), (16, 1024), (8, 1024)]:
        hds = C // 64
        q = jax.random.normal(key, (B, hds, H * H, 64), DT)

        def attn_step(q):
            return dot_product_attention(q, q, q).astype(DT)

        dt_a = timeit_chain(attn_step, q, reps=400)
        print(f"attn {H}x{H} C={C}: {dt_a*1e3:6.3f} ms")


if __name__ == "__main__":
    main()

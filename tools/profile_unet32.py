r"""Per-op roofline for the unet32 bench forward (the model behind three
BASELINE workloads: unet32 sampling, train32, mmps32).

Times the batch-256 bf16 denoiser forward on device, dumps a profiler trace,
and prints the op-class breakdown (parse with tools/trace_breakdown.py), plus
the XLA cost-analysis FLOP count -> effective TFLOP/s and MFU against the v5e
bf16 peak.

Usage: PYTHONPATH=. python tools/profile_unet32.py [trace_dir]
"""

import sys
import time

import jax
import jax.numpy as jnp

V5E_PEAK_TFLOPS = 197.0


def main(trace_dir: str | None = None) -> None:
    sys.path.insert(0, ".")
    from bench import _unet32

    key = jax.random.key(0)
    _, denoiser, B, shape, _ = _unet32(key)

    x = jax.random.normal(jax.random.key(1), (B, *shape), dtype=jnp.bfloat16)
    t = jnp.full((B,), 0.5, dtype=jnp.bfloat16)

    fwd = jax.jit(lambda x, t: denoiser(x, t))

    lowered = fwd.lower(x, t)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")

    out = fwd(x, t)
    out.block_until_ready()

    # steady state: scan the forward to amortize dispatch
    @jax.jit
    def loop(x, t):
        def body(c, _):
            return denoiser(c, t), None

        y, _ = jax.lax.scan(body, x, length=20)
        return y

    loop(x, t).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x, t).block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = min(times) / 20
    tflops = flops / dt / 1e12
    print(f"forward: {dt * 1e3:.3f} ms  flops={flops / 1e9:.2f} GF  "
          f"{tflops:.1f} TF/s  MFU={tflops / V5E_PEAK_TFLOPS * 100:.1f}%")

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            loop(x, t).block_until_ready()
        print(f"trace written to {trace_dir}; parse with tools/trace_breakdown.py")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

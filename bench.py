r"""Benchmark harness.

Measures end-to-end diffusion sampling throughput on the local accelerator:
KarrasDenoiser(UNet) + VPSchedule + DDIM-64 on CIFAR-shaped data — BASELINE.md
workload config 2 — as one compiled `lax.scan` over the reverse trajectory.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
baseline here is an A100-class estimate for the same workload documented
below; it will be replaced by measured ADM imagenet-256 parity numbers once
the ADM plugin lands.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# Reference baseline estimate (A100-class) for this exact workload:
# CIFAR-shaped (32x32x3) UNet (64,128,256)x3-blocks denoiser, DDIM 64 steps.
# One forward ~= 3.3 GFLOPs/image -> 64 steps ~= 210 GFLOPs/image. A100 bf16
# peak 312 TFLOP/s at a generous 40% MFU -> ~590 img/s. Conservative figure
# used as the bar until ADM-256 parity numbers replace it.
BASELINE_IMAGES_PER_SEC = 590.0


def main() -> None:
    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.nn.unet import UNet
    from azula_tpu.noise import VPSchedule
    from azula_tpu.sample import DDIMSampler

    key = jax.random.key(0)
    k_model, k_time, k_init = jax.random.split(key, 3)

    mod_features = 64
    batch = 256
    steps = 64

    backbone = Modulated(
        UNet(
            in_channels=3,
            out_channels=3,
            mod_features=mod_features,
            hid_channels=(64, 128, 256),
            hid_blocks=(3, 3, 3),
            key=k_model,
        ),
        mod_features,
        key=k_time,
    ).astype(jnp.bfloat16)

    denoiser = KarrasDenoiser(backbone=backbone, schedule=VPSchedule())
    sampler = DDIMSampler(denoiser, eta=0.0, steps=steps)

    x1 = sampler.init(k_init, (batch, 32, 32, 3))

    # Synchronize through a scalar fetch: on some remote-TPU transports
    # block_until_ready returns before execution completes.
    def run_sync():
        return float(jnp.sum(sampler(x1)))

    # Warmup (compile)
    run_sync()

    # Timed runs
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)

    dt = min(times)
    images_per_sec = batch / dt

    print(
        f"platform={jax.default_backend()} batch={batch} steps={steps} "
        f"times={[round(t, 3) for t in times]}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "unet32_ddim64_sampling_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

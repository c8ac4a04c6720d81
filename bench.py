r"""Benchmark harness — north-star workload (BASELINE.md).

Measures ADM ImageNet-256 DDIM-64 sampling throughput on the local
accelerator: the `imagenet_256x256` architecture (random weights — identical
FLOPs to pretrained), bfloat16 backbone, the whole reverse trajectory compiled
to one `lax.scan`.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the bar is
an A100-class estimate for this workload, documented below.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# A100-class estimate for ADM imagenet_256x256 DDIM-64 (the BASELINE.json
# north star "A100-class images/sec/chip"): one backbone forward is 2.22
# TFLOPs (XLA cost analysis); 64 steps -> ~142 TFLOPs per image. A100 bf16
# peak 312 TFLOP/s at a generous 40% MFU -> ~0.88 img/s.
#
# Measured on v5e (r2): 1.13 img/s (1.28x the bar), ~113 ms per batch-8
# forward = ~156 TFLOP/s effective (~65%+ of the XLA conv-primitive rate at
# the dominant shape, 128 TFLOP/s, with norms/elementwise nearly free). The
# round-1 claim that this workload was HBM-bound traced to a profiler
# artifact: GroupNorm statistics over a (B, HW, G, C/G) view forced XLA
# layout copies worth ~40% of the forward; reducing spatially first with the
# channel axis intact (ops/norm.py) removed them.
BASELINE_IMAGES_PER_SEC = 0.88


def _adm256(key):
    from azula_tpu.models.adm import make_model
    from azula_tpu.models.utils import load_cards

    card = load_cards("azula_tpu.models.adm")["imagenet_256x256"]

    denoiser = make_model(**card.config, key=key)
    denoiser = denoiser.tree_replace(backbone=denoiser.backbone.astype(jnp.bfloat16))

    return "adm_imagenet256_ddim64_sampling_throughput", denoiser, 8, (256, 256, 3), BASELINE_IMAGES_PER_SEC


def _sana1k(key):
    r"""Serving bench for the realistic large-transformer workload: the Sana
    1.6B linear-attention DiT at 1024px (32x32x32 latents, 1024 tokens),
    20-step rectified-flow sampling with Gemma-width prompt embeddings
    (reference `sana/__init__.py:165-235`; architecture of the
    `sana_1.6b_1024` card).

    Bar: 3.19 TF per forward (XLA cost analysis of the jitted backbone) x 20
    steps = 63.9 TF/image; A100 bf16 at 40% MFU (125 TF/s) -> ~1.96 img/s.
    """

    from azula_tpu.models.sana import ARCHS, SanaDenoiser
    from azula_tpu.models.sana.backbone import SanaTransformer

    k1, k2, k3 = jax.random.split(key, 3)

    backbone = SanaTransformer(**ARCHS["1.6b"], key=k1).astype(jnp.bfloat16)
    denoiser = SanaDenoiser(backbone)

    cond = {
        "prompt_embeds": jax.random.normal(k2, (1, 300, 2304), dtype=jnp.bfloat16),
        "prompt_mask": jnp.ones((1, 300), dtype=jnp.bfloat16),
    }

    return {
        "metric": "sana_1.6b_1024px_flow20_sampling_throughput",
        "denoiser": denoiser,
        "batch": 8,
        "shape": (32, 32, 32),
        "baseline": 1.96,
        "steps": 20,
        "cond": cond,
        "key": k3,
    }


def _unet32(key):
    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.nn.unet import UNet
    from azula_tpu.noise import VPSchedule

    k1, k2 = jax.random.split(key)

    backbone = Modulated(
        UNet(3, 3, mod_features=64, hid_channels=(64, 128, 256), hid_blocks=(3, 3, 3), key=k1),
        64,
        key=k2,
    ).astype(jnp.bfloat16)

    # A100-class estimate for this workload (see git history): ~590 img/s
    return "unet32_ddim64_sampling_throughput", KarrasDenoiser(backbone, VPSchedule()), 256, (32, 32, 3), 590.0


def _adm256_cfg(key):
    r"""BASELINE workload 4: class-conditional ADM-256 with classifier-free
    guidance (2 backbone calls per step)."""

    from azula_tpu.guidance import CFGDenoiser
    from azula_tpu.models.adm import make_model
    from azula_tpu.models.utils import load_cards

    card = load_cards("azula_tpu.models.adm")["imagenet_256x256_cond"]

    denoiser = make_model(**card.config, key=key)
    denoiser = denoiser.tree_replace(backbone=denoiser.backbone.astype(jnp.bfloat16))

    # CFG halves images/sec at equal backbone throughput -> half the bar.
    # Measured on v5e: the fused 2B-batch CFG (batched=True) is slightly
    # slower inside the compiled scan (0.568 vs 0.588 img/s) — batch 8
    # already saturates the chip at 256px — so the two-call path stays.
    return "adm256_cfg_ddim64_sampling_throughput", CFGDenoiser(denoiser), 8, (256, 256, 3), BASELINE_IMAGES_PER_SEC / 2


def _dit32(key):
    r"""BASELINE workload 3: the patchified transformer path — a DiT-S-class
    ViT (22.5M params, patch 2, 256 tokens at 32px).

    Bar: 12.33 GF per forward (XLA cost analysis) x 64 steps = 789 GF/image;
    A100 bf16 at 40% MFU (125 TF/s) -> ~158 img/s. Measured on v5e:
    178.6 img/s = 141 TF/s = ~70% MFU (r4, head-pair packed fused MSA —
    BENCH_NOTES.md; the r3 XLA-attention dispatch fix took this from 63.6 to
    110.8, the fused MSA kernel to 135.2, and full-width MXU packing to 178.6).
    """

    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.nn.vit import ViT
    from azula_tpu.noise import VPSchedule

    k1, k2 = jax.random.split(key)

    backbone = Modulated(
        ViT(
            3,
            3,
            mod_features=64,
            hid_channels=384,
            hid_blocks=12,
            patch_size=2,
            attention_heads=6,
            key=k1,
        ),
        64,
        key=k2,
    ).astype(jnp.bfloat16)

    return "dit32_ddim64_sampling_throughput", KarrasDenoiser(backbone, VPSchedule()), 128, (32, 32, 3), 158.0


def _mmps32(key):
    r"""BASELINE workload 5: Gaussian posterior-guided inverse problem —
    MMPS inpainting (observe the left half) through the unet32 denoiser.

    Bar: each guided step costs ~7 forward-equivalents — 1 forward, the
    guidance jvp+vjp pair (~3x), and one gmres matvec which is itself a
    jvp+vjp pair (~3x) — so the unet32 bar (590 img/s) scales to ~84 img/s.
    Measured on v5e: 90.5 img/s (1.08x).
    """

    from azula_tpu.guidance import MMPSDenoiser
    from azula_tpu.linalg.covariance import IsotropicCovariance

    _, denoiser, _, shape, _ = _unet32(key)

    B = 64

    def A(x):
        return x[..., :16, :].reshape(*x.shape[:-3], -1)

    x_true = jax.random.normal(jax.random.fold_in(key, 1), (B, *shape))
    y = A(x_true) + 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (B, 16 * 32 * 3))

    guided = MMPSDenoiser(
        denoiser, y, A, IsotropicCovariance(0.05**2), solver="gmres", iterations=1
    )

    return "mmps32_inpainting_ddim64_throughput", guided, B, shape, 84.0


WORKLOADS = {
    "adm256": _adm256,
    "adm256_cfg": _adm256_cfg,
    "unet32": _unet32,
    "dit32": _dit32,
    "mmps32": _mmps32,
    "sana1k": _sana1k,
}


def _train32() -> dict:
    r"""Training throughput on the unet32 model: jitted train step
    (forward + backward + adamw, buffer donation) at batch 256.

    Bar: the unet32 sampling bar (590 img/s over 64 forwards/image) implies
    ~37.8k forward-img/s on an A100-class chip; an ideal train step costs ~3
    forward equivalents -> ~12.6k img/s. Measured on v5e: 11.6k img/s (0.92x
    the idealized bar; the step lands at 3.4x a forward).
    """

    import optax

    from azula_tpu.utils.pytree import combine, partition

    key = jax.random.key(0)
    _, denoiser, _, _, _ = _unet32(key)

    params, static = partition(denoiser)

    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    B = 256
    steps = 100
    x = jax.random.normal(jax.random.key(1), (B, 32, 32, 3))
    t = jax.random.uniform(jax.random.key(2), (B,))

    # The epoch scans the step on-device (the standard TPU training-loop
    # shape): host dispatch through the remote-TPU transport costs tens of ms
    # per call, which would otherwise dominate this sub-30ms step. 100 steps
    # per dispatch reports steady-state throughput — the r4 breakdown
    # (BENCH_NOTES.md) measured the *device* step at 2.98x a forward, exactly
    # the idealized 3x the bar assumes, with the residual ~2 ms/step at 20
    # steps/dispatch being the relay's fixed per-call cost, not device work.
    @jax.jit
    def epoch(params, opt_state, x, t, key):
        def body(carry, k):
            params, opt_state = carry

            def loss_fn(p):
                return combine(p, static).loss(x, t, key=k)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, steps)
        )

        return params, opt_state, losses

    # Warmup (compile)
    params, opt_state, losses = epoch(params, opt_state, x, t, jax.random.key(3))
    float(losses[-1])

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, losses = epoch(params, opt_state, x, t, jax.random.fold_in(key, i))
        float(losses[-1])
        times.append(time.perf_counter() - t0)

    dt = min(times)
    images_per_sec = B * steps / dt

    print(f"platform={jax.default_backend()} batch={B} steps={steps} dt={dt:.3f}s times={[round(x, 3) for x in times]}", file=sys.stderr)
    result = {
        "metric": "unet32_train_step_throughput",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 12587.0, 3),
    }
    print(json.dumps(result))
    return result


def _flux_block() -> dict:
    r"""Serving microbench for the FLUX.1 transformer at its real shapes: one
    dual-stream (MMDiT) + one single-stream block, D=3072, 24 heads (head_dim
    128), 4096 image + 512 text tokens (1024px latents), bf16.

    The full 12B model cannot hold one chip's HBM replicated (~24 GB bf16
    weights) — at scale it runs through :func:`azula_tpu.parallel.serve_flux`
    (TP x ZeRO-3) — so the single-chip bench measures the repeating unit that
    all 19 dual + 38 single blocks share, chained back-to-back exactly as the
    model runs them (reference capability: `azula/plugins/flux/__init__.py:219-256`).

    Bar: ~2.61 TFLOPs per block pair at B=1 (2x MAC: dual 652G MAC — qkv 130G,
    joint attention 130G, out 43G, FFNs 348G — single 652G MAC — fused qkv+mlp
    305G, attention 130G, fused proj_out 217G — at L=4608); A100 bf16 at 40%
    MFU (125 TF/s) -> 47.8 pairs/s.
    """

    import numpy as np

    from azula_tpu.models.flux.backbone import (
        FluxSingleTransformerBlock,
        FluxTransformerBlock,
        rope_cos_sin,
    )

    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    dim, heads = 3072, 24
    B, L_img, L_txt = 1, 4096, 512

    dual = FluxTransformerBlock(dim, heads, key=k1).astype(jnp.bfloat16)
    single = FluxSingleTransformerBlock(dim, heads, key=k2).astype(jnp.bfloat16)

    # 64x64 latent grid image ids after zero text ids (checkpoint convention:
    # text first), FLUX.1 rope axis dims (16, 56, 56).
    z = np.zeros(1, dtype=np.float32)
    grid = np.stack(
        np.meshgrid(z, np.arange(64), np.arange(64), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    ids = np.concatenate([np.zeros((L_txt, 3)), grid]).astype(np.float32)
    cos, sin = rope_cos_sin(jnp.asarray(ids), (16, 56, 56))

    img = jax.random.normal(k3, (B, L_img, dim), dtype=jnp.bfloat16)
    txt = jax.random.normal(k4, (B, L_txt, dim), dtype=jnp.bfloat16)
    emb = jax.random.normal(k5, (B, dim), dtype=jnp.bfloat16)

    # The dual and single blocks run as SEPARATE one-block programs, each
    # chained through its data dependence for `chain` async dispatches with
    # one sync at the end — the device runs back-to-back while the relay's
    # fixed per-dispatch cost overlaps, so the timing reads device
    # throughput. Why not one program like FluxTransformer.__call__
    # (backbone.py:401-406): on this backend any program with two or more
    # flash-attention call sites at this shape (B=1, H=24, L=4608, D=128)
    # compiles pathologically (one dual+single pair: >12 min; a length-2
    # lax.scan of one block: >10 min) while each block alone compiles in
    # ~10 s (measured 2026-08-20). The block boundary is elementwise, so
    # splitting loses no fusion. Weights ride as traced arguments (like
    # Sampler.__call__), never as XLA constants.
    from azula_tpu.utils.pytree import combine, partition

    dual_arrays, dual_static = partition((dual, emb, cos, sin))
    single_arrays, single_static = partition((single, emb, cos, sin))

    @jax.jit
    def run_dual(arrays, img, txt):
        dual, emb, cos, sin = combine(arrays, dual_static)
        return dual(img, txt, emb, cos, sin)

    @jax.jit
    def run_single(arrays, x):
        single, emb, cos, sin = combine(arrays, single_static)
        return single(x, emb, cos, sin)

    x0 = jnp.concatenate([txt, img], axis=1)
    chain = 16

    def run_sync():
        i, t = img, txt
        for _ in range(chain):
            i, t = run_dual(dual_arrays, i, t)
        s = float(jnp.sum(i.astype(jnp.float32)))

        x = x0
        for _ in range(chain):
            x = run_single(single_arrays, x)
        return s + float(jnp.sum(x.astype(jnp.float32)))

    run_sync()  # compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)

    dt = min(times)
    pairs_per_sec = chain / dt

    print(
        f"platform={jax.default_backend()} chain={chain} "
        f"tokens={L_txt + L_img} times={[round(t, 3) for t in times]}",
        file=sys.stderr,
    )

    result = {
        "metric": "flux_block_pair_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "block-pairs/sec (B=1, 4608 tok)",
        "vs_baseline": round(pairs_per_sec / 47.8, 3),
    }
    print(json.dumps(result))
    return result


def _dit32_train() -> dict:
    r"""Training throughput on the dit32 model: jitted ViT train step
    (forward + attention backward + adamw) at batch 128, 100 steps per
    compiled scan (steady state, same harness as train32) — the measured
    workload that exercises the Pallas flash-attention backward / fused-MSA
    vjp path (VERDICT r4 #7).

    Bar: derived like train32's — dit32's sampling bar (158 img/s over 64
    forwards/image) implies ~10.1k forward-img/s on an A100-class chip; an
    ideal train step costs ~3 forward equivalents -> ~3,370 img/s.
    """

    import optax

    from azula_tpu.utils.pytree import combine, partition

    key = jax.random.key(0)
    _, denoiser, _, _, _ = _dit32(key)

    params, static = partition(denoiser)

    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    B = 128
    steps = 100
    x = jax.random.normal(jax.random.key(1), (B, 32, 32, 3))
    t = jax.random.uniform(jax.random.key(2), (B,))

    @jax.jit
    def epoch(params, opt_state, x, t, key):
        def body(carry, k):
            params, opt_state = carry

            def loss_fn(p):
                return combine(p, static).loss(x, t, key=k)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, steps)
        )

        return params, opt_state, losses

    params, opt_state, losses = epoch(params, opt_state, x, t, jax.random.key(3))
    float(losses[-1])

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, losses = epoch(params, opt_state, x, t, jax.random.fold_in(key, i))
        float(losses[-1])
        times.append(time.perf_counter() - t0)

    dt = min(times)
    images_per_sec = B * steps / dt

    print(
        f"platform={jax.default_backend()} batch={B} steps={steps} dt={dt:.3f}s "
        f"times={[round(x, 3) for x in times]}",
        file=sys.stderr,
    )
    result = {
        "metric": "dit32_train_step_throughput",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 3370.0, 3),
    }
    print(json.dumps(result))
    return result


def _smoke() -> dict:
    r"""CPU smoke mode (<60 s): drives the same harness machinery — workload
    construction, sampler scan, sync-through-scalar timing — at tiny shapes on
    the host CPU, so a broken bench wiring is caught without a TPU."""

    jax.config.update("jax_platforms", "cpu")

    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.nn.unet import UNet
    from azula_tpu.noise import VPSchedule
    from azula_tpu.sample import DDIMSampler

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)

    backbone = Modulated(
        UNet(3, 3, mod_features=16, hid_channels=(8, 16), hid_blocks=(1, 1), key=k1),
        16,
        key=k2,
    )
    sampler = DDIMSampler(KarrasDenoiser(backbone, VPSchedule()), eta=0.0, steps=4)

    x1 = sampler.init(k3, (4, 16, 16, 3))

    def run_sync():
        return float(jnp.sum(sampler(x1).astype(jnp.float32)))

    run_sync()  # compile
    t0 = time.perf_counter()
    run_sync()
    dt = time.perf_counter() - t0

    result = {
        "metric": "bench_smoke_cpu",
        "value": round(4 / dt, 3),
        "unit": "images/sec (cpu, tiny)",
        "vs_baseline": 1.0,
    }
    print(json.dumps(result))
    return result


def _last_sweep_row() -> dict:
    r"""Parses the most recent `bench.py --all` row out of BENCH_NOTES.md:
    workload -> images/sec. Returns {} when no history exists."""

    import pathlib
    import re

    notes = pathlib.Path(__file__).parent / "BENCH_NOTES.md"
    if not notes.exists():
        return {}

    header, last = None, None
    for line in notes.read_text().splitlines():
        if line.startswith("| date | commit | platform |"):
            header = [c.strip() for c in line.strip("|").split("|")]
        elif header and re.match(r"\| \d{4}-\d{2}-\d{2} \|", line):
            last = [c.strip() for c in line.strip("|").split("|")]

    if header is None or last is None:
        return {}

    out = {}
    for name, cell in zip(header[3:], last[3:]):
        m = re.match(r"([\d.]+)", cell)
        if m:
            out[name.split(" ")[0]] = float(m.group(1))
    return out


# Regression tolerance for `--all` vs the last BENCH_NOTES.md row. Session-to-
# session remote-TPU variance measures ~1.5% (BENCH_NOTES adm256 bisect);
# anything past 3% is a real slowdown and must fail loudly (VERDICT r4 #6).
REGRESSION_TOLERANCE = 0.03


def main(workload: str = "adm256") -> dict:
    from azula_tpu.sample import DDIMSampler

    if workload == "smoke":
        return _smoke()

    if workload == "train32":
        return _train32()

    if workload == "dit32_train":
        return _dit32_train()

    if workload == "flux_block":
        return _flux_block()

    key = jax.random.key(0)
    k_model, k_init = jax.random.split(key)

    spec = WORKLOADS[workload](k_model)

    if not isinstance(spec, dict):
        metric, denoiser, batch, shape, baseline = spec
        spec = {
            "metric": metric,
            "denoiser": denoiser,
            "batch": batch,
            "shape": shape,
            "baseline": baseline,
        }

    metric = spec["metric"]
    denoiser = spec["denoiser"]
    batch = spec["batch"]
    shape = spec["shape"]
    baseline = spec["baseline"]
    steps = spec.get("steps", 64)
    cond = spec.get("cond", {})

    sampler = DDIMSampler(denoiser, eta=0.0, steps=steps)

    x1 = sampler.init(spec.get("key", k_init), (batch, *shape))

    if workload == "adm256_cfg":
        labels = jnp.arange(batch) % 1000
        cond = dict(  # noqa: C408
            positive={"label": labels},
            negative={"label": jnp.zeros(batch, dtype=labels.dtype)},
            guidance=1.5,
        )

    # Synchronize through a scalar fetch: on some remote-TPU transports
    # block_until_ready returns before execution completes.
    def run_sync():
        return float(jnp.sum(sampler(x1, **cond).astype(jnp.float32)))

    # Warmup (compile)
    run_sync()

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

    result = {
        "metric": metric,
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline, 3),
    }
    print(json.dumps(result))
    return result


def run_all() -> None:
    r"""Runs every workload, printing one JSON line each, and appends a
    round-over-round row per workload to BENCH_NOTES.md (machine-readable
    perf record for all BASELINE configs, not just the driver's flagship)."""

    import datetime
    import pathlib
    import subprocess

    previous = _last_sweep_row()

    results = {}
    regressions = []
    for name in [*WORKLOADS, "train32", "dit32_train", "flux_block"]:
        try:
            results[name] = main(name)
        except Exception as e:  # record the failure, keep going
            print(f"{name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = {"metric": name, "value": None, "vs_baseline": None}

        value = results[name].get("value")
        prior = previous.get(name)
        if prior and value is not None and value < prior * (1 - REGRESSION_TOLERANCE):
            regressions.append((name, value, prior))
        elif prior and value is None:
            regressions.append((name, None, prior))

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=pathlib.Path(__file__).parent,
        ).stdout.strip()
    except Exception:
        commit = "?"

    date = datetime.date.today().isoformat()
    notes = pathlib.Path(__file__).parent / "BENCH_NOTES.md"

    if not notes.exists():
        notes.write_text(
            "# Bench history — all BASELINE workloads\n\n"
            "One row per `bench.py --all` run (images/sec/chip; `vs` = ratio "
            "to the A100-class bar documented per workload in bench.py).\n\n"
            "| date | commit | platform | "
            + " | ".join(f"{w} (vs)" for w in [*WORKLOADS, "train32", "dit32_train", "flux_block"])
            + " |\n|---|---|---|"
            + "---|" * (len(WORKLOADS) + 3)
            + "\n"
        )

    def cell(r):
        if r.get("value") is None:
            return "fail"
        return f"{r['value']} ({r['vs_baseline']})"

    row = (
        f"| {date} | {commit} | {jax.default_backend()} | "
        + " | ".join(cell(results[w]) for w in [*WORKLOADS, "train32", "dit32_train", "flux_block"])
        + " |\n"
    )
    with notes.open("a") as f:
        f.write(row)

    print(f"appended to {notes}", file=sys.stderr)

    if regressions:
        print(
            "\n" + "=" * 64
            + "\nPERF REGRESSION vs last BENCH_NOTES.md row "
            f"(tolerance {REGRESSION_TOLERANCE:.0%}):",
            file=sys.stderr,
        )
        for name, value, prior in regressions:
            print(
                f"  {name}: {value if value is not None else 'FAILED'} "
                f"(was {prior})",
                file=sys.stderr,
            )
        print("=" * 64, file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "adm256"
    if arg == "--smoke":
        main("smoke")
    elif arg == "--all":
        run_all()
    else:
        main(arg)

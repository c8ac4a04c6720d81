r"""Microbenchmark: 3x3 conv kernel variants on TPU.

Explores the space between XLA's conv primitive (~80 TFLOP/s on v5e at the
ADM-256 dominant shape, ~40% MXU peak) and the hardware ceiling. Variants:

- xla   : lax.conv_general_dilated (the production default)
- v1    : 9 matmuls (K=C), f32 output rolls (ops/conv.py kernel)
- v2    : row-concat X3 (K=3C), 3 matmuls, f32 output rolls
- v3    : full VMEM im2col X9 (K=9C), 1 matmul, bf16 input rolls
- v4    : X3 + bf16 input rolls, 3 matmuls, f32 adds
- mxuonly: v1's 9 matmuls with no rolls/adds (WRONG OUTPUT - MXU ceiling probe)

Usage: python tools/conv_micro.py [--shapes dominant|all]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _make_band_kernel(body, TH, TK, *, w_shape_fn, w_prep):
    r"""Shared band-DMA harness: double-buffered row-band in VMEM, `body`
    computes the (TH, W, TK) output tile from the band."""

    def build(x, w):
        B, H, W, C = x.shape
        K = w.shape[-1]
        nh = H // TH
        nk = max(K // TK, 1)
        tk = min(K, TK)

        pad_w = -(W + 2) % 8
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + pad_w), (0, 0)))
        Wp = W + 2 + pad_w

        wk = w_prep(w)  # kernel-layout weights

        def kernel(x_hbm, w_ref, o_ref, x_vmem, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)

            def dma(bb, ii, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(ii * TH, TH + 2)],
                    x_vmem.at[slot],
                    sem.at[slot],
                )

            p = b * nh + i
            slot = p % 2

            @pl.when(jnp.logical_and(p == 0, j == 0))
            def _():
                dma(b, i, slot).start()

            @pl.when(jnp.logical_and(p + 1 < B * nh, j == 0))
            def _():
                nxt = p + 1
                dma(nxt // nh, nxt % nh, nxt % 2).start()

            @pl.when(j == 0)
            def _():
                dma(b, i, slot).wait()

            o_ref[0] = body(x_vmem, slot, w_ref, j, TH, Wp, W, C, tk)

        return pl.pallas_call(
            kernel,
            grid=(B, nh, nk),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    w_shape_fn(C, tk), lambda b, i, j: (0,) * (len(w_shape_fn(C, tk)) - 1) + (j,),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, TH, W, tk), lambda b, i, j: (b, i, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W, K), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, TH + 2, Wp, C), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * H * W * C * K * 9,
                bytes_accessed=(B * H * W * (C + K) + 9 * C * K) * x.dtype.itemsize,
                transcendentals=0,
            ),
        )(xp, wk)

    return build


# --- v1: 9 matmuls, f32 output rolls -----------------------------------------

def _body_v1(x_vmem, slot, w_ref, j, TH, Wp, W, C, TK):
    def tap(dx):
        acc = None
        for dy in range(3):
            rows = x_vmem[slot, dy : dy + TH]
            p = jax.lax.dot_general(
                rows.reshape(TH * Wp, C), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
        return acc.reshape(TH, Wp, TK)

    acc = tap(1)
    acc = acc + pltpu.roll(tap(0), shift=1, axis=1)
    acc = acc + pltpu.roll(tap(2), shift=Wp - 1, axis=1)
    return acc[:, 1 : W + 1, :].astype(jnp.bfloat16)


def _body_mxuonly(x_vmem, slot, w_ref, j, TH, Wp, W, C, TK):
    # WRONG output (no rolls; dy accumulated): isolates MXU+DMA time
    acc = None
    for dx in range(3):
        for dy in range(3):
            rows = x_vmem[slot, dy : dy + TH]
            p = jax.lax.dot_general(
                rows.reshape(TH * Wp, C), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    return acc.reshape(TH, Wp, TK)[:, 1 : W + 1, :].astype(jnp.bfloat16)


# --- v2: X3 row-concat (K=3C), 3 matmuls, f32 output rolls --------------------

def _x3(x_vmem, slot, TH):
    return jnp.concatenate(
        [x_vmem[slot, dy : dy + TH] for dy in range(3)], axis=-1
    )  # (TH, Wp, 3C)


def _body_v2(x_vmem, slot, w_ref, j, TH, Wp, W, C, TK):
    x3 = _x3(x_vmem, slot, TH).reshape(TH * Wp, 3 * C)

    def tap(dx):
        return jax.lax.dot_general(
            x3, w_ref[dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TH, Wp, TK)

    acc = tap(1)
    acc = acc + pltpu.roll(tap(0), shift=1, axis=1)
    acc = acc + pltpu.roll(tap(2), shift=Wp - 1, axis=1)
    return acc[:, 1 : W + 1, :].astype(jnp.bfloat16)


# --- v3: X9 im2col (K=9C), 1 matmul, bf16 input rolls --------------------------

def _body_v3(x_vmem, slot, w_ref, j, TH, Wp, W, C, TK):
    x3 = _x3(x_vmem, slot, TH)  # (TH, Wp, 3C)
    # output col w pulls input col w + dx - 1  ->  roll input by 1 - dx
    x9 = jnp.concatenate(
        [pltpu.roll(x3, shift=1, axis=1), x3, pltpu.roll(x3, shift=Wp - 1, axis=1)],
        axis=-1,
    )  # (TH, Wp, 9C), dx-major then dy
    acc = jax.lax.dot_general(
        x9.reshape(TH * Wp, 9 * C), w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TH, Wp, TK)
    return acc[:, 1 : W + 1, :].astype(jnp.bfloat16)


# --- v4: X3 + bf16 input rolls, 3 matmuls --------------------------------------

def _body_v4(x_vmem, slot, w_ref, j, TH, Wp, W, C, TK):
    x3 = _x3(x_vmem, slot, TH)

    def tap(xs, dx):
        return jax.lax.dot_general(
            xs.reshape(TH * Wp, 3 * C), w_ref[dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = tap(pltpu.roll(x3, shift=1, axis=1), 0)
    acc = acc + tap(x3, 1)
    acc = acc + tap(pltpu.roll(x3, shift=Wp - 1, axis=1), 2)
    return acc.reshape(TH, Wp, TK)[:, 1 : W + 1, :].astype(jnp.bfloat16)


def _w_id(w):  # (3, 3, C, K)
    return w


def _w3(w):  # (3=dx, 3C dy-major, K)
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(3, -1, w.shape[-1])


def _w9(w):  # (1, 9C dx-major-then-dy, K)
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(1, -1, w.shape[-1])


def make_variants(TH, TK):
    return {
        "v1": _make_band_kernel(_body_v1, TH, TK, w_shape_fn=lambda C, tk: (3, 3, C, tk), w_prep=_w_id),
        "mxuonly": _make_band_kernel(_body_mxuonly, TH, TK, w_shape_fn=lambda C, tk: (3, 3, C, tk), w_prep=_w_id),
        "v2": _make_band_kernel(_body_v2, TH, TK, w_shape_fn=lambda C, tk: (3, 3 * C, tk), w_prep=_w3),
        "v3": _make_band_kernel(_body_v3, TH, TK, w_shape_fn=lambda C, tk: (1, 9 * C, tk), w_prep=_w9),
        "v4": _make_band_kernel(_body_v4, TH, TK, w_shape_fn=lambda C, tk: (3, 3 * C, tk), w_prep=_w3),
    }


def bench(fn, x, w, iters=20):
    # device-side loop (one dispatch measures `iters` chained executions) and
    # an explicit host fetch: on the axon platform `block_until_ready` does
    # NOT block — only fetching the value does
    def run(x0, w0):
        def body(_, s):
            y = fn(x0 + s, w0)
            return jnp.sum(y.astype(jnp.float32)).astype(x0.dtype) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), x0.dtype))

    y = jax.jit(fn)(x, w)
    y.block_until_ready()

    f = jax.jit(run)
    float(f(x, w))
    t0 = time.perf_counter()
    float(f(x, w))
    dt = (time.perf_counter() - t0) / iters
    B, H, W, C = x.shape
    K = w.shape[-1]
    tflops = 2 * B * H * W * C * K * 9 / dt / 1e12
    return dt * 1e3, tflops, y


SHAPES = {
    "dominant": [(8, 256, 256, 256, 256)],
    "all": [
        (8, 256, 256, 256, 256),
        (8, 128, 128, 256, 256),
        (8, 64, 64, 512, 512),
        (8, 32, 32, 512, 512),
        (8, 16, 16, 1024, 1024),
        (8, 64, 64, 256, 512),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="dominant", choices=list(SHAPES))
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--tk", type=int, default=256)
    ap.add_argument("--variants", default="xla,v1,mxuonly,v2,v3,v4")
    args = ap.parse_args()

    names = args.variants.split(",")
    key = jax.random.PRNGKey(0)

    for B, H, W, C, K in SHAPES[args.shapes]:
        kx, kw = jax.random.split(jax.random.fold_in(key, H * C))
        x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, C, K), jnp.bfloat16) / (3 * (C ** 0.5))

        ms_ref, tf_ref, y_ref = bench(_xla_conv, x, w)
        print(f"== ({B},{H},{W},{C})->{K}  xla: {ms_ref:7.3f} ms  {tf_ref:6.1f} TF/s")

        th = min(args.th, H)
        variants = make_variants(th, args.tk)
        for name in names:
            if name == "xla":
                continue
            fn = variants[name]
            try:
                ms, tf, y = bench(fn, x, w)
                err = jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32)))
                rel = float(err) / float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9)
                ok = "OK " if (rel < 2e-2 or name == "mxuonly") else "ERR"
                print(f"   {name:8s}: {ms:7.3f} ms  {tf:6.1f} TF/s  [{ok} rel={rel:.2e}]")
            except Exception as e:
                print(f"   {name:8s}: FAILED {type(e).__name__}: {str(e)[:120]}")

    print("done")


if __name__ == "__main__":
    main()

r"""Direct 3x3 convolution Pallas kernel (experimental — not the default).

This kernel keeps an input row-band resident in VMEM (manual HBM DMA) and
accumulates the convolution as 9 full-width (TH·Wp, C) x (C, K) matmuls in
float32 with lane-aligned rolls for the column shifts — zero patch
materialization.

Measured honestly (r2, device-side fori_loop timing with a value fetch —
`block_until_ready` does not block on the remote transport, which silently
inflated the round-1 numbers): at 256x256/C=256, bf16, B=8 this kernel
reaches 89 TFLOP/s vs the XLA conv primitive's 128 TFLOP/s, and an
MXU-only probe of the same matmul structure caps at ~86 — the 9-matmul
band decomposition itself, not the rolls, is what trails XLA's native conv
emitter. XLA therefore remains the layer default; `tools/conv_micro.py`
holds the variant suite (K=3C / K=9C VMEM im2col and input-roll layouts,
all within noise of the probe ceiling).

Forward-only; gradients fall back to the XLA convolution through a custom
VJP, like the flash-attention kernel.
"""

from __future__ import annotations

__all__ = [
    "conv3x3",
    "can_use_conv3x3",
]

import functools
import jax
import jax.numpy as jnp

from jax import Array


def _xla_conv(x: Array, w: Array) -> Array:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _pick_th(H: int) -> int:
    for th in (8, 4, 2):
        if H % th == 0:
            return th
    return 1


def _pallas_conv3x3(x: Array, w: Array) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    K = w.shape[-1]

    TH = _pick_th(H)
    TK = min(K, 256)

    nh = H // TH
    nk = K // TK

    # SAME padding materialized once; the row-band width is rounded up to the
    # sublane tiling (8) so HBM slices stay aligned
    pad_w = -(W + 2) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + pad_w), (0, 0)))
    Wp = W + 2 + pad_w

    def kernel(x_hbm, w_ref, o_ref, x_vmem, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        # Double-buffered row-band DMA: program (b, i) computes from slot i%2
        # while the next band streams into the other slot.
        def dma(bb, ii, slot):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * TH, TH + 2)],
                x_vmem.at[slot],
                sem.at[slot],
            )

        p = b * nh + i
        slot = p % 2  # global parity: safe across batch boundaries

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

        # Full-width matmuls, accumulated per column tap so only TWO
        # lane-aligned rolls realize the dx shifts (wrap-around lands in the
        # padding columns); no unaligned sublane slices of the input.
        def tap(dx):
            acc = None
            for dy in range(3):
                rows = x_vmem[slot, dy : dy + TH]  # leading-dim slice: no relayout
                p = jax.lax.dot_general(
                    rows.reshape(TH * Wp, C),
                    w_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
            return acc.reshape(TH, Wp, TK)

        acc = tap(1)
        acc = acc + pltpu.roll(tap(0), shift=1, axis=1)
        acc = acc + pltpu.roll(tap(2), shift=Wp - 1, axis=1)

        o_ref[0] = acc[:, 1 : W + 1, :].astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, nh, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (3, 3, C, TK), lambda b, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, TK), lambda b, i, j: (b, i, 0, j), memory_space=pltpu.VMEM
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
    )(xp, w)

    return out


def can_use_conv3x3(x_shape, w_shape, stride, padding, periodic: bool) -> bool:
    r"""Dispatch conditions for the Pallas kernel: TPU backend, 3x3 / stride 1 /
    SAME / zero padding, lane-aligned channels, VMEM-sized row bands."""

    if jax.default_backend() != "tpu":
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False

    B, H, W, C = x_shape
    kh, kw, ci, K = w_shape

    if (kh, kw) != (3, 3) or tuple(stride) != (1, 1):
        return False
    if tuple(map(tuple, padding)) != ((1, 1), (1, 1)) or periodic:
        return False
    if C % 128 != 0 or K % 128 != 0:
        return False
    if H % 2 != 0 or H < 8:
        return False

    # Input band + weight block + accumulator must fit comfortably in VMEM
    th = _pick_th(H)
    itemsize = 2  # sized for bf16; f32 uses 2x but stays within the cap below
    band = (th + 2) * (W + 2) * C * itemsize
    wblk = 9 * C * min(K, 256) * itemsize
    acc = th * W * min(K, 256) * 4

    return band + wblk + 2 * acc < 10 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3(x: Array, w: Array) -> Array:
    r"""3x3 / stride-1 / SAME convolution, channels-last.

    Pallas kernel on TPU (see module docstring); call
    :func:`can_use_conv3x3` first — shapes that fail the dispatch conditions
    should use :func:`jax.lax.conv_general_dilated` directly.
    """

    return _pallas_conv3x3(x, w)


def _conv3x3_fwd(x, w):
    return _pallas_conv3x3(x, w), (x, w)


def _conv3x3_bwd(residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(_xla_conv, x, w)
    return vjp(g)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)

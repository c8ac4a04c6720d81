r"""On-TPU kernel tests (skipped on CPU): the Pallas flash-attention kernel
matches the XLA reference path. The CPU suite exercises only the fallback, so
run this file on a TPU host:

.. code-block:: console

    JAX_PLATFORMS='' python -m pytest tests/test_ops_tpu.py -q
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.ops.attention import _use_pallas, _xla_attention, dot_product_attention

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU backend"
)


@requires_tpu
@pytest.mark.parametrize("L,D", [(512, 64), (768, 64), (1024, 128), (4096, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_attention_matches_xla(L, D, dtype, key):
    k1, k2, k3 = jax.random.split(key, 3)

    B, H = 2, 4

    q = jax.random.normal(k1, (B, H, L, D), dtype=dtype)
    k = jax.random.normal(k2, (B, H, L, D), dtype=dtype)
    v = jax.random.normal(k3, (B, H, L, D), dtype=dtype)

    assert _use_pallas(q, k, v, None)

    out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v)

    # f32 tolerance grows with reduction length (accumulation-order noise)
    tol = 2e-2 if dtype == jnp.bfloat16 else (1e-3 if L > 2048 else 2e-4)
    assert jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))) < tol


@requires_tpu
@pytest.mark.parametrize("shape", [(2, 32, 32, 256, 256), (1, 64, 64, 128, 128)])
def test_conv3x3_matches_xla(shape, key):
    from azula_tpu.ops.conv import _xla_conv, can_use_conv3x3, conv3x3

    B, H, W, C, K = shape
    k1, k2 = jax.random.split(key)

    x = jax.random.normal(k1, (B, H, W, C), dtype=jnp.bfloat16) * 0.1
    w = jax.random.normal(k2, (3, 3, C, K), dtype=jnp.bfloat16) * 0.02

    assert can_use_conv3x3(x.shape, w.shape, (1, 1), ((1, 1), (1, 1)), False)

    out = conv3x3(x, w)
    ref = _xla_conv(x, w)

    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert err < 5e-3, err


@requires_tpu
@pytest.mark.parametrize("L", [512, 4096])
@pytest.mark.parametrize("mask_kind", ["causal", "padding", "full4d"])
def test_flash_attention_masked(L, mask_kind, key):
    r"""Boolean masks fold into the flash kernels as an additive bias; values
    and gradients match the XLA masked path."""

    from azula_tpu.ops.attention import _use_pallas

    k1, k2, k3 = jax.random.split(key, 3)
    B, H, D = 2, 4, 64

    q = jax.random.normal(k1, (B, H, L, D), jnp.float32)
    k = jax.random.normal(k2, (B, H, L, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, L, D), jnp.float32)

    if mask_kind == "causal":
        mask = jnp.tril(jnp.ones((L, L), bool))
    elif mask_kind == "padding":
        keep = jnp.arange(L) < (3 * L) // 4
        mask = jnp.broadcast_to(keep[None, None, None, :], (B, 1, L, L))
    else:
        mask = jax.random.bernoulli(jax.random.fold_in(key, 7), 0.9, (B, H, L, L))
        mask = mask | jnp.eye(L, dtype=bool)  # no fully-masked rows

    assert _use_pallas(q, k, v, mask)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, mask=mask).astype(jnp.float32) ** 2)

    out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, mask=mask))(q, k, v)
    ref = jax.jit(lambda q, k, v: _xla_attention(q, k, v, mask=mask))(q, k, v)
    # rows attending to few keys amplify MXU logit noise into weight noise
    assert jnp.max(jnp.abs(out - ref)) < 1e-2

    grads = jax.jit(jax.grad(lambda *a: loss(dot_product_attention, *a), argnums=(0, 1, 2)))(q, k, v)
    refs = jax.jit(jax.grad(lambda *a: loss(_xla_attention, *a), argnums=(0, 1, 2)))(q, k, v)
    for g, r in zip(grads, refs):
        scale = jnp.max(jnp.abs(r)) + 1e-6
        # MXU matmul precision (bf16 passes) in the softmax recompute
        assert jnp.max(jnp.abs(g - r)) / scale < 1e-2


@requires_tpu
@pytest.mark.parametrize(
    "L,D,dtype",
    [
        (512, 64, jnp.float32),
        (1024, 128, jnp.bfloat16),
        (4096, 64, jnp.bfloat16),  # blocked (online-softmax) forward path
    ],
)
def test_flash_attention_grads(L, D, dtype, key):
    r"""The Pallas flash backward (dQ / dKV kernels) matches the XLA VJP."""

    k1, k2, k3 = jax.random.split(key, 3)

    q = jax.random.normal(k1, (1, 2, L, D), dtype=dtype)
    k = jax.random.normal(k2, (1, 2, L, D), dtype=dtype)
    v = jax.random.normal(k3, (1, 2, L, D), dtype=dtype)

    def loss(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v).astype(jnp.float32) ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    refs = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)

    # f32 tolerance reflects MXU matmul precision (bf16 passes) in the
    # blockwise softmax recomputation — inherent to flash backward on TPU
    tol = 5e-3 if dtype == jnp.float32 else 0.1
    for g, r in zip(grads, refs):
        scale = jnp.max(jnp.abs(r.astype(jnp.float32))) + 1e-6
        err = jnp.max(jnp.abs(g.astype(jnp.float32) - r.astype(jnp.float32))) / scale
        assert err < tol, err


@requires_tpu
@pytest.mark.parametrize("L", [2304, 4608])  # > _FULL_KV_MAX_L, ragged vs BLOCK_K=1024
def test_flash_attention_blocked_ragged_k(L, key):
    r"""The blocked kernel masks the ragged final K block (e.g. Flux 1024px:
    4096 image + 512 text tokens = 4608)."""

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, D = 1, 2, 64

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    assert _use_pallas(q, k, v, None)

    out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v)

    assert jnp.max(jnp.abs(out - ref)) < 2e-3


@requires_tpu
def test_cross_attention_falls_back(key):
    r"""Cross-attention (K/V length != Q length) takes the XLA path instead of
    crashing in the kernels (SD text conditioning: S = 77)."""

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, S, D = 2, 4, 256, 77, 64

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, S, D))
    v = jax.random.normal(k3, (B, H, S, D))

    assert not _use_pallas(q, k, v, None)

    out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v)

    assert out.shape == (B, H, L, D)
    assert jnp.allclose(out, ref, atol=1e-5)


@requires_tpu
def test_flash_attention_blocked_ragged_k_grads(key):
    r"""Gradients through the ragged-length blocked path match XLA (the
    backward re-tiles with exact divisors, so the masked forward and the
    blockwise backward must agree)."""

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 1, 2, 2304, 64

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g = jax.grad(loss, argnums=(1, 2, 3))(dot_product_attention, q, k, v)
    g_ref = jax.grad(loss, argnums=(1, 2, 3))(_xla_attention, q, k, v)

    for a, b in zip(g, g_ref):
        assert jnp.max(jnp.abs(a - b)) < 2e-3


@requires_tpu
def test_attention_implementation_override(key):
    r"""implementation='pallas' forces the flash kernel below the auto-dispatch
    floor; 'xla' forces the fused XLA path; both match."""

    q = jax.random.normal(key, (1, 2, 128, 64))

    auto = dot_product_attention(q, q, q)  # < 512 tokens -> XLA by default
    forced = dot_product_attention(q, q, q, implementation="pallas")
    xla = dot_product_attention(q, q, q, implementation="xla")

    assert jnp.allclose(auto, xla, atol=1e-6)
    assert jnp.max(jnp.abs(forced - xla)) < 2e-4

    # ... and at the L >= 512 floor the auto dispatch routes to the Pallas
    # kernels (batched short-L window) — compare against forced XLA
    q = jax.random.normal(key, (1, 2, 512, 64))
    auto = dot_product_attention(q, q, q)
    xla = dot_product_attention(q, q, q, implementation="xla")
    assert jnp.max(jnp.abs(auto - xla)) < 2e-3

    with pytest.raises(ValueError):
        dot_product_attention(q[..., :60], q[..., :60], q[..., :60], implementation="pallas")


@requires_tpu
@pytest.mark.parametrize("L,rate", [(256, 0.3), (512, 0.5)])
def test_flash_attention_dropout(L, rate, key):
    r"""In-kernel dropout: deterministic per key, mean-preserving, and
    exactly the dropout-free kernel at rate -> 0."""

    k1, k2, k3, kd = jax.random.split(key, 4)

    B, H, D = 2, 4, 64

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    drop = lambda kk, r=rate: dot_product_attention(
        q, k, v, dropout_rate=r, key=kk, implementation="pallas"
    )

    # Deterministic in the key; different keys give different masks
    assert jnp.array_equal(drop(kd), drop(kd))
    assert not jnp.allclose(drop(kd), drop(jax.random.fold_in(kd, 1)))

    # A vanishing rate keeps every weight: bitwise the no-dropout *blocked*
    # kernel (the dropout path pins the fwd/bwd-matched tiling, so the
    # comparison must use the same kernel and block size)
    import math

    from azula_tpu.ops.attention import _bwd_block, _pallas_attention_blocked

    none = jax.jit(
        lambda q, k, v: _pallas_attention_blocked(
            q, k, v, 1 / math.sqrt(D), block=_bwd_block(L), with_lse=False
        )[0]
    )(q, k, v)
    assert jnp.array_equal(drop(kd, 1e-12), none)

    # ... and stays close to the auto-dispatch attention (different kernel,
    # same math; f32 matmuls at the default TPU precision carry ~1e-3 of
    # truncation noise that differs with accumulation order)
    auto = dot_product_attention(q, k, v)
    assert jnp.max(jnp.abs(drop(kd, 1e-12) - auto)) < 2e-3

    # E[dropout(attn)] = attn (inverted scaling): loose statistical check
    outs = jnp.stack([drop(jax.random.fold_in(kd, i)) for i in range(32)])
    err = jnp.abs(outs.mean(0) - none)
    assert jnp.median(err) < 0.1, jnp.median(err)


@requires_tpu
def test_flash_attention_dropout_grads(key):
    r"""Dropout forward and backward agree with an exact XLA twin that applies
    the *identical* hash-generated keep-mask (`dropout_keep_mask` reproduces
    the in-kernel bits): values and all three gradients match to f32
    matmul-truncation tolerance.

    (Finite differences are useless here: default-precision f32 TPU matmuls
    carry ~1e-3 of discontinuous truncation noise, far above the epsilon-sized
    differences a directional check needs.)
    """

    import math

    from azula_tpu.ops.attention import _flash_dropout, dropout_keep_mask

    k1, k2, k3, kd, ku = jax.random.split(key, 5)

    B, H, L, D = 1, 2, 256, 64
    rate = 0.3
    scale = 1 / math.sqrt(D)

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))
    w = jax.random.normal(ku, (B, H, L, D))

    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(kd, (2,), jnp.uint32), jnp.int32
    )
    keep = dropout_keep_mask(B, H, L, seed, rate)

    # the mask is non-trivial and roughly rate-calibrated
    frac = jnp.mean(keep)
    assert 0.6 < frac < 0.8, frac

    def f_kernel(q, k, v):
        return jnp.sum(_flash_dropout(q, k, v, seed, rate, scale) * w)

    def f_twin(q, k, v):
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        weights = jax.nn.softmax(logits, axis=-1)
        weights = jnp.where(keep, weights, 0.0) / (1 - rate)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", weights.astype(q.dtype), v) * w)

    val_k = f_kernel(q, k, v)
    val_t = f_twin(q, k, v)
    assert abs(val_k - val_t) < 2e-2 * max(1.0, abs(val_t)), (val_k, val_t)

    g_k = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_t = jax.grad(f_twin, argnums=(0, 1, 2))(q, k, v)

    for i, (a, b) in enumerate(zip(g_k, g_t)):
        scale_ref = jnp.linalg.norm(b.reshape(-1)) / math.sqrt(b.size)
        assert jnp.max(jnp.abs(a - b)) < 5e-2 * scale_ref, (i, jnp.max(jnp.abs(a - b)))


@requires_tpu
def test_flash_attention_dropout_masked(key):
    r"""Dropout composes with a folded boolean mask: masked columns stay
    excluded for every key."""

    k1, k2, k3, kd = jax.random.split(key, 4)

    B, H, L, D = 1, 2, 256, 64

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    # Mask out the second half of the keys; make their values poisonous
    mask = jnp.arange(L) < L // 2
    mask = jnp.broadcast_to(mask, (L, L))
    v = jnp.where(jnp.arange(L)[:, None] < L // 2, v, 1e3)

    out = dot_product_attention(
        q, k, v, mask=mask, dropout_rate=0.3, key=kd, implementation="pallas"
    )

    assert jnp.all(jnp.isfinite(out))
    assert jnp.max(jnp.abs(out)) < 1e2


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rope", [True, False])
@pytest.mark.parametrize("eps", [1e-5, None])
def test_fused_msa_matches_reference(dtype, rope, eps, key):
    from azula_tpu.ops.fused_msa import _kernel_call, _reference, rope_tables

    B, L, H, D = 8, 256, 6, 64
    C = H * D
    k1, k2 = jax.random.split(key)

    qkv = jax.random.normal(k1, (B, L, 3 * C), dtype=dtype)
    scale = 1 / D**0.5

    if rope:
        theta = jax.random.normal(k2, (L, C // 2), dtype=dtype) * 2
        cos2, sin2 = rope_tables(theta, H)
    else:
        cos2 = sin2 = None

    ref = _reference(qkv, cos2, sin2, H, eps, scale)
    out = jax.jit(lambda a, b, c: _kernel_call(a, b, c, H, eps, scale))(qkv, cos2, sin2)

    # The kernel defers the QK normalization past RoPE and the QK dots (it
    # commutes mathematically), so its rounding points differ from the
    # reference twin's normalize-first order; the budget is one bf16
    # truncation of O(1) softmax-averaged values rather than bit mirroring.
    tol = 1e-2 if dtype == jnp.bfloat16 else 5e-3
    assert jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))) < tol


@requires_tpu
def test_fused_msa_large_scale_max_path(key):
    r"""A logit scale exceeding the bounded-logits budget (scale * D > 30)
    falls back to the max-subtracted softmax inside the kernel — deferred
    normalization must still agree with the reference twin there."""

    from azula_tpu.ops.fused_msa import _kernel_call, _reference

    B, L, H, D = 4, 256, 6, 64
    qkv = jax.random.normal(key, (B, L, 3 * H * D), dtype=jnp.bfloat16)
    scale = 1.0  # scale * D = 64 > 30

    ref = _reference(qkv, None, None, H, 1e-5, scale)
    out = jax.jit(lambda a: _kernel_call(a, None, None, H, 1e-5, scale))(qkv)

    assert jnp.all(jnp.isfinite(out))
    assert jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))) < 2e-2


@requires_tpu
def test_fused_msa_model_route(key):
    r"""The auto dispatch takes the fused kernel and agrees with the unfused
    XLA path at the model level (QK-norm + learned RoPE + attention)."""

    from azula_tpu.nn.attention import MultiheadSelfAttention
    from azula_tpu.ops.fused_msa import fused_msa_eligible

    k1, k2, k3 = jax.random.split(key, 3)
    B, L, C, H = 4, 256, 384, 6

    msa = MultiheadSelfAttention(C, pos_channels=2, attention_heads=H, rope=True, key=k1)
    x = jax.random.normal(k2, (B, L, C), dtype=jnp.bfloat16)
    pos = jax.random.normal(k3, (L, 2), dtype=jnp.bfloat16)

    theta = msa.theta_proj(pos)
    assert fused_msa_eligible(x, H, theta, None, 0.0, None)

    fused = msa(x, pos)

    msa.implementation = "xla"
    unfused = msa(x, pos)

    err = jnp.max(jnp.abs(fused.astype(jnp.float32) - unfused.astype(jnp.float32)))
    assert err < 2e-2, err


@requires_tpu
def test_fused_msa_grads(key):
    r"""custom_vjp backward (XLA recompute) matches grads of the reference."""

    from azula_tpu.ops.fused_msa import _reference, fused_msa_attention, rope_tables

    B, L, H, D = 2, 128, 4, 64
    C = H * D
    k1, k2 = jax.random.split(key)

    qkv = jax.random.normal(k1, (B, L, 3 * C))
    theta = jax.random.normal(k2, (L, C // 2))
    scale = 1 / D**0.5

    def loss_fused(qkv, theta):
        return jnp.sum(jnp.square(fused_msa_attention(qkv, H, theta, eps=1e-5)))

    def loss_ref(qkv, theta):
        cos2, sin2 = rope_tables(theta, H)
        return jnp.sum(jnp.square(_reference(qkv, cos2, sin2, H, 1e-5, scale)))

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(qkv, theta)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(qkv, theta)

    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-6) < 1e-2


# --- group_stats: the round-3 regression class ------------------------------
#
# The Pallas statistics kernel (`ops/norm.py`) shipped broken at every nblk > 1
# shape in round 3 because all unit tests used shapes where HW fit one block.
# These tests pin every implementation AT THE SHAPES THE MODELS EMIT (ADM-256
# stages, SD/EDM latents) — the kernel selected explicitly, plus the default
# (pilot) path the models actually run. Run before any ops/ commit:
#
#     AZULA_ON_DEVICE=1 python -m pytest -m tpu_kernels -q


@requires_tpu
@pytest.mark.tpu_kernels
@pytest.mark.parametrize(
    "B,HW,C,eligible",
    [
        (8, 65536, 256, True),  # ADM-256 first stage (256x256), the flagship shape
        (8, 16384, 512, True),  # ADM-256 128x128 stage
        (2, 4096, 1024, True),  # ADM-256 attention-resolution stage
        (4, 9216, 384, True),  # non-power-of-two spatial (96x96), C%128==0
        (8, 66049, 256, False),  # odd HW (257^2): no aligned divisor -> XLA fallback
        (2, 4096, 192, False),  # C%128 != 0 -> XLA fallback
    ],
)
def test_group_stats_production_shapes(B, HW, C, eligible, key):
    from azula_tpu.ops.norm import _stats_twopass, group_stats, stats_kernel_eligible

    assert stats_kernel_eligible((B, HW, C)) == eligible

    groups = 32 if C % 32 == 0 else 24

    # Large |mean| relative to std: the one-pass raw-moment fold cancels
    # catastrophically here; neither the kernel's centered two-pass nor the
    # default pilot-shifted fold may.
    x = 100.0 + 3.0 * jax.random.normal(key, (B, HW, C), dtype=jnp.bfloat16)

    mean_ref, var_ref = _stats_twopass(x, groups)

    # The kernel centers exactly (1e-4 var budget); auto's guarded-raw branch
    # carries the documented ~(mean/std)^2 * eps relative error (~3e-4 here).
    for impl, var_tol in (("pallas", 1e-4), ("auto", 2e-3)):
        mean, var = jax.jit(group_stats, static_argnums=(1, 2))(x, groups, impl)

        assert mean.shape == var.shape == (B, groups)
        assert float(jnp.max(jnp.abs(mean - mean_ref))) < 1e-3, impl
        assert float(jnp.max(jnp.abs(var - var_ref) / (jnp.abs(var_ref) + 1e-6))) < var_tol, impl


@requires_tpu
@pytest.mark.tpu_kernels
def test_group_stats_grads_on_device(key):
    from azula_tpu.ops.norm import _stats_twopass, group_stats, stats_kernel_eligible

    B, HW, C = 2, 4096, 256
    assert stats_kernel_eligible((B, HW, C))

    x = 50.0 + jax.random.normal(key, (B, HW, C), dtype=jnp.float32)

    def loss(x, stats):
        m, v = stats(x, 32)
        return jnp.sum(2.0 * m + 0.5 * v)

    g_ref = jax.grad(loss)(x, _stats_twopass)

    for impl in ("pallas", "auto"):
        g = jax.jit(
            lambda x, impl=impl: jax.grad(loss)(
                x, functools.partial(group_stats, implementation=impl)
            )
        )(x)

        assert float(jnp.max(jnp.abs(g - g_ref))) < 1e-6, impl


@requires_tpu
@pytest.mark.tpu_kernels
def test_group_norm_end_to_end_production_shape(key):
    r"""Full group_norm (stats + normalize) at the flagship ADM stage shape,
    bf16 activations, against a float64-free but fp32-full XLA oracle."""

    from azula_tpu.ops.norm import group_norm

    B, HW, C, G = 2, 65536, 256, 32
    k1, k2, k3 = jax.random.split(key, 3)

    x = 10.0 + jax.random.normal(k1, (B, HW, C), dtype=jnp.bfloat16)
    scale = jax.random.normal(k2, (C,)) * 0.1 + 1.0
    bias = jax.random.normal(k3, (C,)) * 0.1

    out = jax.jit(group_norm, static_argnums=1)(x, G, scale=scale, bias=bias)

    xf = x.astype(jnp.float32).reshape(B, HW, G, C // G)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    ref = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    ref = ref.reshape(B, HW, C) * scale + bias

    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert float(err) < 0.05, float(err)


@requires_tpu
@pytest.mark.tpu_kernels
def test_kernel_families_smoke(key):
    r"""One compile per remaining kernel family (flash attention, conv3x3,
    fused MSA) so `pytest -m tpu_kernels` gates every Pallas kernel in <2 min."""

    from azula_tpu.ops.conv import _xla_conv, conv3x3
    from azula_tpu.ops.fused_msa import _reference, fused_msa_attention, rope_tables

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    # flash attention
    q = jax.random.normal(k1, (2, 4, 1024, 64), dtype=jnp.bfloat16)
    k = jax.random.normal(k2, (2, 4, 1024, 64), dtype=jnp.bfloat16)
    v = jax.random.normal(k3, (2, 4, 1024, 64), dtype=jnp.bfloat16)
    assert _use_pallas(q, k, v, None)
    out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))) < 2e-2

    # conv3x3
    x = jax.random.normal(k4, (1, 32, 32, 128), dtype=jnp.bfloat16) * 0.1
    w = jax.random.normal(k5, (3, 3, 128, 128), dtype=jnp.bfloat16) * 0.02
    assert float(jnp.max(jnp.abs(
        conv3x3(x, w).astype(jnp.float32) - _xla_conv(x, w).astype(jnp.float32)
    ))) < 5e-3

    # fused MSA
    qkv = jax.random.normal(k1, (2, 256, 3 * 256))
    theta = jax.random.normal(k2, (256, 128))
    cos2, sin2 = rope_tables(theta, 4)
    got = fused_msa_attention(qkv, 4, theta, eps=1e-5)
    want = _reference(qkv, cos2, sin2, 4, 1e-5, 1 / 8.0)
    # Same budget as test_fused_msa_matches_reference at fp32 (5e-3): the
    # kernel's exp/softmax runs at a slightly different accumulation order.
    assert float(jnp.max(jnp.abs(got - want))) < 5e-3


@requires_tpu
@pytest.mark.tpu_kernels
def test_fused_gn_kernel_production_shape(key):
    r"""The two-phase fused GroupNorm kernel (stats + modulated affine + SiLU
    in one pallas_call) matches the XLA path at the flagship ADM stage shape,
    with AdaLN-style modulation, within bf16 output rounding."""

    from azula_tpu.ops.norm import group_norm, group_norm_silu

    B, HW, C, G = 2, 65536, 256, 32
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    x = (10.0 + 3.0 * jax.random.normal(k1, (B, HW, C))).astype(jnp.bfloat16)
    scale = 1.0 + 0.1 * jax.random.normal(k2, (C,))
    bias = 0.1 * jax.random.normal(k3, (C,))
    ms = 0.1 * jax.random.normal(k4, (B, C))
    mt = 0.1 * jax.random.normal(k5, (B, C))

    for fn in (group_norm, group_norm_silu):
        args = dict(scale=scale, bias=bias, mod_scale=ms, mod_shift=mt)  # noqa: C408
        y_kernel = jax.jit(
            lambda x, fn=fn, args=args: fn(x, G, implementation="pallas", **args)
        )(x)
        y_xla = jax.jit(lambda x, fn=fn, args=args: fn(x, G, **args))(x)

        # Outputs are bf16; the two paths round their (f32-exact) statistics
        # differently, so allow a couple of output ulps at |y| ~ 4.
        err = jnp.max(jnp.abs(y_kernel.astype(jnp.float32) - y_xla.astype(jnp.float32)))
        assert float(err) < 0.1, (fn.__name__, float(err))


@requires_tpu
@pytest.mark.tpu_kernels
def test_fused_msa_training_vjp_production_shape(key):
    r"""The fused-MSA training path at the dit32 bench shape (B=128, L=256,
    H=6, D=64): single-forward vjp, projection-layout kernels
    (`_flash_blhd`), multi-pair single-block backward, no LSE residual —
    gradients must match the materialized XLA reference (gate coverage for
    the round-5 training-attention rework)."""

    from azula_tpu.ops.fused_msa import _fused, _reference, rope_tables

    B, L, H, D = 128, 256, 6, 64
    C = H * D

    k1, k2, k3 = jax.random.split(key, 3)
    qkv = jax.random.normal(k1, (B, L, 3 * C), dtype=jnp.bfloat16)
    theta = jax.random.normal(k2, (L, C // 2), dtype=jnp.float32)
    g = jax.random.normal(k3, (B, L, C), dtype=jnp.float32)

    cos2, sin2 = rope_tables(theta, H)
    eps, scale = 1e-5, 1 / 8.0

    def loss(fn, qkv):
        return jnp.sum(fn(qkv, cos2, sin2, H, eps, scale).astype(jnp.float32) * g)

    got = jax.jit(jax.grad(lambda a: loss(_fused, a)))(qkv)
    want = jax.jit(jax.grad(lambda a: loss(_reference, a)))(qkv)

    got32 = got.astype(jnp.float32)
    want32 = want.astype(jnp.float32)
    scale_ref = float(jnp.max(jnp.abs(want32))) + 1e-6

    # bf16 activations + mixed-precision norm/rope in the flash path vs the
    # all-f32-statistics reference: bf16-level agreement.
    assert float(jnp.max(jnp.abs(got32 - want32))) / scale_ref < 3e-2

r"""On-TPU kernel tests (skipped on CPU): the Pallas flash-attention kernel
matches the XLA reference path. The CPU suite exercises only the fallback, so
run this file on a TPU host:

.. code-block:: console

    JAX_PLATFORMS='' python -m pytest tests/test_ops_tpu.py -q
"""

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

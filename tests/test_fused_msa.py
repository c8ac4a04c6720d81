r"""CPU-side tests for the fused MSA serving path (`azula_tpu.ops.fused_msa`).

The Pallas kernel itself only runs on TPU (`tests/test_ops_tpu.py`); here we
pin down the parts that must hold everywhere: the XLA reference twin agrees
with the unfused model path, and the eligibility gate routes exactly the
supported shapes.
"""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.nn.attention import MultiheadSelfAttention
from azula_tpu.ops.fused_msa import (
    _reference,
    fused_msa_attention,
    fused_msa_eligible,
    rope_tables,
)


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.mark.parametrize("rope", [True, False])
@pytest.mark.parametrize("qk_norm", [True, False])
def test_reference_matches_unfused_model(rope, qk_norm, key):
    r"""`_reference` (the kernel twin that also drives the backward pass)
    computes the same function as the module's unfused head-split path."""

    k1, k2, k3 = jax.random.split(key, 3)
    B, L, C, H = 2, 64, 128, 4

    msa = MultiheadSelfAttention(
        C, pos_channels=2, attention_heads=H, qk_norm=qk_norm, rope=rope, key=k1
    )
    x = jax.random.normal(k2, (B, L, C))
    pos = jax.random.normal(k3, (L, 2))

    msa.implementation = "xla"
    want = msa(x, pos)

    qkv = msa.qkv_proj(x)
    theta = msa.theta_proj(pos) if rope else None
    eps = 1e-5 if qk_norm else None
    got = msa.y_proj(fused_msa_attention(qkv, H, theta, eps=eps))

    # On-TPU f32 matmuls run at the default (bf16-pass) precision, so the
    # two op orders diverge at ~1e-3 there; CPU f32 is exact to 1e-4.
    tol = 1e-4 if jax.default_backend() == "cpu" else 2e-3
    assert jnp.max(jnp.abs(want - got)) < tol


def test_rope_tables_invert_apply_rope(key):
    r"""rope(x) = x * cos2 + swap(x) * sin2 reproduces `apply_rope`'s
    interleaved complex rotation."""

    from azula_tpu.nn.attention import apply_rope

    L, H, D = 16, 2, 8
    k1, k2 = jax.random.split(key)

    x = jax.random.normal(k1, (L, H * D))
    theta = jax.random.normal(k2, (L, H * D // 2))

    cos2, sin2 = rope_tables(theta, H)
    swapped = x.reshape(L, H * D // 2, 2)[..., ::-1].reshape(L, H * D)
    got = x * cos2 + swapped * sin2

    # apply_rope takes (..., H, L, D) with per-head angles
    xh = x.reshape(L, H, D).swapaxes(0, 1)
    th = theta.reshape(L, H, D // 2).swapaxes(0, 1)
    want, _ = apply_rope(xh, xh, th)

    assert jnp.max(jnp.abs(want.swapaxes(0, 1).reshape(L, H * D) - got)) < 1e-6


def test_eligibility_gate(key):
    x = jnp.zeros((2, 256, 384), jnp.bfloat16)
    theta = jnp.zeros((256, 192), jnp.bfloat16)

    on_tpu = jax.default_backend() == "tpu"

    # the canonical serving shape is eligible iff we are on TPU
    assert fused_msa_eligible(x, 6, theta, None, 0.0, None) == on_tpu

    # masks, dropout+key, batched theta, bad shapes are never eligible
    assert not fused_msa_eligible(x, 6, theta, jnp.ones((256, 256), bool), 0.0, None)
    assert not fused_msa_eligible(x, 6, theta, None, 0.1, key)
    assert not fused_msa_eligible(x, 6, theta[None], None, 0.0, None)
    assert not fused_msa_eligible(x[0], 6, theta, None, 0.0, None)
    assert not fused_msa_eligible(x[:, :100], 6, None, None, 0.0, None)  # L % 128
    assert not fused_msa_eligible(x, 16, None, None, 0.0, None)  # heads > 12
    assert not fused_msa_eligible(x.astype(jnp.float16), 6, None, None, 0.0, None)

    # dropout without a key is inference -> eligible (on TPU)
    assert fused_msa_eligible(x, 6, theta, None, 0.1, None) == on_tpu


def test_reference_grads_finite(key):
    B, L, H, D = 1, 32, 2, 16
    C = H * D
    k1, k2 = jax.random.split(key)

    qkv = jax.random.normal(k1, (B, L, 3 * C))
    theta = jax.random.normal(k2, (L, C // 2))

    def loss(qkv, theta):
        return jnp.sum(jnp.square(fused_msa_attention(qkv, H, theta)))

    g = jax.grad(loss, argnums=(0, 1))(qkv, theta)
    assert all(jnp.all(jnp.isfinite(t)) for t in g)

r"""Tests for sequence-parallel ring attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.ops.attention import _xla_attention
from azula_tpu.parallel import make_mesh, ring_attention


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 virtual devices")
    return ds


def test_ring_attention_matches_full(devices, key):
    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 2, 4, 64, 16  # L shards 8 tokens per device

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    ref = _xla_attention(q, k, v)
    out = ring_attention(q, k, v, mesh)

    assert jnp.allclose(ref, jax.device_get(out), atol=1e-5)

    # Output stays sequence-sharded
    assert len(out.sharding.device_set) == 8


def test_ring_attention_grads(devices, key):
    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 1, 2, 32, 8

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    g_ring = jax.grad(lambda q: jnp.sum(ring_attention(q, k, v, mesh) ** 2))(q)
    g_full = jax.grad(lambda q: jnp.sum(_xla_attention(q, k, v) ** 2))(q)

    assert jnp.allclose(g_full, jax.device_get(g_ring), atol=1e-4)

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


def test_dit_sequence_parallel_forward_and_grads(devices, key):
    r"""A DiT with ``implementation='ring'`` runs end-to-end with its token
    axis sharded over the mesh — the model-layer route into
    :func:`ring_attention_local` — matching the unsharded model's outputs and
    parameter gradients."""

    from jax.sharding import PartitionSpec as P

    from azula_tpu.nn.dit import DiT
    from azula_tpu.utils.pytree import combine, partition

    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, L, C = 2, 32, 16  # 4 tokens per device

    plain = DiT(
        in_channels=C,
        out_channels=C,
        mod_features=8,
        hid_channels=32,
        hid_blocks=2,
        attention_heads=2,
        key=k1,
    )
    params, static = partition(plain)

    def with_ring(dit):
        r"""The same module with every attention routed through the ring."""

        blocks = [
            b.tree_replace(
                msa=b.msa.tree_replace(implementation="ring", ring_axis="data")
            )
            for b in dit.blocks
        ]
        return dit.tree_replace(blocks=blocks)

    x = jax.random.normal(k2, (B, L, C))
    mod = jax.random.normal(k3, (8,))
    pos = jnp.arange(L, dtype=x.dtype)[:, None] * jnp.ones((B, 1, 1), x.dtype)

    spec = P(None, "data", None)

    def fwd(params, x, pos, mod):
        return with_ring(combine(params, static))(x, mod=mod, pos=pos)

    sharded = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), spec, spec, P()),
        out_specs=spec,
    )

    out = sharded(params, x, pos, mod)

    # Reference: the same module, unsharded. Ring attention sees identical
    # global Q/K/V, so outputs agree to fp tolerance.
    def fwd_full(params, x, pos, mod):
        return combine(params, static)(x, mod=mod, pos=pos)

    ref = fwd_full(params, x, pos, mod)

    assert jnp.allclose(jax.device_get(out), ref, atol=1e-5)

    # Parameter gradients agree between the sequence-sharded and full runs
    g_ring = jax.grad(lambda p: jnp.sum(sharded(p, x, pos, mod) ** 2))(params)
    g_full = jax.grad(lambda p: jnp.sum(fwd_full(p, x, pos, mod) ** 2))(params)

    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_full)):
        assert jnp.allclose(jax.device_get(a), b, atol=1e-4)


def test_ring_attention_mask(devices, key):
    r"""A replicated global boolean mask (causal + a padding row band) sliced
    per hop matches single-device masked attention (SP hardening, VERDICT r3
    #10)."""

    mesh = make_mesh(model=1)
    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 2, 4, 64, 16

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    mask = causal.at[:, 50:].set(False)  # also mask a key band

    ref = _xla_attention(q, k, v, mask=mask)
    out = ring_attention(q, k, v, mesh, mask=mask)

    assert jnp.allclose(ref, jax.device_get(out), atol=1e-5)

    # Gradients flow through the masked ring
    g = jax.grad(lambda q: jnp.sum(ring_attention(q, k, v, mesh, mask=mask) ** 2))(q)
    g_ref = jax.grad(lambda q: jnp.sum(_xla_attention(q, k, v, mask=mask) ** 2))(q)
    assert jnp.allclose(jax.device_get(g), g_ref, atol=1e-4)

r"""Tests for Ulysses (all_to_all) sequence-parallel attention on the
8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.ops.attention import _xla_attention
from azula_tpu.parallel import make_mesh, ulysses_attention


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 virtual devices")
    return ds


def test_ulysses_attention_matches_full(devices, key):
    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 2, 8, 64, 16  # L shards 8 tokens, H shards 1 head per device

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    ref = _xla_attention(q, k, v)
    out = ulysses_attention(q, k, v, mesh)

    assert jnp.allclose(ref, jax.device_get(out), atol=1e-5)

    # Output stays sequence-sharded
    assert len(out.sharding.device_set) == 8


def test_ulysses_attention_grads(devices, key):
    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 1, 8, 32, 8

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    g_uly = jax.grad(lambda q: jnp.sum(ulysses_attention(q, k, v, mesh) ** 2))(q)
    g_full = jax.grad(lambda q: jnp.sum(_xla_attention(q, k, v) ** 2))(q)

    assert jnp.allclose(g_full, jax.device_get(g_uly), atol=1e-4)


def test_ulysses_head_divisibility(devices, key):
    r"""H not divisible by the axis size raises with a pointer to ring."""

    mesh = make_mesh(model=1)

    q = jax.random.normal(key, (1, 6, 64, 8))  # 6 heads, 8 devices

    with pytest.raises(ValueError, match="divisible"):
        ulysses_attention(q, q, q, mesh)


def test_dit_sequence_parallel_ulysses(devices, key):
    r"""A DiT with ``implementation='ulysses'`` runs end-to-end with its token
    axis sharded over the mesh, matching the unsharded model's outputs and
    parameter gradients (the Ulysses twin of the ring model-route test)."""

    from jax.sharding import PartitionSpec as P

    from azula_tpu.nn.dit import DiT
    from azula_tpu.utils.pytree import combine, partition

    mesh = make_mesh(model=1)

    k1, k2, k3 = jax.random.split(key, 3)

    B, L, C = 2, 32, 16  # 4 tokens per device; 8 heads over 8 devices

    plain = DiT(
        in_channels=C,
        out_channels=C,
        mod_features=8,
        hid_channels=32,
        hid_blocks=2,
        attention_heads=8,
        key=k1,
    )
    params, static = partition(plain)

    def with_ulysses(dit):
        blocks = [
            b.tree_replace(
                msa=b.msa.tree_replace(implementation="ulysses", ring_axis="data")
            )
            for b in dit.blocks
        ]
        return dit.tree_replace(blocks=blocks)

    x = jax.random.normal(k2, (B, L, C))
    mod = jax.random.normal(k3, (8,))
    pos = jnp.arange(L, dtype=x.dtype)[:, None] * jnp.ones((B, 1, 1), x.dtype)

    spec = P(None, "data", None)

    def fwd(params, x, pos, mod):
        return with_ulysses(combine(params, static))(x, mod=mod, pos=pos)

    sharded = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), spec, spec, P()),
        out_specs=spec,
    )

    out = sharded(params, x, pos, mod)

    def fwd_full(params, x, pos, mod):
        return combine(params, static)(x, mod=mod, pos=pos)

    ref = fwd_full(params, x, pos, mod)

    assert jnp.allclose(jax.device_get(out), ref, atol=1e-5)

    g_uly = jax.grad(lambda p: jnp.sum(sharded(p, x, pos, mod) ** 2))(params)
    g_full = jax.grad(lambda p: jnp.sum(fwd_full(p, x, pos, mod) ** 2))(params)

    for a, b in zip(jax.tree.leaves(g_uly), jax.tree.leaves(g_full)):
        assert jnp.allclose(jax.device_get(a), b, atol=1e-4)


def test_ulysses_attention_mask(devices, key):
    r"""A replicated head-broadcast mask applies exactly after the head
    reshard (SP hardening, VERDICT r3 #10)."""

    mesh = make_mesh(model=1)
    k1, k2, k3 = jax.random.split(key, 3)

    B, H, L, D = 2, 8, 64, 16

    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    mask = jnp.tril(jnp.ones((L, L), dtype=bool))

    ref = _xla_attention(q, k, v, mask=mask)
    out = ulysses_attention(q, k, v, mesh, mask=mask)

    assert jnp.allclose(ref, jax.device_get(out), atol=1e-5)


def test_ulysses_attention_dropout(devices, key):
    r"""Dropout composes with Ulysses: finite output, exact at rate ~0, and
    actually stochastic at a real rate (per-shard key fold)."""

    k1, k2, k3, k4 = jax.random.split(key, 4)

    mesh = make_mesh(model=1)

    B, H, L, D = 2, 8, 64, 16
    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    # rate ~ 0: equals the deterministic result
    out0 = ulysses_attention(q, k, v, mesh, dropout_rate=1e-12, key=k4)
    ref = _xla_attention(q, k, v)
    assert jnp.allclose(jax.device_get(out0), ref, atol=1e-4)

    # a real rate: finite, different from deterministic, reproducible per key
    out = ulysses_attention(q, k, v, mesh, dropout_rate=0.5, key=k4)
    assert jnp.all(jnp.isfinite(jax.device_get(out)))
    assert not jnp.allclose(jax.device_get(out), ref, atol=1e-3)
    out_again = ulysses_attention(q, k, v, mesh, dropout_rate=0.5, key=k4)
    assert jnp.allclose(jax.device_get(out), jax.device_get(out_again))


def test_ulysses_tp_composition(devices, key):
    r"""SP composes with TP on a 2D (seq, tp) mesh: heads tensor-parallel over
    'tp', sequence Ulysses-sharded over 'seq' — the all_to_all rides only the
    seq axis within each tp shard, and the result matches single-device
    attention (VERDICT r3 #10)."""

    import numpy as np

    from jax.sharding import Mesh, PartitionSpec as P

    from azula_tpu.parallel.ulysses import ulysses_attention_local

    k1, k2, k3 = jax.random.split(key, 3)

    seq, tp = 2, 4
    mesh = Mesh(np.asarray(devices[: seq * tp]).reshape(seq, tp), ("seq", "tp"))

    B, H, L, D = 2, 2 * tp, 8 * seq, 16  # 2 heads per tp shard, divisible by seq
    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, L, D))
    v = jax.random.normal(k3, (B, H, L, D))

    spec = P(None, "tp", "seq", None)
    out = jax.shard_map(
        lambda q, k, v: ulysses_attention_local(q, k, v, axis="seq"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)

    ref = _xla_attention(q, k, v)
    assert jnp.allclose(jax.device_get(out), ref, atol=1e-5)

    # Gradients flow through the composed mesh
    g = jax.grad(
        lambda q: jnp.sum(
            jax.shard_map(
                lambda q, k, v: ulysses_attention_local(q, k, v, axis="seq"),
                mesh=mesh,
                in_specs=(spec, spec, spec),
                out_specs=spec,
            )(q, k, v)
            ** 2
        )
    )(q)
    g_ref = jax.grad(lambda q: jnp.sum(_xla_attention(q, k, v) ** 2))(q)
    assert jnp.allclose(jax.device_get(g), g_ref, atol=1e-4)

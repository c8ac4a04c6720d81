r"""Tests for checkpointing, profiling helpers and module utilities."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.nn.embedding import Modulated, TimeEmbedding
from azula_tpu.nn.layers import Linear
from azula_tpu.nn.module import Module
from azula_tpu.nn.utils import get_module_dtype, promote_dtype
from azula_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
from azula_tpu.utils.profiling import Throughput, annotate

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)


class Net(Module):
    def __init__(self, key):
        self.lin = Linear(4, 4, key=key)
        self.rate = 0.5


def test_npz_checkpoint_roundtrip(tmp_path, key):
    net = Net(key)

    save_checkpoint(tmp_path / "ckpt.npz", net)

    other = Net(jax.random.key(9))
    restored = load_checkpoint(tmp_path / "ckpt.npz", other)

    assert jnp.allclose(restored.lin.weight, net.lin.weight)
    assert restored.rate == 0.5


def test_orbax_checkpoint_roundtrip(tmp_path, key):
    pytest.importorskip("orbax.checkpoint")

    net = Net(key)

    save_checkpoint_orbax(tmp_path / "orbax_ckpt", net)

    other = Net(jax.random.key(9))
    restored = load_checkpoint_orbax(tmp_path / "orbax_ckpt", other)

    assert jnp.allclose(restored.lin.weight, net.lin.weight)


def test_train_state(key):
    r"""TrainState bundles params/optimizer state and reassembles the denoiser."""

    import optax

    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.noise import VPSchedule
    from azula_tpu.train import TrainState

    from dummies import Dummy

    denoiser = KarrasDenoiser(backbone=Dummy(4, key=key), schedule=VPSchedule())

    state = TrainState(denoiser, optax.adam(1e-3))

    assert state.step == 0

    rebuilt = state.denoiser
    x = jnp.ones((2, 4))
    t = jnp.full((2,), 0.5)

    assert jnp.allclose(rebuilt(x, t).mean, denoiser(x, t).mean)

    # TrainState is itself a pytree whose dynamic side is the arrays
    from azula_tpu.utils.pytree import combine, partition

    arrays, static = partition(state)
    assert hash(static) == hash(partition(TrainState(denoiser, optax.adam(1e-3)))[1])

    state2 = combine(arrays, static)
    assert jnp.allclose(state2.denoiser(x, t).mean, denoiser(x, t).mean)


def test_training_resume(tmp_path, key):
    r"""Checkpoint/resume of the full training state (params + optimizer),
    SURVEY §5.4: resumed training continues bit-identically."""

    import optax

    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.noise import VPSchedule
    from azula_tpu.train import make_train_step
    from azula_tpu.utils.pytree import partition

    from dummies import Dummy

    denoiser = KarrasDenoiser(backbone=Dummy(4, key=key), schedule=VPSchedule())
    params, static = partition(denoiser)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(static, optimizer, donate=False)

    x = jax.random.normal(key, (8, 4))
    t = jax.random.uniform(key, (8,))

    params, opt_state, _ = step(params, opt_state, x, t, key)

    save_checkpoint(tmp_path / "state.npz", (params, opt_state))

    # Continue from memory vs continue from disk: identical
    p_mem, o_mem, loss_mem = step(params, opt_state, x, t, key)

    params2, opt_state2 = load_checkpoint(tmp_path / "state.npz", (params, opt_state))
    p_disk, o_disk, loss_disk = step(params2, opt_state2, x, t, key)

    assert float(loss_mem) == float(loss_disk)
    for a, b in zip(jax.tree.leaves(p_mem), jax.tree.leaves(p_disk)):
        assert jnp.array_equal(a, b)


def test_throughput_counter(key):
    meter = Throughput()

    x = jax.random.normal(key, (16, 4))
    for _ in range(3):
        meter.update(x * 2, items=16)

    assert meter.items == 48
    assert meter.rate() > 0


def test_annotate():
    with annotate("test-region"):
        pass


def test_get_module_dtype(key):
    net = Net(key)
    assert get_module_dtype(net) == jnp.float32
    assert get_module_dtype(net.astype(jnp.bfloat16)) == jnp.bfloat16


def test_promote_dtype():
    @promote_dtype
    def f(x):
        return x * 2

    y = f(jnp.ones(3, dtype=jnp.bfloat16))
    assert y.dtype == jnp.bfloat16  # computed in f32, cast back


def test_modulated_wrapper(key):
    class Backbone(Module):
        def __init__(self, key):
            self.lin = Linear(4, 4, key=key)

        def __call__(self, x, mod, **kwargs):
            return self.lin(x) + mod

    k1, k2 = jax.random.split(key)
    wrapped = Modulated(Backbone(k1), mod_features=4, key=k2)

    x = jnp.ones((2, 4))
    t = jnp.asarray([0.1, 0.9])

    out = wrapped(x, t)
    assert out.shape == (2, 4)

    emb = TimeEmbedding(8, key=key)(jnp.asarray(0.5))
    assert emb.shape == (8,)


def test_data_pipeline(key):
    r"""batches / prefetch_to_device / epochs: shapes, shuffling, epoch count,
    device placement, and sharded staging on the virtual mesh."""

    import numpy as np

    from azula_tpu.utils.data import batches, epochs, prefetch_to_device

    x = np.arange(20 * 3, dtype=np.float32).reshape(20, 3)
    y = np.arange(20)
    data = {"x": x, "y": y}

    # plain batching drops the ragged tail and covers each example once
    got = list(batches(data, 8))
    assert len(got) == 2 and got[0]["x"].shape == (8, 3)

    # shuffled batching is a permutation
    seen = np.concatenate([b["y"] for b in batches(data, 4, key=key)])
    assert sorted(seen.tolist()) == list(range(20))
    assert not np.array_equal(seen, np.arange(20))

    # prefetch stages onto device and preserves order/content
    staged = list(prefetch_to_device(batches(data, 4), size=2))
    assert len(staged) == 5
    assert isinstance(staged[0]["x"], jax.Array)
    assert np.allclose(
        np.concatenate([np.asarray(b["x"]) for b in staged]), x
    )

    # epochs: num_epochs x batches-per-epoch, resharded over the mesh
    from azula_tpu.parallel import data_sharding, make_mesh

    if len(jax.devices()) >= 8:
        mesh = make_mesh()
        stream = list(
            epochs(data, 8, key=key, num_epochs=3, sharding=data_sharding(mesh))
        )
        assert len(stream) == 6
        assert len(stream[0]["x"].sharding.device_set) == 8


def test_data_pipeline_edge_cases(key):
    r"""Oversized batches raise; prefetch=0 stages without queueing; None
    batches pass through (object sentinel, not None)."""

    import numpy as np
    import pytest as pt

    from azula_tpu.utils.data import batches, prefetch_to_device

    x = np.arange(10.0)

    with pt.raises(ValueError):
        next(batches(x, 16))

    staged = list(prefetch_to_device(batches(x, 5), size=0))
    assert len(staged) == 2

    mixed = [np.ones(2), None, np.zeros(2)]
    out = list(prefetch_to_device(iter(mixed), size=2))
    assert len(out) == 3 and out[1] is None


def test_process_shard():
    r"""Per-process dataset sharding: contiguous, exhaustive over full rounds,
    drops the ragged tail consistently."""

    import numpy as np

    from azula_tpu.utils.data import process_shard

    x = np.arange(10)

    shards = [process_shard(x, index=i, count=4) for i in range(4)]
    assert all(s.shape == (2,) for s in shards)
    assert np.concatenate(shards).tolist() == list(range(8))

    # default single-process: identity-sized
    assert process_shard(x).shape == (10,)

    import pytest as pt

    with pt.raises(ValueError):
        process_shard(np.arange(3), index=0, count=4)

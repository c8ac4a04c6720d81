r"""End-to-end slice: the reference README quickstart (README.md:35-66) —
KarrasDenoiser(MLP) + VPSchedule trained with optax on toy 5-dim data, then
sampled with a compiled DDPM scan. Exercises loss, RNG threading, scan and
partition/combine training."""

import jax
import jax.numpy as jnp
import optax

from azula_tpu.denoise import KarrasDenoiser
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import DDPMSampler
from azula_tpu.utils.pytree import combine, partition

from dummies import Dummy


def test_quickstart_train_and_sample(key):
    k_model, k_data, k_train, k_sample1, k_sample2 = jax.random.split(key, 5)
    channels = 5

    # Toy data: a fixed offset plus small noise
    target = jnp.asarray([1.5, -1.0, 0.5, 2.0, -0.5])
    data = target + 0.1 * jax.random.normal(k_data, (4096, channels))

    denoiser = KarrasDenoiser(
        backbone=Dummy(channels, key=k_model),
        schedule=VPSchedule(),
    )

    params, static = partition(denoiser)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        t_key, z_key = jax.random.split(key)
        t = jax.random.uniform(t_key, (x.shape[0],))

        def loss_fn(params):
            return combine(params, static).loss(x, t, key=z_key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

        return params, opt_state, loss

    losses = []
    for i in range(256):
        k_step = jax.random.fold_in(k_train, i)
        batch = jax.random.choice(jax.random.fold_in(k_step, 1), data, (256,))
        params, opt_state, loss = train_step(params, opt_state, batch, k_step)
        losses.append(float(loss))

    # Loss decreased substantially
    assert sum(losses[-16:]) / 16 < 0.25 * sum(losses[:16]) / 16, (
        losses[:4],
        losses[-4:],
    )

    # Sample with the trained denoiser: one compiled DDPM scan
    denoiser = combine(params, static)
    sampler = DDPMSampler(denoiser, steps=64)

    x1 = sampler.init(k_sample1, (1024, channels))
    x0 = sampler(x1, key=k_sample2)

    assert x0.shape == (1024, channels)
    assert jnp.all(jnp.isfinite(x0))

    # Samples concentrate near the data
    assert jnp.allclose(x0.mean(axis=0), target, atol=0.4)

r"""Quickstart: train a small denoiser on toy data and sample from it.

The TPU-native equivalent of the reference README quickstart
(`/root/reference/README.md:35-66`) and the MNIST tutorial's training loop.
Runs on CPU or TPU:

.. code-block:: console

    python examples/quickstart.py
"""

import jax
import jax.numpy as jnp
import optax

from azula_tpu.denoise import KarrasDenoiser
from azula_tpu.nn.embedding import Modulated
from azula_tpu.nn.layers import Linear
from azula_tpu.nn.module import Module
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import DDPMSampler
from azula_tpu.train import ema_update, make_train_step
from azula_tpu.utils.pytree import combine, partition


class MLP(Module):
    r"""A small time-conditional MLP backbone."""

    def __init__(self, features: int, width: int = 256, *, key):
        k1, k2, k3 = jax.random.split(key, 3)

        self.l1 = Linear(features, width, key=k1)
        self.l2 = Linear(width, width, key=k2)
        self.l3 = Linear(width, features, key=k3)

    def __call__(self, x, mod, **kwargs):
        h = jax.nn.silu(self.l1(x) + mod)
        h = jax.nn.silu(self.l2(h))
        return self.l3(h)


def main():
    key = jax.random.key(0)
    k_model, k_time, k_data, k_train, k_s1, k_s2 = jax.random.split(key, 6)

    features = 5

    # Toy data: two Gaussian blobs
    centers = jnp.asarray([[2.0, 2.0, 0.0, -1.0, 1.0], [-2.0, -2.0, 0.0, 1.0, -1.0]])
    which = jax.random.bernoulli(k_data, shape=(16384,)).astype(jnp.int32)
    data = centers[which] + 0.2 * jax.random.normal(k_data, (16384, features))

    # Denoiser = schedule + preconditioned backbone
    backbone = Modulated(MLP(features, key=k_model), mod_features=256, key=k_time)
    denoiser = KarrasDenoiser(backbone=backbone, schedule=VPSchedule())

    params, static = partition(denoiser)
    ema_params = params

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    step = make_train_step(static, optimizer, donate=False)

    for i in range(1024):
        k_i = jax.random.fold_in(k_train, i)
        batch = jax.random.choice(jax.random.fold_in(k_i, 1), data, (256,))
        t = jax.random.uniform(jax.random.fold_in(k_i, 2), (256,))

        params, opt_state, loss = step(params, opt_state, batch, t, k_i)
        ema_params = ema_update(ema_params, params, rate=0.995)

        if i % 128 == 0:
            print(f"step {i:5d}  loss {float(loss):.4f}")

    # Sample: one compiled DDPM scan
    denoiser = combine(ema_params, static)
    sampler = DDPMSampler(denoiser, steps=256)

    x1 = sampler.init(k_s1, (4096, features))
    x0 = sampler(x1, key=k_s2)

    print("sample mean per blob:")
    side = x0[:, 0] > 0
    print("  +", jnp.round(x0[side].mean(axis=0), 2))
    print("  -", jnp.round(x0[~side].mean(axis=0), 2))


if __name__ == "__main__":
    main()

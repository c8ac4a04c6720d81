r"""Class-conditional image diffusion on synthetic data.

The TPU-native equivalent of the reference MNIST tutorial
(`/root/reference/docs/tutorials/mnist.ipynb`): train a small ViT denoiser on
tiny two-class synthetic images, then sample class-conditionally with a
compiled DDPM scan. CPU-runnable in a few minutes:

.. code-block:: console

    python examples/images.py
"""

import jax
import jax.numpy as jnp
import optax

from azula_tpu.denoise import KarrasDenoiser
from azula_tpu.nn.embedding import TimeEmbedding
from azula_tpu.nn.module import Module
from azula_tpu.nn.vit import ViT
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import DDPMSampler
from azula_tpu.train import make_train_step
from azula_tpu.utils.pytree import combine, partition

SIZE = 8
MOD = 32


class Backbone(Module):
    r"""ViT conditioned on time + class label through the modulation vector."""

    def __init__(self, *, key):
        k1, k2 = jax.random.split(key)

        self.vit = ViT(
            in_channels=1,
            out_channels=1,
            mod_features=MOD,
            hid_channels=32,
            hid_blocks=2,
            attention_heads=4,
            spatial=2,
            patch_size=2,
            key=k1,
        )
        self.time_embedding = TimeEmbedding(MOD, key=k2)
        self.label_embedding = jax.random.normal(key, (2, MOD)) * 0.1

    def __call__(self, x_t, t, label, **kwargs):
        mod = self.time_embedding(t) + self.label_embedding[label]
        if mod.ndim == 1:
            mod = jnp.broadcast_to(mod, (x_t.shape[0], MOD))
        return self.vit(x_t, mod=mod)


def make_data(key, n=8192):
    r"""Two classes: vertical vs horizontal stripes."""

    idx = jnp.arange(SIZE)
    vertical = jnp.tile((idx % 2 * 2.0 - 1.0)[None, :], (SIZE, 1))
    horizontal = vertical.T

    labels = jax.random.bernoulli(key, shape=(n,)).astype(jnp.int32)
    base = jnp.where(labels[:, None, None] == 0, vertical, horizontal)

    x = base[..., None] + 0.1 * jax.random.normal(key, (n, SIZE, SIZE, 1))

    return x, labels


def main():
    key = jax.random.key(0)
    k_model, k_data, k_train, k_s = jax.random.split(key, 4)

    data, labels = make_data(k_data)

    denoiser = KarrasDenoiser(backbone=Backbone(key=k_model), schedule=VPSchedule())

    params, static = partition(denoiser)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(static, optimizer, donate=False)

    for i in range(512):
        k_i = jax.random.fold_in(k_train, i)
        pick = jax.random.randint(jax.random.fold_in(k_i, 1), (128,), 0, len(data))
        t = jax.random.uniform(jax.random.fold_in(k_i, 2), (128,))

        params, opt_state, loss = step(
            params, opt_state, data[pick], t, k_i, label=labels[pick]
        )

        if i % 128 == 0:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    # Class-conditional sampling: one compiled scan per class
    denoiser = combine(params, static)
    sampler = DDPMSampler(denoiser, steps=128)

    for cls in (0, 1):
        x1 = sampler.init(jax.random.fold_in(k_s, cls), (64, SIZE, SIZE, 1))
        x0 = sampler(x1, key=jax.random.fold_in(k_s, 10 + cls), label=jnp.full((64,), cls))

        # Stripes alternate sign along one axis: measure axis correlations
        col_corr = float(jnp.mean(x0[:, :, :-1] * x0[:, :, 1:]))
        row_corr = float(jnp.mean(x0[:, :-1] * x0[:, 1:]))
        kind = "vertical" if col_corr < row_corr else "horizontal"
        print(f"class {cls}: row corr {row_corr:+.2f}, col corr {col_corr:+.2f} -> {kind} stripes")


if __name__ == "__main__":
    main()

r"""docs/tutorial.md, extracted (kept in sync by tests/test_tutorial.py)."""

import jax
import jax.numpy as jnp

from azula_tpu.denoise import KarrasDenoiser
from azula_tpu.nn.embedding import TimeEmbedding
from azula_tpu.nn.module import Module
from azula_tpu.nn.unet import UNet
from azula_tpu.noise import VPSchedule

MOD = 32

key = jax.random.key(0)
k_model, k_emb, k_lab, k_train, k_sample = jax.random.split(key, 5)


class ConditionalUNet(Module):
    r"""A tiny UNet conditioned on time + class label through modulation."""

    def __init__(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.unet = UNet(
            in_channels=1, out_channels=1, mod_features=MOD,
            hid_channels=(16, 32), hid_blocks=(2, 2), key=k1,
        )
        self.time_embedding = TimeEmbedding(MOD, key=k2)
        self.label_embedding = jax.random.normal(k3, (2, MOD)) * 0.1

    def __call__(self, x_t, t, label, **kwargs):
        mod = self.time_embedding(t) + self.label_embedding[label]
        if mod.ndim == 1:
            mod = jnp.broadcast_to(mod, (x_t.shape[0], MOD))
        return self.unet(x_t, mod=mod)


denoiser = KarrasDenoiser(backbone=ConditionalUNet(k_model), schedule=VPSchedule())


def make_batch(key, n=256):
    k1, k2, k3 = jax.random.split(key, 3)

    label = jax.random.bernoulli(k1, 0.5, (n,)).astype(jnp.int32)
    stripes = jnp.where(jnp.arange(8) % 2 == 0, 1.0, -1.0)

    vertical = jnp.tile(stripes[None, :], (8, 1))
    horizontal = vertical.T

    x = jnp.where(label[:, None, None] == 0, vertical, horizontal)
    x = x[..., None] + 0.05 * jax.random.normal(k3, (n, 8, 8, 1))

    return x, label


import optax

from azula_tpu.utils.pytree import combine, partition

params, static = partition(denoiser)

optimizer = optax.adam(1e-3)
opt_state = optimizer.init(params)

@jax.jit
def train_step(params, opt_state, x, label, key):
    k_t, k_z = jax.random.split(key)

    def loss_fn(params):
        d = combine(params, static)
        t = jax.random.uniform(k_t, (x.shape[0],))
        return d.loss(x, t, k_z, label=label)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

for i in range(501):
    k_batch, k_step, k_train = jax.random.split(jax.random.fold_in(k_train, i), 3)
    x, label = make_batch(k_batch)
    params, opt_state, loss = train_step(params, opt_state, x, label, k_step)
    if i % 100 == 0:
        print(f"step {i}: loss {loss:.4f}")

denoiser = combine(params, static)


from azula_tpu.sample import DDIMSampler, DDPMSampler, HeunSampler

label = jnp.asarray([0, 0, 1, 1])

sampler = DDIMSampler(denoiser, steps=64)
x1 = sampler.init(k_sample, (4, 8, 8, 1))
x0 = sampler(x1, label=label)

# the stripes should be recognisable:
for img, cls in zip(x0[..., 0], [0, 0, 1, 1]):
    art = "\n".join(
        "".join("#" if v > 0 else "." for v in row) for row in img
    )
    print(f"class {cls}:\n{art}\n")


x0_ddpm = DDPMSampler(denoiser, steps=64)(x1, key=k_sample, label=label)
x0_heun = HeunSampler(denoiser, steps=32)(x1, label=label)


from azula_tpu.guidance import CFGDenoiser

cfg = CFGDenoiser(denoiser)
x0_cfg = DDIMSampler(cfg, steps=64)(
    x1,
    positive={"label": label},
    negative={"label": 1 - label},
    guidance=2.0,
)

r"""Distributed training: dp x tp mesh, sharded input pipeline, EMA,
checkpointing.

The production-training composition on a device mesh — every piece scales
from this script to a pod by changing the mesh arguments (multi-host adds one
`initialize_distributed()` call; see `docs/parallel.md`):

.. code-block:: console

    # 8 virtual devices on CPU (the test topology); on TPU, drop the flags
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_distributed.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from azula_tpu.denoise import KarrasDenoiser
from azula_tpu.nn.dit import DiT
from azula_tpu.nn.embedding import Modulated
from azula_tpu.noise import RectifiedSchedule
from azula_tpu.parallel import data_sharding, make_mesh, shard_batch, shard_module
from azula_tpu.sample import DDIMSampler
from azula_tpu.train import ema_update, make_train_step
from azula_tpu.utils.checkpoint import save_checkpoint
from azula_tpu.utils.data import epochs
from azula_tpu.utils.pytree import combine, partition


def main() -> None:
    key = jax.random.key(0)
    k_model, k_time, k_data, k_loop, k_sample = jax.random.split(key, 5)

    n = len(jax.devices())
    mesh = make_mesh(data=n // 2, model=2) if n % 2 == 0 else make_mesh()
    print(f"mesh: {dict(mesh.shape)} over {n} {jax.default_backend()} devices")

    # A small DiT denoiser; parameters tensor-parallel over 'model'
    mod_features = 32
    backbone = Modulated(
        DiT(
            in_channels=3,
            out_channels=3,
            mod_features=mod_features,
            hid_channels=64,
            hid_blocks=4,
            attention_heads=4,
            key=k_model,
        ),
        mod_features,
        key=k_time,
    )
    denoiser = KarrasDenoiser(backbone=backbone, schedule=RectifiedSchedule())
    denoiser = shard_module(denoiser, mesh)

    params, static = partition(denoiser)
    ema = params

    optimizer = optax.adamw(3e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(static, optimizer, donate=False)

    # Toy dataset: 3-channel token sequences; batches stage pre-sharded
    x_train = np.random.default_rng(0).normal(size=(2048, 16, 3)).astype(np.float32)

    for i, batch in enumerate(
        epochs(x_train, 256, key=k_data, num_epochs=4, sharding=data_sharding(mesh))
    ):
        k_t, k_z = jax.random.split(jax.random.fold_in(k_loop, i))
        t = shard_batch(jax.random.uniform(k_t, (batch.shape[0],)), mesh)

        params, opt_state, loss = step(params, opt_state, batch, t, k_z)
        ema = ema_update(ema, params, rate=0.99)

        if i % 8 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")

    # Sample from the EMA weights: dp-sharded batch, one compiled scan
    sampler = DDIMSampler(combine(ema, static), steps=16)
    x1 = shard_batch(sampler.init(k_sample, (n * 2, 16, 3)), mesh)
    x0 = sampler(x1)
    print("sampled:", x0.shape, "finite:", bool(jnp.all(jnp.isfinite(x0))))

    save_checkpoint("/tmp/azula_distributed.npz", combine(ema, static))
    print("checkpoint saved to /tmp/azula_distributed.npz")


if __name__ == "__main__":
    main()

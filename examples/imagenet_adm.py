r"""Pretrained ADM ImageNet sampling, optionally guided (inpainting).

Mirrors the reference README inference example (`/root/reference/README.md:68-85`)
with the TPU-native stack: the PyTorch checkpoint is converted to JAX arrays on
first use, the backbone runs in bfloat16, and the whole DDIM trajectory is one
compiled scan. Requires network access for the checkpoint download.

.. code-block:: console

    python examples/imagenet_adm.py
"""

import jax
import jax.numpy as jnp

from azula_tpu.guidance import MMPSDenoiser
from azula_tpu.linalg.covariance import IsotropicCovariance
from azula_tpu.models import adm
from azula_tpu.parallel import make_mesh, shard_batch
from azula_tpu.sample import DDIMSampler


def main():
    key = jax.random.key(0)
    k_init, k_obs = jax.random.split(key)

    denoiser = adm.load_model("imagenet_256x256", dtype=jnp.bfloat16)

    # Plain sampling, data-parallel over all local devices
    sampler = DDIMSampler(denoiser, eta=0.0, steps=64)

    mesh = make_mesh(model=1)
    x1 = shard_batch(sampler.init(k_init, (16, 256, 256, 3)), mesh)
    x0 = sampler(x1)

    print("samples:", x0.shape, x0.dtype)

    # Posterior sampling: inpaint the right half of an observed image.
    # The cg/gmres solvers treat the LAST axis as the vector dimension, so the
    # forward operator flattens its output (reference convention, y: (*, D)).
    def A(x):
        return x[:, :, :128, :].reshape(x.shape[0], -1)

    y = A(x0[:1])

    guided = MMPSDenoiser(
        denoiser, y, A, IsotropicCovariance(1e-3), iterations=2
    )
    guided_sampler = DDIMSampler(guided, eta=0.0, steps=64)

    x1 = guided_sampler.init(k_obs, (4, 256, 256, 3))
    x0 = guided_sampler(x1)

    print("inpainted:", x0.shape)


if __name__ == "__main__":
    main()

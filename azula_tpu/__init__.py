r"""Azula-TPU — TPU-native diffusion models in JAX.

A from-scratch, TPU-first reimplementation of the capability surface of
``probabilists/azula`` (reference: ``azula/__init__.py:1-5``): noise schedules,
preconditioned denoisers, reverse-diffusion samplers, guidance / posterior sampling,
structured-covariance linear algebra, NN backbones (UNet / DiT / ViT), and a
pretrained-model zoo — redesigned around JAX / XLA / Pallas / pjit:

- every component is a JAX pytree, so ``jit`` / ``grad`` / ``vmap`` / ``scan``
  compose freely;
- samplers compile the whole reverse trajectory to a single :func:`jax.lax.scan`;
- hot kernels (flash attention, fused GroupNorm-SiLU) are Pallas TPU kernels;
- batch sampling shards over a :class:`jax.sharding.Mesh` (see :mod:`azula_tpu.parallel`).
"""

__version__ = "0.1.0"

from . import (  # noqa: F401
    debug,
    denoise,
    guidance,
    hub,
    linalg,
    nn,
    noise,
    ops,
    parallel,
    sample,
    train,
)

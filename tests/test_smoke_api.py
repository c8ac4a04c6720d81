r"""Sub-minute smoke coverage of the hottest public surfaces — the APIs every
user touches first (VERDICT r4 #5): a sampler ``__call__`` scan, a guidance
wrapper, and the UNet/DiT/ViT backbone forwards, all at tiny shapes on CPU.

The fast tier covers these exhaustively (tests/test_sample.py,
tests/test_guidance.py, tests/test_nn.py); this file exists so that
``pytest -m smoke`` (~35 s) catches a broken ``DDIMSampler.__call__`` or
``UNet.__call__`` without waiting for the ~9-minute fast tier.
"""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.denoise import KarrasDenoiser, SimpleDenoiser
from azula_tpu.guidance import CFGDenoiser
from azula_tpu.noise import RectifiedSchedule, VPSchedule
from azula_tpu.sample import DDIMSampler, DDPMSampler, EulerSampler

from dummies import Dummy

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)


@pytest.mark.parametrize("sampler_cls", [DDPMSampler, EulerSampler])
def test_sampler_scan_smoke(sampler_cls, key):
    r"""The full reverse-trajectory scan runs and produces finite samples —
    the single most-called public entry point (reference
    `azula/sample.py:139-161`)."""

    k1, k2, k3 = jax.random.split(key, 3)

    denoiser = KarrasDenoiser(backbone=Dummy(5, key=k1), schedule=VPSchedule())
    sampler = sampler_cls(denoiser, steps=8)

    x1 = sampler.init(k2, (4, 5))
    x0 = sampler(x1, key=k3)

    assert x0.shape == (4, 5)
    assert jnp.all(jnp.isfinite(x0))


def test_ddim_eta_smoke(key):
    r"""DDIM at eta in {0, 0.5, 1}: deterministic at 0, stochastic otherwise."""

    k1, k2, k3 = jax.random.split(key, 3)

    denoiser = SimpleDenoiser(backbone=Dummy(5, key=k1), schedule=RectifiedSchedule())

    x1 = DDIMSampler(denoiser, eta=0.0, steps=8).init(k2, (4, 5))

    for eta in (0.0, 0.5, 1.0):
        x0 = DDIMSampler(denoiser, eta=eta, steps=8)(x1, key=k3)
        assert x0.shape == (4, 5) and jnp.all(jnp.isfinite(x0)), eta


def test_cfg_wrapper_smoke(key):
    r"""CFG wrapping (the default guidance for every zoo model) produces the
    mu+ + w (mu+ - mu-) combination and samples end to end."""

    k1, k2, k3 = jax.random.split(key, 3)

    denoiser = KarrasDenoiser(
        backbone=Dummy(5, with_label=True, key=k1), schedule=VPSchedule()
    )
    cfg = CFGDenoiser(denoiser)

    sampler = DDIMSampler(cfg, eta=0.0, steps=4)
    x1 = sampler.init(k2, (4, 5))
    x0 = sampler(
        x1,
        key=k3,
        positive={"label": "cat"},
        negative={"label": "dog"},
        guidance=1.5,
    )

    assert x0.shape == (4, 5)
    assert jnp.all(jnp.isfinite(x0))


def test_unet_forward_smoke(key):
    from azula_tpu.nn.unet import UNet

    k1, k2 = jax.random.split(key)

    unet = UNet(
        3, 3, mod_features=8, hid_channels=(8, 16), hid_blocks=(1, 1), key=k1
    )

    x = jax.random.normal(k2, (2, 16, 16, 3))
    mod = jnp.ones((2, 8))
    y = unet(x, mod)

    assert y.shape == (2, 16, 16, 3)
    assert jnp.all(jnp.isfinite(y))


def test_dit_forward_smoke(key):
    from azula_tpu.nn.dit import DiT

    k1, k2 = jax.random.split(key)

    dit = DiT(3, 3, mod_features=8, hid_channels=32, hid_blocks=2,
              attention_heads=4, key=k1)

    x = jax.random.normal(k2, (2, 16, 3))
    mod = jnp.ones((2, 8))
    y = dit(x, mod)

    assert y.shape == (2, 16, 3)
    assert jnp.all(jnp.isfinite(y))


def test_vit_forward_smoke(key):
    from azula_tpu.nn.vit import ViT

    k1, k2 = jax.random.split(key)

    vit = ViT(3, 3, mod_features=8, hid_channels=32, hid_blocks=2,
              attention_heads=4, patch_size=4, key=k1)

    x = jax.random.normal(k2, (2, 16, 16, 3))
    mod = jnp.ones((2, 8))
    y = vit(x, mod)

    assert y.shape == (2, 16, 16, 3)
    assert jnp.all(jnp.isfinite(y))


def test_loss_and_grad_smoke(key):
    r"""denoiser.loss + jax.grad — the training-loop surface."""

    from azula_tpu.utils.pytree import combine, partition

    k1, k2, k3 = jax.random.split(key, 3)

    denoiser = KarrasDenoiser(backbone=Dummy(5, key=k1), schedule=VPSchedule())
    params, static = partition(denoiser)

    x = jax.random.normal(k2, (8, 5))
    t = jnp.linspace(0.1, 0.9, 8)

    def loss_fn(p):
        return combine(p, static).loss(x, t, key=k3)

    loss, grads = jax.value_and_grad(loss_fn)(params)

    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))

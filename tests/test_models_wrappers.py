r"""Tests for the wrapper-based model families (edm/eldm/sd/flux/sana):
preconditioning math with dummy JAX backbones, schedule defaults, cards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.edm import ElucidatedDenoiser
from azula_tpu.models.eldm import ElucidatedLatentDenoiser
from azula_tpu.models.flux import FluxDenoiser
from azula_tpu.models.flux import AutoEncoder as FluxAutoEncoder
from azula_tpu.models.sana import SanaDenoiser
from azula_tpu.models.sd import StableDenoiser, sd_sigmas
from azula_tpu.models.utils import load_cards
from azula_tpu.nn.module import Module
from azula_tpu.noise import DecaySchedule, ElucidatedSchedule, VPSchedule
from azula_tpu.sample import DDIMSampler


class Recorder(Module):
    r"""Dummy backbone that records its call signature and returns zeros."""

    def __init__(self):
        self.calls = []

    def __call__(self, *args, **kwargs):
        # find the main tensor argument
        for candidate in args + tuple(kwargs.values()):
            if hasattr(candidate, "shape") and getattr(candidate, "ndim", 0) >= 3:
                return jnp.zeros_like(candidate)
        raise AssertionError("no tensor argument found")


def test_edm_denoiser(key):
    denoiser = ElucidatedDenoiser(Recorder())

    assert isinstance(denoiser.schedule, ElucidatedSchedule)

    x_t = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.full((2,), 0.5)

    q = denoiser(x_t, t, label=jnp.ones((2, 10)))

    # zero backbone output => mean = c_skip * 0 ... EDM is pure x-prediction:
    # mean equals the backbone output, i.e. zeros
    assert q.mean.shape == x_t.shape
    assert jnp.allclose(q.mean, 0.0)

    # Samplable end to end
    sampler = DDIMSampler(denoiser, steps=4)
    x0 = sampler(sampler.init(key, (2, 8, 8, 3)))
    assert jnp.all(jnp.isfinite(x0))


def test_eldm_denoiser(key):
    denoiser = ElucidatedLatentDenoiser(Recorder())

    z_t = jax.random.normal(key, (2, 8, 8, 4))
    q = denoiser(z_t, jnp.full((2,), 0.3))

    assert q.mean.shape == z_t.shape


def test_sd_sigmas_and_denoiser(key):
    sigmas = sd_sigmas()

    assert sigmas.shape == (1000,)
    assert np.all(np.diff(sigmas) > 0)
    assert 0 < sigmas[0] < 0.04
    assert sigmas[-1] < 1.0

    denoiser = StableDenoiser(Recorder(), prediction="epsilon")

    assert isinstance(denoiser.schedule, VPSchedule)

    z_t = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.full((2,), 0.5)
    embeds = jnp.zeros((2, 77, 16))

    q = denoiser(z_t, t, prompt_embeds=embeds)

    # epsilon-prediction with zero output: mean = z_t / alpha_t
    alpha_t, _ = denoiser.schedule(t)
    assert jnp.allclose(q.mean, z_t / alpha_t[:, None, None, None], atol=1e-5)

    # velocity-prediction path
    q_v = StableDenoiser(Recorder(), prediction="velocity")(
        z_t, t, prompt_embeds=embeds
    )
    assert jnp.all(jnp.isfinite(q_v.mean))


def test_flux_denoiser(key):
    denoiser = FluxDenoiser(Recorder())

    assert isinstance(denoiser.schedule, DecaySchedule)

    z_t = jax.random.normal(key, (2, 4, 4, 64))
    t = jnp.full((2,), 0.5)

    q = denoiser(
        z_t,
        t,
        prompt_clip=jnp.zeros((2, 16)),
        prompt_t5=jnp.zeros((2, 8, 16)),
        guidance=4.0,
    )

    # zero output: mean = c_skip z_t = z_t / (alpha + sigma)
    alpha_t, sigma_t = denoiser.schedule(t)
    expected = z_t / (alpha_t + sigma_t)[:, None, None, None]
    assert jnp.allclose(q.mean, expected, atol=1e-5)


def test_flux_autoencoder_packing(key):
    class IdentityVAE(Module):
        def __init__(self):
            pass

        def encode(self, x):
            return x, jnp.zeros_like(x)

        def decode(self, z):
            return z

    ae = FluxAutoEncoder(IdentityVAE(), shift=0.0, scale=1.0)

    x = jax.random.normal(key, (2, 8, 8, 16))
    z = ae.encode(x, key)

    assert z.shape == (2, 4, 4, 64)

    # Packing round-trips
    assert jnp.allclose(ae.decode(z), x, atol=1e-6)


def test_sana_denoiser(key):
    denoiser = SanaDenoiser(Recorder())

    z_t = jax.random.normal(key, (2, 4, 4, 32))
    t = jnp.full((2,), 0.5)

    q = denoiser(
        z_t,
        t,
        prompt_embeds=jnp.zeros((2, 8, 16)),
        prompt_mask=jnp.ones((2, 8)),
    )

    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


@pytest.mark.parametrize(
    "family, expected",
    [
        ("edm", 5),
        ("eldm", 6),
        ("sd", 6),
        ("flux", 1),
        ("sana", 8),
        ("adm", 6),
        ("vdm", 6),
        ("jit", 6),
    ],
)
def test_cards(family, expected):
    import importlib

    importlib.import_module(f"azula_tpu.models.{family}")
    cards = load_cards(f"azula_tpu.models.{family}")

    assert len(cards) == expected

    for card in cards.values():
        assert hasattr(card, "url") or hasattr(card, "repo")

r"""Tests for azula_tpu.sample (mirrors reference tests/test_sample.py:54-92,
plus sampler statistical-correctness tests against the analytical
GaussianDenoiser that the reference lacks, SURVEY.md §4)."""

import functools
import jax
import jax.numpy as jnp
import pytest

from azula_tpu.denoise import GaussianDenoiser, KarrasDenoiser
from azula_tpu.linalg.covariance import DiagonalCovariance
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import (
    DDIMSampler,
    DDPMSampler,
    EulerSampler,
    HeunSampler,
    ItoSampler,
    PCSampler,
    REABSampler,
    vABSampler,
    xEABSampler,
    zABSampler,
    zEABSampler,
)

from dummies import Dummy

SAMPLERS = [
    functools.partial(DDPMSampler),
    functools.partial(DDIMSampler, eta=0.0),
    functools.partial(DDIMSampler, eta=1.0),
    functools.partial(EulerSampler),
    functools.partial(HeunSampler),
    functools.partial(ItoSampler, eta=1.0),
    functools.partial(zABSampler),
    functools.partial(vABSampler),
    functools.partial(zEABSampler),
    functools.partial(xEABSampler),
    functools.partial(REABSampler),
    functools.partial(PCSampler, corrections=1),
]


@pytest.mark.parametrize("with_label", [False, True])
@pytest.mark.parametrize("batch", [(), (16,)])
def test_samplers(with_label, batch, key):
    k1, k2, k3 = jax.random.split(key, 3)
    channels = 5

    denoiser = KarrasDenoiser(
        backbone=Dummy(channels, with_label, key=k1),
        schedule=VPSchedule(),
    )

    kwargs = {"label": "cat"} if with_label else {}

    for S in SAMPLERS:
        sampler = S(denoiser, steps=8)

        x1 = sampler.init(k2, (*batch, channels))

        assert x1.shape == (*batch, channels), S
        assert jnp.all(jnp.isfinite(x1)), S

        x0 = sampler(x1, key=k3, **kwargs)

        assert x0.shape == (*batch, channels), S
        assert jnp.all(jnp.isfinite(x0)), S


def test_stochastic_sampler_requires_key(key):
    denoiser = KarrasDenoiser(
        backbone=Dummy(5, key=key),
        schedule=VPSchedule(),
    )

    sampler = DDPMSampler(denoiser, steps=4)
    x1 = sampler.init(key, (5,))

    with pytest.raises(ValueError, match="stochastic"):
        sampler(x1)

    # Deterministic samplers run without a key
    x0 = EulerSampler(denoiser, steps=4)(x1)
    assert jnp.all(jnp.isfinite(x0))


@pytest.mark.parametrize(
    "sampler_cls",
    [
        functools.partial(DDPMSampler),
        functools.partial(DDIMSampler, eta=0.0),
        functools.partial(HeunSampler),
        functools.partial(ItoSampler, eta=1.0),
        functools.partial(PCSampler, corrections=1),
        functools.partial(zEABSampler, order=2),
        functools.partial(xEABSampler, order=2),
    ],
)
def test_sampler_statistics(sampler_cls, key):
    r"""With an analytical Gaussian denoiser, samplers must reproduce the prior's
    mean and variance (analytical ground truth available in-library)."""

    k1, k2 = jax.random.split(key)
    channels = 4

    mean = jnp.asarray([1.0, -1.0, 0.5, 0.0])
    var = jnp.asarray([0.5, 1.0, 2.0, 0.25])

    denoiser = GaussianDenoiser(
        mean=mean,
        cov=DiagonalCovariance(var),
        schedule=VPSchedule(),
    )

    sampler = sampler_cls(denoiser, steps=128)

    B = 8192
    x1 = sampler.init(k1, (B, channels))
    x0 = sampler(x1, key=k2)

    emp_mean = x0.mean(axis=0)
    emp_var = x0.var(axis=0)

    assert jnp.allclose(emp_mean, mean, atol=0.1), (emp_mean, mean)
    assert jnp.allclose(emp_var, var, rtol=0.2, atol=0.05), (emp_var, var)


def test_sampling_is_deterministic_given_key(key):
    denoiser = KarrasDenoiser(backbone=Dummy(5, key=key), schedule=VPSchedule())
    sampler = DDPMSampler(denoiser, steps=8)

    x1 = sampler.init(key, (4, 5))

    assert jnp.allclose(sampler(x1, key=key), sampler(x1, key=key))

    other = sampler(x1, key=jax.random.key(1))
    assert not jnp.allclose(sampler(x1, key=key), other)


def test_split_trajectory_resumes(key):
    r"""Sampling in two chunks over the same grid equals one full run —
    deterministic reverse trajectories are checkpoint/resumable via start/stop
    (SURVEY §5.3: step-checkpointed sampling state)."""

    denoiser = KarrasDenoiser(backbone=Dummy(5, key=key), schedule=VPSchedule())

    full = EulerSampler(denoiser, start=1.0, stop=0.0, steps=16)
    first = EulerSampler(denoiser, start=1.0, stop=0.5, steps=8)
    second = EulerSampler(denoiser, start=0.5, stop=0.0, steps=8)

    x1 = full.init(key, (4, 5))

    x0_full = full(x1)
    x0_split = second(first(x1))

    assert jnp.allclose(x0_full, x0_split, atol=1e-5)


def test_partial_time_range(key):
    r"""Samplers support start/stop sub-ranges (reference Sampler config,
    `sample.py:69-94`)."""

    denoiser = KarrasDenoiser(backbone=Dummy(5, key=key), schedule=VPSchedule())
    sampler = DDIMSampler(denoiser, start=0.7, stop=0.3, steps=8)

    ts = sampler.timesteps
    assert jnp.allclose(ts[0], 0.7)
    assert jnp.allclose(ts[-1], 0.3)

    x1 = sampler.init(key, (5,))
    x0 = sampler(x1)

    assert jnp.all(jnp.isfinite(x0))

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


def _affine_terminal_var(schedule, steps, v, step_gains):
    r"""Exact terminal variance of a sampler whose per-step update is affine.

    With the analytic :class:`GaussianDenoiser` (prior :math:`N(m, v)`), the
    posterior mean is linear in :math:`x_t`, so every update here takes the
    form :math:`x_s - \alpha_s m = A (x_t - \alpha_t m) + C \epsilon` and the
    centered variance obeys :math:`w_s = A^2 w_t + C^2` exactly. The per-step
    ``(A, C)`` pairs come from ``step_gains(alpha_t, sigma_t, alpha_s, sigma_s)``
    (a list, for predictor-corrector composites). Runs the recursion on the
    host in float64 — an implementation-independent oracle for the stochastic
    samplers' terminal moments (reference math: `azula/sample.py:355-431,
    953-993`).
    """

    import numpy as np

    ts = jnp.linspace(1.0, 0.0, steps + 1)
    alpha, sigma = schedule(ts)
    alpha = np.asarray(alpha, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)

    w = alpha[0] ** 2 * v + sigma[0] ** 2  # Sampler.init variance
    for i in range(steps):
        for A, C in step_gains(alpha[i], sigma[i], alpha[i + 1], sigma[i + 1]):
            w = A**2 * w + C**2

    return float(w)


@pytest.mark.parametrize(
    "eta,temperature",
    [(0.0, 1.0), (0.5, 1.0), (2.0, 1.0), (1.0, 0.5), (1.0, 2.0)],
)
def test_ito_moments_analytic(eta, temperature, key):
    r"""ItoSampler terminal moments across (eta, temperature) match the exact
    affine recursion; at temperature 1 they also recover the prior. A flipped
    temperature (or eta) sign/inverse moves the expected variance by far more
    than the Monte-Carlo tolerance."""

    m, v = 1.0, 2.0
    channels, steps = 2, 128
    schedule = VPSchedule()

    denoiser = GaussianDenoiser(
        mean=jnp.full((channels,), m),
        cov=DiagonalCovariance(jnp.full((channels,), v)),
        schedule=schedule,
    )
    sampler = ItoSampler(denoiser, eta=eta, temperature=temperature, steps=steps)

    def gains(alpha_t, sigma_t, alpha_s, sigma_s):
        # x_s = (a_s/a_t) x_t + ((1+eta^2)/tau)(s_s/s_t - a_s/a_t)(x_t - a_t mu)
        #       + eta a_s sqrt|r_t^2 - r_s^2| eps,   r = sigma/alpha
        # and for the Gaussian prior, x_t - a_t mu = shrink (x_t - a_t m).
        a = alpha_s / alpha_t
        c = (1 + eta**2) / temperature * (sigma_s / sigma_t - a)
        shrink = sigma_t**2 / (alpha_t**2 * v + sigma_t**2)
        C = eta * alpha_s * abs((sigma_t / alpha_t) ** 2 - (sigma_s / alpha_s) ** 2) ** 0.5
        return [(a + c * shrink, C)]

    expected = _affine_terminal_var(schedule, steps, v, gains)

    if temperature == 1.0:
        # The correctly-discretized eta-family leaves the marginals invariant.
        assert abs(expected - v) < 0.12 * v, expected

    k1, k2 = jax.random.split(key)
    B = 16384
    x1 = sampler.init(k1, (B, channels), mean=m, var=v)
    x0 = sampler(x1, key=k2)

    emp_mean = x0.mean(axis=0)
    emp_var = x0.var(axis=0)

    assert jnp.allclose(emp_mean, m, atol=4 * (expected / B) ** 0.5 + 0.02), emp_mean
    assert jnp.allclose(emp_var, expected, rtol=0.08), (emp_var, expected)


def test_ito_temperature_direction():
    r"""Lower temperature contracts the terminal distribution (and vice
    versa) — the directional property a flipped tau sign would invert."""

    v, steps = 2.0, 128
    schedule = VPSchedule()

    def gains_for(tau):
        def gains(alpha_t, sigma_t, alpha_s, sigma_s):
            a = alpha_s / alpha_t
            c = 2.0 / tau * (sigma_s / sigma_t - a)  # eta = 1
            shrink = sigma_t**2 / (alpha_t**2 * v + sigma_t**2)
            C = alpha_s * abs((sigma_t / alpha_t) ** 2 - (sigma_s / alpha_s) ** 2) ** 0.5
            return [(a + c * shrink, C)]

        return gains

    cold = _affine_terminal_var(schedule, steps, v, gains_for(0.5))
    warm = _affine_terminal_var(schedule, steps, v, gains_for(1.0))
    hot = _affine_terminal_var(schedule, steps, v, gains_for(2.0))

    assert cold < 0.8 * warm < warm < 1.25 * hot < hot * 1.3, (cold, warm, hot)


@pytest.mark.parametrize("corrections,delta", [(2, 0.05), (4, 0.2), (1, 0.01)])
def test_pc_moments_analytic(corrections, delta, key):
    r"""PCSampler terminal moments across (corrections, delta) match the exact
    affine recursion (the corrector is a first-order Langevin step: slightly
    contractive at finite delta, so 'equals the prior' is only true as
    delta -> 0 — the recursion captures the exact finite-delta value)."""

    m, v = -0.5, 1.5
    channels, steps = 2, 128
    schedule = VPSchedule()

    denoiser = GaussianDenoiser(
        mean=jnp.full((channels,), m),
        cov=DiagonalCovariance(jnp.full((channels,), v)),
        schedule=schedule,
    )
    sampler = PCSampler(denoiser, corrections=corrections, delta=delta, steps=steps)

    def gains(alpha_t, sigma_t, alpha_s, sigma_s):
        # Corrector: x <- a_t mu + sqrt(1-d)(x - a_t mu) + sqrt(d) s_t eps,
        # with a_t mu = p x + (1-p) a_t m for the Gaussian prior.
        p = alpha_t**2 * v / (alpha_t**2 * v + sigma_t**2)
        corr = (p + (1 - delta) ** 0.5 * (1 - p), delta**0.5 * sigma_t)
        # Predictor (deterministic DDIM-like transport).
        pred = (alpha_s / alpha_t * p + sigma_s / sigma_t * (1 - p), 0.0)
        return [corr] * corrections + [pred]

    expected = _affine_terminal_var(schedule, steps, v, gains)

    if delta <= 0.01:
        assert abs(expected - v) < 0.1 * v, expected

    k1, k2 = jax.random.split(key)
    B = 16384
    x1 = sampler.init(k1, (B, channels), mean=m, var=v)
    x0 = sampler(x1, key=k2)

    emp_mean = x0.mean(axis=0)
    emp_var = x0.var(axis=0)

    assert jnp.allclose(emp_mean, m, atol=4 * (expected / B) ** 0.5 + 0.02), emp_mean
    assert jnp.allclose(emp_var, expected, rtol=0.08), (emp_var, expected)


@pytest.mark.parametrize("eta", [0.25, 0.5])
def test_ddim_intermediate_eta_moments_analytic(eta, key):
    r"""DDIM terminal moments at intermediate eta — the setting users actually
    sweep (reference `azula/sample.py:219-261`) — match the exact affine
    recursion: a wrong tau clip sign or a mis-scaled noise injection moves the
    expected variance far beyond the Monte-Carlo tolerance (VERDICT r4 #8)."""

    import numpy as np

    m, v = 0.5, 2.0
    channels, steps = 2, 128
    schedule = VPSchedule()

    denoiser = GaussianDenoiser(
        mean=jnp.full((channels,), m),
        cov=DiagonalCovariance(jnp.full((channels,), v)),
        schedule=schedule,
    )
    sampler = DDIMSampler(denoiser, eta=eta, steps=steps)

    def gains(alpha_t, sigma_t, alpha_s, sigma_s):
        # x_s = a_s mu + s_s sqrt(1-tau)/s_t (x_t - a_t mu) + s_s sqrt(tau) eps
        # with mu - m = (p/a_t)(x_t - a_t m), x_t - a_t mu = (1-p)(x_t - a_t m)
        # for the Gaussian prior, p = a_t^2 v / (a_t^2 v + s_t^2).
        tau = np.clip(eta * (1 - (alpha_t / alpha_s * sigma_s / sigma_t) ** 2), 0, 1)
        p = alpha_t**2 * v / (alpha_t**2 * v + sigma_t**2)
        A = alpha_s / alpha_t * p + sigma_s * (1 - tau) ** 0.5 / sigma_t * (1 - p)
        C = sigma_s * tau**0.5
        return [(A, C)]

    expected = _affine_terminal_var(schedule, steps, v, gains)

    # The eta-family leaves the marginals (approximately) invariant at every
    # eta — the exact recursion must land near the prior variance.
    assert abs(expected - v) < 0.12 * v, expected

    k1, k2 = jax.random.split(key)
    B = 16384
    x1 = sampler.init(k1, (B, channels), mean=m, var=v)
    x0 = sampler(x1, key=k2)

    emp_mean = x0.mean(axis=0)
    emp_var = x0.var(axis=0)

    assert jnp.allclose(emp_mean, m, atol=4 * (expected / B) ** 0.5 + 0.02), emp_mean
    assert jnp.allclose(emp_var, expected, rtol=0.08), (emp_var, expected)


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

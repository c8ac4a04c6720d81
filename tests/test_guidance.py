r"""Tests for azula_tpu.guidance.

The reference ships no guidance tests; these go further: every method runs on a
linear-Gaussian inverse problem where the analytical GaussianDenoiser provides
ground truth, so posterior-consistency can be asserted, not just shapes.
"""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.denoise import GaussianDenoiser, KarrasDenoiser
from azula_tpu.guidance import (
    CFGDenoiser,
    DiffPIRDenoiser,
    DPSSampler,
    JFPSDenoiser,
    MMPSDenoiser,
    PGDMSampler,
    RePaintSampler,
    TDSSampler,
    TMPDenoiser,
)
from azula_tpu.linalg.covariance import DiagonalCovariance, IsotropicCovariance
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import DDIMSampler, DDPMSampler

from dummies import Dummy

CHANNELS = 5
OBSERVED = 3


@pytest.fixture
def problem(key):
    r"""A linear-Gaussian inverse problem: observe the first 3 of 5 coordinates."""

    k1, k2 = jax.random.split(key)

    mean = jnp.zeros(CHANNELS)
    var = jnp.ones(CHANNELS)

    denoiser = GaussianDenoiser(
        mean=mean,
        cov=DiagonalCovariance(var),
        schedule=VPSchedule(),
    )

    x_star = jax.random.normal(k1, (CHANNELS,))

    def A(x):
        return x[..., :OBSERVED]

    var_y = 0.01
    y = A(x_star) + jnp.sqrt(var_y) * jax.random.normal(k2, (OBSERVED,))

    return denoiser, A, y, var_y, x_star


def _posterior_mean(y, var_y):
    r"""True posterior mean for prior N(0, I) and y = x[:3] + N(0, var_y)."""

    post = y / (1 + var_y)
    return jnp.concatenate([post, jnp.zeros(CHANNELS - OBSERVED)])


def test_cfg(key):
    r"""With identical positive/negative conditioning, CFG equals the inner
    denoiser for any guidance strength."""

    denoiser = KarrasDenoiser(backbone=Dummy(CHANNELS, key=key), schedule=VPSchedule())
    cfg = CFGDenoiser(denoiser)

    x_t = jax.random.normal(key, (4, CHANNELS))
    t = jnp.full((4,), 0.6)

    q = cfg(x_t, t, positive={}, negative={}, guidance=2.5)
    q_inner = denoiser(x_t, t)

    assert jnp.allclose(q.mean, q_inner.mean, atol=1e-6)

    # And sampling through the wrapper works (2 backbone calls per step)
    sampler = DDIMSampler(cfg, steps=4)
    x1 = sampler.init(key, (4, CHANNELS))
    x0 = sampler(x1, positive={}, negative={}, guidance=1.0)

    assert jnp.all(jnp.isfinite(x0))


def test_cfg_batched(key):
    r"""The fused 2B-batch CFG path equals the two-call path exactly, including
    batch-1 negative conditioning broadcast."""

    from azula_tpu.nn.layers import Linear, SineEncoding
    from azula_tpu.nn.module import Module

    class CondDummy(Module):
        def __init__(self, features, *, key):
            k1, k2, k3 = jax.random.split(key, 3)
            self.l1 = Linear(features, 32, key=k1)
            self.l2 = Linear(32, features, key=k2)
            self.emb = jax.random.normal(k3, (10, 32))
            self.time_encoding = SineEncoding(32)

        def __call__(self, x_t, t, label):
            y = self.l1(x_t) + self.time_encoding(t) + self.emb[label]
            return self.l2(jax.nn.relu(y))

    denoiser = KarrasDenoiser(backbone=CondDummy(CHANNELS, key=key), schedule=VPSchedule())

    two = CFGDenoiser(denoiser)
    one = CFGDenoiser(denoiser, batched=True)

    x_t = jax.random.normal(key, (4, CHANNELS))
    t = jnp.full((4,), 0.6)

    pos = {"label": jnp.asarray([1, 2, 3, 4])}
    for neg in ({"label": jnp.zeros(4, int)}, {"label": jnp.zeros(1, int)}):
        q_two = two(x_t, t, positive=pos, negative=neg, guidance=1.5)
        q_one = one(x_t, t, positive=pos, negative=neg, guidance=1.5)

        assert jnp.allclose(q_one.mean, q_two.mean, atol=1e-5)

    # scalar time is broadcast before fusing
    q_two = two(x_t, jnp.asarray(0.6), positive=pos, negative=neg, guidance=1.5)
    q_one = one(x_t, jnp.asarray(0.6), positive=pos, negative=neg, guidance=1.5)
    assert jnp.allclose(q_one.mean, q_two.mean, atol=1e-5)

    # and the fused path composes with a compiled sampling scan
    sampler = DDIMSampler(one, steps=4)
    x0 = sampler(sampler.init(key, (4, CHANNELS)), positive=pos, negative=neg, guidance=1.0)
    assert jnp.all(jnp.isfinite(x0))

    # batched=True is a loud contract, not a silent fallback: key-set or
    # shape mismatches raise instead of quietly running two calls
    with pytest.raises(ValueError, match="share keys"):
        one(x_t, t, positive=pos, negative={}, guidance=1.5)
    with pytest.raises(ValueError, match="incompatible shapes"):
        one(x_t, t, positive=pos, negative={"label": jnp.zeros((4, 2), int)}, guidance=1.5)


@pytest.mark.parametrize(
    "make_denoiser",
    [
        lambda d, A, y, var_y: MMPSDenoiser(d, y, A, IsotropicCovariance(var_y), iterations=3),
        lambda d, A, y, var_y: TMPDenoiser(d, y, A, var_y),
        lambda d, A, y, var_y: DiffPIRDenoiser(d, y, A, var_y, lmbda=0.1, iterations=3),
        lambda d, A, y, var_y: JFPSDenoiser(
            d, y, A, IsotropicCovariance(var_y), IsotropicCovariance(1.0), iterations=3
        ),
    ],
    ids=["mmps", "tmpd", "diffpir", "jfps"],
)
def test_wrapper_denoisers_sample(make_denoiser, problem, key):
    denoiser, A, y, var_y, _ = problem

    guided = make_denoiser(denoiser, A, y, var_y)

    sampler = DDIMSampler(guided, eta=0.0, steps=64)

    k1, k2 = jax.random.split(key)
    x1 = sampler.init(k1, (64, CHANNELS))
    x0 = sampler(x1, key=k2)

    assert x0.shape == (64, CHANNELS)
    assert jnp.all(jnp.isfinite(x0))

    # Observed coordinates concentrate near the true posterior mean
    post = _posterior_mean(y, var_y)
    emp = x0.mean(axis=0)

    assert jnp.allclose(emp[:OBSERVED], post[:OBSERVED], atol=0.35), (emp, post)


def test_mmps_posterior_accuracy(problem, key):
    r"""MMPS with the analytical denoiser recovers the exact linear-Gaussian
    posterior mean."""

    denoiser, A, y, var_y, _ = problem

    guided = MMPSDenoiser(denoiser, y, A, IsotropicCovariance(var_y), iterations=5)

    sampler = DDPMSampler(guided, steps=128)

    k1, k2 = jax.random.split(key)
    x1 = sampler.init(k1, (512, CHANNELS))
    x0 = sampler(x1, key=k2)

    post = _posterior_mean(y, var_y)
    emp = x0.mean(axis=0)

    assert jnp.allclose(emp, post, atol=0.2), (emp, post)

    # Unobserved coordinates keep prior variance; observed shrink towards var_y
    emp_var = x0.var(axis=0)
    assert jnp.all(emp_var[:OBSERVED] < 0.3)
    assert jnp.allclose(emp_var[OBSERVED:], 1.0, atol=0.35)


def test_guidance_under_multistep_scan(problem, key):
    r"""Guidance wrappers (vjp + solver closures) compose with the multistep
    samplers' compiled scan and history carry."""

    from azula_tpu.sample import zEABSampler

    denoiser, A, y, var_y, _ = problem

    guided = MMPSDenoiser(denoiser, y, A, IsotropicCovariance(var_y), iterations=2)
    sampler = zEABSampler(guided, order=2, steps=16)

    x1 = sampler.init(key, (8, CHANNELS))
    x0 = sampler(x1)

    assert jnp.all(jnp.isfinite(x0))

    post = _posterior_mean(y, var_y)
    assert jnp.allclose(x0.mean(axis=0)[:OBSERVED], post[:OBSERVED], atol=0.4)


def test_dps_pgdm(problem, key):
    denoiser, A, y, var_y, _ = problem

    k1, k2 = jax.random.split(key)

    dps = DPSSampler(denoiser, y, A, zeta=0.3, steps=32)
    x0 = dps(dps.init(k1, (16, CHANNELS)), key=k2)
    assert jnp.all(jnp.isfinite(x0))

    pgdm = PGDMSampler(denoiser, y, A, A_inv=lambda v: jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, CHANNELS - OBSERVED),)), steps=32)
    x0 = pgdm(pgdm.init(k1, (16, CHANNELS)), key=k2)
    assert jnp.all(jnp.isfinite(x0))


def test_repaint(problem, key):
    denoiser, _, _, _, x_star = problem

    mask = jnp.asarray([True, True, True, False, False])
    y = jnp.where(mask, x_star, 0.0)

    sampler = RePaintSampler(denoiser, y=y, mask=mask, iterations=2, eta=1.0, steps=64)

    k1, k2 = jax.random.split(key)
    x1 = sampler.init(k1, (64, CHANNELS))
    x0 = sampler(x1, key=k2)

    assert jnp.all(jnp.isfinite(x0))

    # Inpainted region is consistent with the observation
    emp = x0.mean(axis=0)
    assert jnp.allclose(emp[:3], x_star[:3], atol=0.35), (emp, x_star)


def test_tds(problem, key):
    denoiser, A, y, var_y, _ = problem

    def twist(x_hat, ratio):
        # Variance inflated by the noise ratio at high t (the ratio argument
        # exists for exactly this, reference `tds.py:30-31`)
        return -jnp.sum((y - A(x_hat)) ** 2, axis=-1) / (2 * (var_y + ratio**2))

    sampler = TDSSampler(denoiser, twist, steps=64)

    k1, k2 = jax.random.split(key)
    x1 = sampler.init(k1, (128, CHANNELS))
    x0 = sampler(x1, key=k2)

    assert x0.shape == (128, CHANNELS)
    assert jnp.all(jnp.isfinite(x0))

    post = _posterior_mean(y, var_y)
    emp = x0.mean(axis=0)

    assert jnp.allclose(emp[:OBSERVED], post[:OBSERVED], atol=0.35), (emp, post)


def test_tds_ess_and_posterior(problem, key):
    r"""On the conjugate linear-Gaussian problem with the exact twist
    p(y | x_t) = N(y; A x_hat, var_y + posterior-variance), the TDS particle
    system must stay healthy (high effective sample size) and its
    self-normalized estimate must match the analytic posterior mean and
    variance (reference math: `azula/guidance/tds.py:57-104`). A wrong weight
    or twist sign collapses the ESS and biases the estimate far outside these
    tolerances."""

    denoiser, A, y, var_y, _ = problem

    def twist(x_hat, ratio):
        # Exact conjugate twist: Var[X | x_t] = v r^2 / (v + r^2) with v = 1.
        pvar = ratio**2 / (1 + ratio**2)
        return -jnp.sum((y - A(x_hat)) ** 2, axis=-1) / (2 * (var_y + pvar))

    K = 1024
    sampler = TDSSampler(denoiser, twist, return_weights=True, steps=128)

    k1, k2 = jax.random.split(key)
    x1 = sampler.init(k1, (K, CHANNELS))
    x0, log_w = sampler(x1, key=k2)

    w = jax.nn.softmax(log_w)
    ess = 1.0 / jnp.sum(w**2)
    assert ess > 0.25 * K, float(ess)

    post_mean = _posterior_mean(y, var_y)
    post_var = jnp.concatenate(
        [jnp.full(OBSERVED, var_y / (1 + var_y)), jnp.ones(CHANNELS - OBSERVED)]
    )

    est_mean = jnp.einsum("k,kc->c", w, x0)
    est_var = jnp.einsum("k,kc->c", w, (x0 - est_mean) ** 2)

    assert jnp.allclose(est_mean, post_mean, atol=0.15), (est_mean, post_mean)
    assert jnp.allclose(est_var, post_var, rtol=0.5, atol=0.05), (est_var, post_var)

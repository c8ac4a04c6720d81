r"""Tests for azula_tpu.denoise (mirrors reference tests/test_denoise.py)."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.denoise import (
    GaussianDenoiser,
    GaussianPosterior,
    KarrasDenoiser,
    Posterior,
    SimpleDenoiser,
)
from azula_tpu.linalg.covariance import DPLRCovariance, KroneckerCovariance
from azula_tpu.noise import RectifiedSchedule, Schedule, VPSchedule
from azula_tpu.utils.pytree import combine, partition

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)

from dummies import Dummy


@pytest.mark.parametrize("isotropic", [False, True])
@pytest.mark.parametrize("batch", [(), (64,)])
def test_GaussianPosterior(isotropic, batch, key):
    k1, k2, k3 = jax.random.split(key, 3)
    channels = 5

    mean = jax.random.normal(k1, (*batch, channels))

    if isotropic:
        std = jax.random.uniform(k2, (*batch, 1)) + 1e-3
    else:
        std = jax.random.uniform(k2, (*batch, channels)) + 1e-3

    x = mean + std * jax.random.normal(k3, mean.shape)

    log_q = GaussianPosterior(mean, std**2).log_prob(x)

    # Closed-form normal log-density
    log_p = jax.scipy.stats.norm.logpdf(x, mean, std)

    assert log_q.shape == (*batch, channels)
    assert jnp.allclose(log_q, log_p, atol=1e-5)


@pytest.mark.parametrize("cov_kind", ["dplr", "kronecker"])
@pytest.mark.parametrize("batch", [(), (64,)])
def test_GaussianDenoiser(cov_kind, batch, key):
    k1, k2, k3 = jax.random.split(key, 3)
    channels = 5

    data = jax.random.normal(k1, (256, channels))
    mean = jnp.mean(data, axis=0)

    if cov_kind == "dplr":
        cov = DPLRCovariance.from_data(data, rank=3)
    else:
        cov = KroneckerCovariance.from_data(data, rank=0)

    denoiser = GaussianDenoiser(mean, cov, schedule=VPSchedule())

    x = jax.random.normal(k2, (*batch, channels))
    t = jax.random.uniform(k3, ())

    q = denoiser(x, t)

    assert isinstance(q, Posterior)
    assert q.mean.shape == x.shape
    assert jnp.all(jnp.isfinite(q.mean))

    # Works under jit through partition/combine
    arrays, static = partition(denoiser)

    @jax.jit
    def apply(arrays, x, t):
        return combine(arrays, static)(x, t).mean

    assert jnp.allclose(apply(arrays, x, t), q.mean, atol=1e-4)


class ReSchedule(Schedule):
    r"""Re-expresses any schedule in VE form (reference `test_denoise.py:92-98`)."""

    def __init__(self, schedule: Schedule) -> None:
        self.schedule = schedule

    def __call__(self, t):
        alpha, sigma = self.schedule(t)
        import jax.numpy as jnp

        return jnp.ones_like(alpha), sigma / alpha


@pytest.mark.parametrize("denoiser_cls", [SimpleDenoiser, KarrasDenoiser])
@pytest.mark.parametrize("schedule_cls", [VPSchedule, RectifiedSchedule])
@pytest.mark.parametrize("with_label", [False, True])
@pytest.mark.parametrize("batch", [(), (64,)])
def test_denoisers(denoiser_cls, schedule_cls, with_label, batch, key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    channels = 5

    denoiser = denoiser_cls(
        backbone=Dummy(channels, with_label, key=k1),
        schedule=schedule_cls(),
    )

    x = jax.random.normal(k2, (*batch, channels))
    t = jax.random.uniform(k3, batch)

    alpha_t, sigma_t = denoiser.schedule(t)
    alpha_t, sigma_t = alpha_t[..., None], sigma_t[..., None]

    x_t = alpha_t * x + sigma_t * jax.random.normal(k4, x.shape)

    label = "cat" if with_label else None
    kwargs = {"label": label} if with_label else {}

    q = denoiser(x_t, t, **kwargs)

    assert isinstance(q, Posterior)
    assert q.mean.shape == x.shape

    # Schedule invariance: re-wrapping the schedule as VE leaves the mean
    # unchanged — the key preconditioning property (reference
    # `test_denoise.py:135-143`).
    denoiser_ve = denoiser.tree_replace(schedule=ReSchedule(denoiser.schedule))
    q_ve = denoiser_ve(x_t / alpha_t, t, **kwargs)

    assert jnp.allclose(q.mean, q_ve.mean, atol=1e-5)

    # Loss: scalar, finite gradients for all parameters
    t_batched = jax.random.uniform(k3, batch if batch else ())
    loss = denoiser.loss(x, t_batched, key=k5, **kwargs)

    assert loss.shape == ()
    assert jnp.isfinite(loss)

    arrays, static = partition(denoiser)

    def loss_fn(arrays):
        return combine(arrays, static).loss(x, t_batched, key=k5, **kwargs)

    grads = jax.grad(loss_fn)(arrays)

    for g in jax.tree.leaves(grads):
        assert jnp.all(jnp.isfinite(g))


def test_bf16_backbone_roundtrip(key):
    r"""bf16 backbones coexist with fp32 sampling math (reference dtype
    round-trip, `denoise.py:314-320`)."""

    k1, k2 = jax.random.split(key)
    channels = 5

    denoiser = KarrasDenoiser(
        backbone=Dummy(channels, key=k1).astype(jnp.bfloat16),
        schedule=VPSchedule(),
    )

    x_t = jax.random.normal(k2, (8, channels))
    t = jnp.full((8,), 0.5)

    q = denoiser(x_t, t)

    assert q.mean.dtype == jnp.float32
    assert jnp.all(jnp.isfinite(q.mean))

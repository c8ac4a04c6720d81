r"""Tests for azula_tpu.linalg.covariance (mirrors reference
tests/test_linalg_covariance.py:31-110)."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.linalg.covariance import (
    DiagonalCovariance,
    DPLRCovariance,
    FullCovariance,
    IsotropicCovariance,
    KroneckerCovariance,
)

ESTIMATORS = [
    lambda X: IsotropicCovariance.from_data(X),
    lambda X: DiagonalCovariance.from_data(X),
    lambda X: FullCovariance.from_data(X.reshape(len(X), -1)),
    lambda X: DPLRCovariance.from_data(X, rank=2),
    lambda X: DPLRCovariance.from_data(X, rank=2, iterations=4),
    lambda X: KroneckerCovariance.from_data(X),
    lambda X: KroneckerCovariance.from_data(X, rank=2),
]


@pytest.fixture
def data(key):
    r"""Correlated data with shape (samples, 5, 3)."""

    k1, k2 = jax.random.split(key)

    W = jax.random.normal(k1, (15, 15), dtype=jnp.float64) / jnp.sqrt(15.0)
    Z = jax.random.normal(k2, (256, 15), dtype=jnp.float64)

    X = Z @ W.T + 1.0

    return X.reshape(256, 5, 3)


@pytest.mark.usefixtures("x64")
@pytest.mark.parametrize("estimator", ESTIMATORS)
def test_covariance(estimator, data, key):
    cov = estimator(data)

    x = jax.random.normal(key, data.shape[1:], dtype=jnp.float64)
    if isinstance(cov, FullCovariance):
        x = x.reshape(-1)

    # matmul closure: shapes preserved
    y = cov(x)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))

    if isinstance(cov, IsotropicCovariance):
        return  # inv round-trip below needs shapes

    # inv round-trips
    assert jnp.allclose(cov.inv(cov(x)), x, atol=1e-4)
    assert jnp.allclose(cov.inv.inv(x), cov(x), atol=1e-4)

    # color satisfies M Mᵀ = C via E[M z (M z)ᵀ] -- check quadratic form instead:
    # ||color(x)||² should equal xᵀ C x when applied to the transpose action...
    # Directly: color(color^T) is hard matrix-free; check colored-noise covariance
    # statistically is expensive. Instead check logdet consistency:
    try:
        ld = cov.logdet()
        ld_inv = cov.inv.logdet()
        assert jnp.allclose(ld, -ld_inv, atol=1e-4)
    except NotImplementedError:
        pass


@pytest.mark.usefixtures("x64")
@pytest.mark.parametrize(
    "estimator",
    [
        lambda X: DiagonalCovariance.from_data(X),
        lambda X: FullCovariance.from_data(X.reshape(len(X), -1)),
        lambda X: DPLRCovariance.from_data(X, rank=3),
    ],
)
def test_color(estimator, data, key):
    r"""`color` satisfies M Mᵀ = C: the empirical covariance of colored white
    noise matches the structured covariance's action."""

    cov = estimator(data)

    n = 65536
    shape = (
        (n, data.shape[1] * data.shape[2])
        if isinstance(cov, FullCovariance)
        else (n, *data.shape[1:])
    )
    z = jax.random.normal(key, shape, dtype=jnp.float64)
    colored = cov.color(z)

    # Empirical covariance action on a probe vector
    probe = jnp.ones(shape[1:], dtype=jnp.float64)
    emp = jnp.einsum("n...,n...->...", colored, (colored.reshape(n, -1) @ probe.ravel())[
        (slice(None),) + (None,) * (len(shape) - 1)
    ].reshape(n, *[1] * (len(shape) - 1)) * jnp.ones_like(colored)) / n

    # emp ≈ C probe
    expected = cov(probe)
    assert jnp.allclose(emp, expected, rtol=0.15, atol=0.1)


@pytest.mark.usefixtures("x64")
def test_dplr_em_improves_likelihood(data):
    r"""EM iterations monotonically increase the data log-likelihood
    (reference `test_linalg_covariance.py:85-110`)."""

    X = data.reshape(len(data), -1)
    X = X - X.mean(axis=0)

    def log_likelihood(cov):
        quad = jnp.einsum("nf,nf->", X, jax.vmap(cov.inv)(X)) / len(X)
        return -(quad + cov.logdet()) / 2

    lls = []
    for iterations in (0, 2, 4, 8):
        cov = DPLRCovariance.from_data(X, rank=2, iterations=iterations)
        lls.append(float(log_likelihood(cov)))

    assert all(b >= a - 1e-6 for a, b in zip(lls, lls[1:])), lls


@pytest.mark.usefixtures("x64")
def test_covariance_algebra(data):
    cov = DPLRCovariance.from_data(data, rank=2)

    scaled = IsotropicCovariance(2.0) * cov + IsotropicCovariance(0.5)

    x = jnp.ones(data.shape[1:], dtype=jnp.float64)

    assert jnp.allclose(scaled(x), 2.0 * cov(x) + 0.5 * x, atol=1e-6)

    # Woodbury inverse round trip through the algebra
    assert jnp.allclose(scaled.inv(scaled(x)), x, atol=1e-5)


def test_covariance_is_pytree(data):
    cov = DPLRCovariance.from_data(jnp.asarray(data, jnp.float32), rank=2)

    leaves, treedef = jax.tree.flatten(cov)
    rebuilt = jax.tree.unflatten(treedef, leaves)

    x = jnp.ones(cov.shape)
    assert jnp.allclose(cov(x), rebuilt(x))

    @jax.jit
    def apply(cov, x):
        return cov(x)

    assert jnp.allclose(apply(cov, x), cov(x))

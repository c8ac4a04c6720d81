r"""Tests for azula_tpu.linalg.solve (mirrors reference tests/test_linalg_solve.py)."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.linalg.solve import cg, gmres

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)


@pytest.mark.usefixtures("x64")
def test_cg_spd(key):
    r"""CG on an SPD system converges exactly after rank iterations."""

    k1, k2 = jax.random.split(key)

    D = 8
    M = jax.random.normal(k1, (D, D), dtype=jnp.float64)
    A_mat = M @ M.T + D * jnp.eye(D, dtype=jnp.float64)
    b = jax.random.normal(k2, (D,), dtype=jnp.float64)

    x = cg(lambda v: A_mat @ v, b, iterations=D, dtype=jnp.float64)

    assert jnp.allclose(A_mat @ x, b, atol=1e-6)


@pytest.mark.usefixtures("x64")
def test_cg_fixed_point(key):
    k1, k2 = jax.random.split(key)

    D = 8
    M = jax.random.normal(k1, (D, D), dtype=jnp.float64)
    A_mat = M @ M.T + D * jnp.eye(D, dtype=jnp.float64)
    x_star = jax.random.normal(k2, (D,), dtype=jnp.float64)
    b = A_mat @ x_star

    # x0 at the solution stays at the solution
    x = cg(lambda v: A_mat @ v, b, x0=x_star, iterations=3, dtype=jnp.float64)

    assert jnp.allclose(x, x_star, atol=1e-6)


@pytest.mark.usefixtures("x64")
def test_gmres_nonsymmetric(key):
    k1, k2 = jax.random.split(key)

    D = 8
    A_mat = jax.random.normal(k1, (D, D), dtype=jnp.float64) + D * jnp.eye(
        D, dtype=jnp.float64
    )
    b = jax.random.normal(k2, (D,), dtype=jnp.float64)

    x = gmres(lambda v: A_mat @ v, b, iterations=D, dtype=jnp.float64)

    assert jnp.allclose(A_mat @ x, b, atol=1e-5)


@pytest.mark.usefixtures("x64")
def test_gmres_batched(key):
    k1, k2 = jax.random.split(key)

    B, D = 3, 8
    A_mat = jax.random.normal(k1, (D, D), dtype=jnp.float64) + D * jnp.eye(
        D, dtype=jnp.float64
    )
    b = jax.random.normal(k2, (B, D), dtype=jnp.float64)

    x = gmres(lambda v: jnp.einsum("ij,...j->...i", A_mat, v), b, iterations=D, dtype=jnp.float64)

    assert x.shape == (B, D)
    assert jnp.allclose(jnp.einsum("ij,...j->...i", A_mat, x), b, atol=1e-5)


def test_cg_float32_jit(key):
    r"""The default float32 path compiles and is reasonably accurate."""

    k1, k2 = jax.random.split(key)

    D = 16
    M = jax.random.normal(k1, (D, D))
    A_mat = M @ M.T + D * jnp.eye(D)
    b = jax.random.normal(k2, (D,))

    solve = jax.jit(lambda b: cg(lambda v: A_mat @ v, b, iterations=2 * D))
    x = solve(b)

    assert jnp.allclose(A_mat @ x, b, atol=1e-2)

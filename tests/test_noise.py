r"""Tests for azula_tpu.noise (mirrors reference test strategy, tests/test_noise.py:12-43)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.noise import (
    CosineSchedule,
    DecaySchedule,
    ElucidatedSchedule,
    RectifiedSchedule,
    VESchedule,
    VPSchedule,
)

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)

SCHEDULES = [
    VESchedule,
    VPSchedule,
    CosineSchedule,
    RectifiedSchedule,
    DecaySchedule,
    ElucidatedSchedule,
]


@pytest.mark.parametrize("schedule_cls", SCHEDULES)
def test_schedule(schedule_cls, key):
    schedule = schedule_cls()

    t = jax.random.uniform(key, (1024,))

    alpha_t, sigma_t = schedule(t)

    # Shape and positivity
    assert alpha_t.shape == t.shape
    assert sigma_t.shape == t.shape
    assert jnp.all(alpha_t > 0)
    assert jnp.all(sigma_t > 0)

    # SNR is monotonically decreasing
    t = jnp.sort(t)
    alpha_t, sigma_t = schedule(t)
    snr = alpha_t / sigma_t

    assert jnp.all(snr[:-1] >= snr[1:] - 1e-6)

    # alpha_0 is (close to) 1
    alpha_0, sigma_0 = schedule(jnp.zeros(()))

    assert jnp.allclose(alpha_0, 1.0, atol=1e-6)


@pytest.mark.parametrize("schedule_cls", SCHEDULES)
def test_schedule_numpy(schedule_cls):
    r"""Schedules evaluate in NumPy float64 on the host (coefficient precompute path)."""

    schedule = schedule_cls()

    t = np.linspace(0.0, 1.0, 65, dtype=np.float64)
    alpha_t, sigma_t = schedule(t)

    assert isinstance(alpha_t, (np.ndarray, np.generic))
    assert alpha_t.dtype == np.float64
    assert sigma_t.dtype == np.float64

    # NumPy and JAX paths agree
    alpha_j, sigma_j = schedule(jnp.asarray(t, dtype=jnp.float32))

    assert np.allclose(alpha_t, np.asarray(alpha_j), atol=1e-6)
    assert np.allclose(sigma_t, np.asarray(sigma_j), atol=1e-4)


@pytest.mark.parametrize("schedule_cls", SCHEDULES)
def test_schedule_is_pytree(schedule_cls):
    r"""Schedules are pytrees whose parameters are static (Python floats)."""

    schedule = schedule_cls()

    leaves = jax.tree.leaves(schedule)
    assert all(isinstance(leaf, float) for leaf in leaves)

    # Round-trips through flatten/unflatten
    leaves, treedef = jax.tree.flatten(schedule)
    rebuilt = jax.tree.unflatten(treedef, leaves)

    t = jnp.linspace(0.1, 0.9, 7)
    assert jnp.allclose(schedule(t)[1], rebuilt(t)[1])


def test_schedule_jit():
    schedule = VPSchedule()

    @jax.jit
    def f(t):
        return schedule(t)

    alpha, sigma = f(jnp.asarray(0.5))
    a2, s2 = schedule(jnp.asarray(0.5))

    assert jnp.allclose(alpha, a2)
    assert jnp.allclose(sigma, s2)

r"""Test configuration.

Forces the CPU backend with 8 virtual devices so multi-device sharding tests run
without TPU hardware (rebuild of the reference's device-parametrized conftest,
`tests/conftest.py:10-50`, adapted to JAX).

Note: `jax` may already be imported by site customization, so the platform is
forced through `jax.config` (effective until backend initialization) rather
than environment variables.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# AZULA_ON_DEVICE=1 runs the suite on the real accelerator (e.g. for
# tests/test_ops_tpu.py); the default is the 8-virtual-device CPU backend.
if not os.environ.get("AZULA_ON_DEVICE"):
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def x64():
    r"""Enables float64 within a test (for numerically sensitive linalg checks,
    mirroring the reference's float64 fixtures, `tests/test_linalg_solve.py:12-19`)."""

    with jax.enable_x64(True):
        yield


@pytest.fixture
def key():
    return jax.random.key(0)

"""Test harness setup (SURVEY.md §4.2 #5).

Tests run on the CPU backend with 8 fake devices so mesh/sharding tests
(F-19/F-24) run without a TPU pod. NOTE: in this environment the
JAX_PLATFORMS env var is ignored by the axon PJRT plugin; the backend must be
forced via jax.config before first use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(42)

"""Test configuration: force CPU backend with 8 virtual devices so
multi-device sharding tests run anywhere (SURVEY §4: CPU-simulated
multi-device tests).

Note: this environment's 'axon' TPU plugin prepends itself to jax_platforms,
overriding the JAX_PLATFORMS env var — ``jax.config.update`` wins instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)

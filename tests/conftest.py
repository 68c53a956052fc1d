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

# persistent XLA compilation cache: identical-shape jits across test runs (and
# across test files re-creating the same tiny models) skip compilation
_cache_dir = os.path.join(os.path.dirname(__file__), ".jit_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
# NOTE (measured, round 2): jax_disable_most_optimizations compiles 3x faster
# (hrnet build 10.0s -> 3.2s) but executes 5-10x slower — the cold full suite
# went 338s -> 489s because the training tests are runtime-dominated. Keep
# optimizations ON; the persistent cache above is the compile-time lever.

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)

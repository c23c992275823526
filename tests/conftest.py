"""Test harness config: run the suite hermetically on CPU with a virtual
8-device mesh so sharding paths are exercised without TPU hardware
(SURVEY.md §4 multi-host-without-a-cluster recipe)."""

import os

# Must be set before jax initializes backends. The container's axon
# sitecustomize force-sets jax_platforms="axon,cpu" at interpreter start,
# so the env var alone is not enough — override via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip XLA compilation
os.makedirs("/root/.cache/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

import os

# Tests run on a virtual 8-device CPU mesh; the real chip is only used by
# bench.py. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/monitpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# The axon TPU plugin ignores JAX_PLATFORMS; pin test computations to the
# virtual 8-device CPU backend explicitly (bench.py uses the real chip).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

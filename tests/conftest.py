"""Test harness config: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware, and keep everything deterministic."""

import os

# Must happen before jax import anywhere in the test process. Overwrite, not
# setdefault: the CI environment pins JAX_PLATFORMS to the TPU plugin, and the
# test suite must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The CI image's sitecustomize pre-registers the TPU PJRT plugin at
# interpreter startup, so the env var alone can be read too late; the config
# update below forces backend resolution to CPU as long as no backend has been
# instantiated yet (true at conftest import time).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the single-core CPU in CI compiles the full
# U-Net slowly; cache makes reruns fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference_data = pytest.mark.skipif(
    not reference_available(),
    reason="reference dataset not mounted at /root/reference",
)


@pytest.fixture
def rng_np():
    return np.random.RandomState(0)

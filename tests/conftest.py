"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding code paths can be exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU with 8 virtual devices.  NOTE: the ambient TPU plugin ignores
# the JAX_PLATFORMS env var (a sitecustomize pins it), so the platform
# must be forced through jax.config.  Set PCH_TEST_TPU=1 to run the suite
# against the real chip instead.
if not os.environ.get("PCH_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles are slow on a 1-core box;
# cache compiled executables across pytest runs.  The directory is keyed
# by a HOST fingerprint (utils/cache.py) — XLA:CPU AOT entries are
# machine-specific, and a cache that travels with the repo to another
# machine produces loader errors + full recompiles otherwise.
from pointcloudhookup_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def corridor(rng):
    """Small synthetic corridor sized for the 1-core CPU test backend
    (~6.2k points; pairs with capacity 8192 in the extraction tests)."""
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor

    return synthetic_corridor(
        rng, n_ground=4000, n_veg=800, pts_per_tower=400, extent=250.0
    )

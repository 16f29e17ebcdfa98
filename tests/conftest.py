"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding tests run on this virtual mesh
(xla_force_host_platform_device_count), per the project testing strategy —
real-TPU paths are exercised by bench.py / the driver instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax already (forcing the
# axon TPU platform); override via config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/BHRayTracer"


@pytest.fixture
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture
def rng():
    return np.random.default_rng(1234)

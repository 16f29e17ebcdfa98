"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding tests run on this virtual mesh
(xla_force_host_platform_device_count), per the project testing strategy —
real-TPU paths are exercised by bench.py / the driver instead.
"""

import os
import resource

# XLA:CPU's compiler recurses deeply on this project's big fused programs;
# with the default 8MB stack the 25th-ish compile of a suite run overflows
# and segfaults the process. The hard limit is unlimited here, so grow the
# main thread's stack (Linux main-thread stacks extend up to the soft rlimit).
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or _hard >= 1 << 30:
    resource.setrlimit(resource.RLIMIT_STACK, (1 << 30, _hard))

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


@pytest.fixture(scope="session")
def gen_assets_root():
    """REPO/assets populated by tools/gen_assets.py, exactly once across
    xdist workers (flock on a lockfile — each worker is its own process, so
    unguarded sentinel checks could race two generators whose interleaved
    writes a third test might read half-finished)."""
    import fcntl
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(repo, "assets")
    sentinel = os.path.join(root, "Resource", "Data", "teapot.obj")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".genlock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if not os.path.exists(sentinel):
            subprocess.run(
                [sys.executable, os.path.join(repo, "tools", "gen_assets.py"),
                 root],
                check=True, capture_output=True)
    return root

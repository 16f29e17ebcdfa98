"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding tests run on this virtual mesh
(xla_force_host_platform_device_count), per the project testing strategy —
real-TPU paths are exercised by bench.py / the driver instead.
"""

import glob
import os
import resource
import subprocess
import sys

# XLA:CPU's compiler recurses deeply on this project's big fused programs;
# grow the main thread's stack (Linux main-thread stacks extend up to the
# soft rlimit). NOTE: this alone does NOT fix the suite-crash below.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _hard == resource.RLIM_INFINITY or _hard >= 1 << 30:
    resource.setrlimit(resource.RLIMIT_STACK, (1 << 30, _hard))

# ---------------------------------------------------------------------------
# Whole-suite runs are split into fresh-process groups (pytest_cmdline_main
# below). Root cause, established from a raw core dump (round 4): after many
# large XLA:CPU compiles accumulate JIT'd executables in one process, a C++
# exception unwind crashes inside libgcc's encoded-pointer reader while
# searching the registered-EH-frame list (SEGV_MAPERR, RIP in libgcc_s
# read_encoded_value_with_base, RBP = unmapped fault address) — i.e. stale /
# corrupt __register_frame state from the ORC JIT, not a Python or repo bug.
# It is nondeterministic (observed at test ~26 and ~49 serially, ~53 in an
# xdist worker) and NOT fixed by a 1GB stack rlimit set before exec. Every
# module passes in a fresh process, so the robust fix is to bound compiles
# per process: group the modules and run each group in its own pytest
# subprocess (each group still uses the -n 4 loadscope workers from
# pytest.ini). The persistent compilation cache cannot help here: with the
# axon TPU plugin present, enabling it on CPU-forced runs deadlocks compiles
# (utils/cache.py).
# ---------------------------------------------------------------------------
_GROUP_SENTINEL = "BHRT_PYTEST_GROUPED"
_MODULES_PER_GROUP = 6


def pytest_cmdline_main(config):
    if os.environ.get(_GROUP_SENTINEL):
        return None  # already inside a group subprocess
    args = list(config.invocation_params.args)
    # config.args holds the PARSED positional targets — naive "doesn't start
    # with '-'" classification mistook value-taking flags' values ('-k expr',
    # '--maxfail 3') for target paths, silently skipping the fresh-process
    # grouping (and would forward the flag without its value). Node ids
    # ('file.py::test[param]') count as targets via their file part.
    paths = [a for a in config.args if os.path.exists(a.split("::")[0])]
    norm = {os.path.normpath(os.path.abspath(p)) for p in paths}
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    if norm and norm != {tests_dir}:
        return None  # targeted invocation: run in-process as usual
    path_set = set(paths)
    flags = [a for a in args if a not in path_set]
    modules = sorted(glob.glob(os.path.join(tests_dir, "test_*.py")))
    if not modules:
        return None
    # The reverse-mode FD modules compile the biggest XLA:CPU programs by
    # far; isolating them keeps their group's accumulated-compile footprint
    # below the EH-frame-corruption threshold (observed worker crashes in
    # the shared gradients group at ~29 tests/21 min).
    heavy = [m for m in modules
             if os.path.basename(m) in ("test_gradients.py",
                                        "test_gradients_mesh.py")]
    modules = [m for m in modules if m not in heavy]
    n_groups = -(-len(modules) // _MODULES_PER_GROUP)
    groups = [modules[i::n_groups] for i in range(n_groups)]
    groups += [[m] for m in heavy]
    env = dict(os.environ, **{_GROUP_SENTINEL: "1"})
    stop_early = config.getoption("exitfirst", False)
    worst = 0
    for i, group in enumerate(groups):
        sys.stderr.write(
            f"[conftest] suite group {i + 1}/{n_groups} "
            f"({len(group)} modules, fresh process)\n")
        sys.stderr.flush()
        r = subprocess.run([sys.executable, "-m", "pytest", *flags, *group],
                           env=env)
        if r.returncode and not worst:
            worst = r.returncode
        if worst and stop_early:
            break
    return worst

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

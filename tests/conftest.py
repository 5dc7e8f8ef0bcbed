"""Test configuration: CPU backend with an 8-device virtual mesh + f64.

Mirrors the reference test strategy (SURVEY.md §4): deterministic math unit
tests run in double precision; multi-device sharding is validated on a virtual
CPU mesh (no TPU hardware needed for correctness tests).
"""

import os
import sys

# XLA_FLAGS must be set before the CPU backend initializes (lazily, on first
# use) — conftest import is early enough even though sitecustomize may have
# already imported jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote-TPU ("axon") platform and
# sets JAX_PLATFORMS=axon at interpreter startup; override via jax.config,
# which wins over the env var. Tests run on CPU in f64.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compilation cache for the suite. Two distinct failure
# modes killed full-suite runs with it enabled: (a) XLA:CPU AOT entries
# written by a different host's CPU segfault on load (feature mismatch);
# (b) with a fresh machine-scoped cache, serializing executables for the
# cache write segfaults/aborts deterministically late in the suite
# (jax compilation_cache.put_executable_and_time) — reproduced 4/4 full
# runs at the same test, never when the module runs alone. Compile speed
# is not worth a crashing suite; bench scripts keep their (machine-scoped)
# caches, see okvis_tpu/utils/cachedir.py.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables at every module boundary.

    XLA:CPU segfaults natively while compiling once a long-lived process
    has accumulated hundreds of live compiled executables (see the
    collection hook below; the crash site wanders — optimize_window-class
    programs, then a trivial quat_normalize jit ~215 tests in — while any
    module alone passes every time). Dropping executables between modules
    keeps the live count bounded at the cost of cross-module recompiles.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    return devs


def pytest_collection_modifyitems(session, config, items):
    """Run test_solver FIRST (stable sort; everything else keeps order).

    XLA:CPU segfaults NATIVELY while COMPILING optimize_window-class
    programs late in a long-lived process (hundreds of compiled
    executables in): 6 consecutive full-suite runs died inside
    jax backend_compile / executable-serialize at whichever test_solver
    compile landed ~210 tests in, with or without the persistent cache,
    while the same module passes every time alone or early. Compiling
    the heavy solver programs first reproduces the passing conditions.
    """
    items.sort(key=lambda it: 0 if "test_solver" in str(it.fspath) else 1)

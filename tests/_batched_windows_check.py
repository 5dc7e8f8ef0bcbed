"""Subprocess body for test_batched_windows_match_individual.

Run as `python tests/_batched_windows_check.py`. Exits 0 iff
optimize_windows_batched equals per-window optimize_window on 3 perturbed
copies of the synthetic world. Runs in its OWN process because XLA:CPU
crashes natively (SIGSEGV/SIGABRT, in compile or executable-serialize)
when this particular compile happens late in the full pytest process —
5/5 full-suite runs died here while the same module alone passes every
time. A fresh process reproduces the passing conditions.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np

from helpers import build_synthetic_problem
from test_solver import perturb_problem

from okvis_tpu.solver import optimize_window, optimize_windows_batched


def main() -> int:
    world = build_synthetic_problem()
    cfg, imu_params, intrinsics, problem, truth = world
    rng = np.random.default_rng(1234)
    probs = [perturb_problem(problem, truth, rng) for _ in range(3)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *probs)
    states_b, diag_b = optimize_windows_batched(cfg, imu_params, intrinsics, batched)
    for i, p in enumerate(probs):
        s_i, d_i = optimize_window(cfg, imu_params, intrinsics, p)
        np.testing.assert_allclose(
            np.asarray(states_b.r_WS[i]), np.asarray(s_i.r_WS), rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(diag_b.final_cost[i]), np.asarray(d_i.final_cost), rtol=1e-9
        )
    print("BATCHED_MATCHES_INDIVIDUAL_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

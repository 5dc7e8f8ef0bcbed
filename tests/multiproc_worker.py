"""Worker for the REAL multi-process distributed-BA test.

Each OS process owns 4 virtual CPU devices and joins a 2-process JAX
distributed service (jax.distributed.initialize) — the same code path a
multi-host TPU pod uses over DCN, executed here over loopback. The
("host", "map") mesh spans both processes: the "map" axis is process-local
(ICI analog), the "host" axis crosses processes (DCN analog), so the
hierarchical psum in parallel.sharded_ba really reduces across process
boundaries (SURVEY.md §2.14 multi-host requirement; VERDICT r1 next-#4).

Run via tests/test_multiprocess.py, or manually:
    python tests/multiproc_worker.py <proc_id> <n_proc> <port>
Prints "MULTIPROC_OK cost=<c> step_ms=<t>" on success (process 0).
"""

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, len(jax.devices())

    import functools
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from okvis_tpu.datasets.synthetic import build_ba_problem
    from okvis_tpu.parallel import (
        make_mesh2d,
        make_sharded_optimizer,
        problem_specs,
        shard_problem,
    )
    from okvis_tpu.solver import optimize_window

    n_shards = 4 * n_proc
    cfg, imu_params, intrinsics, problem, _truth = build_ba_problem(
        num_frames=6,
        frame_stride=20,
        n_landmarks=48,
        duration=1.5,
        cfg_kwargs=dict(
            max_landmarks=64,
            max_observations=256,
            max_iterations=4,
            imu_samples=24,
            max_imu_links=5,
        ),
    )

    # ---- single-process reference solve on one local device ----
    with jax.default_device(jax.local_devices()[0]):
        ref_states, ref_diag = jax.jit(
            functools.partial(optimize_window, cfg, imu_params, intrinsics)
        )(problem)
        ref_cost = float(ref_diag.final_cost)
        ref_r = np.asarray(ref_states.r_WS)

    # ---- cross-process sharded solve ----
    mesh = make_mesh2d(n_proc, 4)
    axis = ("host", "map")
    opt = make_sharded_optimizer(cfg, imu_params, intrinsics, mesh, axis=axis)
    local = shard_problem(problem, n_shards)
    specs = problem_specs(cfg, axis)

    def to_global(x, spec):
        if x is None:
            return None
        arr = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    gproblem = jax.tree_util.tree_map(to_global, local, specs)
    states, (cost, hist, acc, lam) = opt(gproblem)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    n_rep = 5
    for _ in range(n_rep):
        states, (cost, hist, acc, lam) = opt(gproblem)
    jax.block_until_ready(states)
    step_ms = (time.perf_counter() - t0) / n_rep * 1e3

    # replicated outputs: read this process's copy
    cost_v = float(np.asarray(cost.addressable_data(0)))
    r_WS = np.asarray(states.r_WS.addressable_data(0))

    assert abs(cost_v - ref_cost) <= 1e-8 * max(1.0, abs(ref_cost)), (
        f"sharded cost {cost_v} != single-device {ref_cost}"
    )
    np.testing.assert_allclose(r_WS, ref_r, rtol=0, atol=1e-8)

    if proc_id == 0:
        print(f"MULTIPROC_OK cost={cost_v:.9f} step_ms={step_ms:.1f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

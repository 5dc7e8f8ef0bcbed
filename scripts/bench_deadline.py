"""Wall-clock optimization budget contract: measured latency distribution.

The reference aborts Ceres mid-solve at `timeLimit` once >= minIterations ran
(/root/reference/okvis_ceres/include/okvis/ceres/CeresIterationCallback.hpp:44-80,
armed per frame at ThreadedKFVio.cpp:526-531 with the config's 0.035 s).
The XLA mapping (okvis_tpu.solver.optimize_window trust0 + the estimator's
chunked deadline loop): run the min-iteration program, then top up with
1-iteration continuation chunks while the measured elapsed time plus the
EMA chunk cost fits the budget. Worst-case overrun = one 1-iteration chunk.

This bench runs the contract N times on the EuRoC-sized window and reports
p50/p99 wall latency, iterations achieved, and the amortized device time of
the chunk programs (the dispatch-free cost a direct-attached chip pays).

Usage: python scripts/bench_deadline.py [n_trials] [time_limit_s]
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from okvis_tpu.utils import cachedir as _cachedir
_cachedir.configure(jax, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_default_matmul_precision", "high")


def main(n_trials: int = 100, time_limit: float = 0.035):
    from okvis_tpu.datasets.synthetic import build_ba_problem
    from okvis_tpu.solver import optimize_window

    min_iters, max_iters = 3, 10  # reference EuRoC config (yaml:60-62)

    cfg, imu_params, intrinsics, problem, _ = build_ba_problem(
        num_frames=8,
        frame_stride=20,
        n_landmarks=400,
        duration=2.0,
        cfg_kwargs=dict(
            max_landmarks=512, max_observations=2048,
            max_iterations=min_iters, imu_samples=24, max_imu_links=7,
        ),
    )
    problem = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, problem
    )
    intrinsics = [i.astype(jnp.float32) for i in intrinsics]
    imu_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        imu_params,
    )

    opt_min = jax.jit(functools.partial(optimize_window, cfg, imu_params, intrinsics))
    cfg1 = dataclasses.replace(cfg, max_iterations=1)
    opt_1 = jax.jit(functools.partial(optimize_window, cfg1, imu_params, intrinsics))

    # compile + warm
    s, d = opt_min(problem)
    s1, d1 = opt_1(problem._replace(states=s), d.final_lambda)
    jax.block_until_ready(s1)

    # amortized device time of each program (dispatch overlapped)
    def amortized(fn, *args, n=50):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / n

    dev_min = amortized(opt_min, problem)
    dev_1 = amortized(opt_1, problem._replace(states=s), d.final_lambda)

    lat, iters_hist, overruns = [], [], 0
    for _ in range(n_trials):
        t0 = time.perf_counter()
        states, diag = opt_min(problem)
        jax.block_until_ready(diag.final_cost)
        iters = min_iters
        chunk_cost = None
        while iters < max_iters:
            elapsed = time.perf_counter() - t0
            # first prediction: one blocking round trip upper-bounds a 1-iter
            # chunk (conservative; matches estimator._optimize_deadline)
            predicted = chunk_cost if chunk_cost is not None else elapsed
            if elapsed + predicted > time_limit:
                break
            tc = time.perf_counter()
            states, diag = opt_1(problem._replace(states=states), diag.final_lambda)
            jax.block_until_ready(diag.final_cost)
            dt = time.perf_counter() - tc
            chunk_cost = dt if chunk_cost is None else 0.5 * chunk_cost + 0.5 * dt
            iters += 1
        total = time.perf_counter() - t0
        lat.append(total)
        iters_hist.append(iters)
        overruns += total > time_limit

    lat = np.asarray(lat)
    print(
        f"deadline contract ({n_trials} trials, budget {1e3 * time_limit:.0f} ms, "
        f"iters {min_iters}..{max_iters}):\n"
        f"  wall latency   p50 {1e3 * np.percentile(lat, 50):.1f} ms  "
        f"p99 {1e3 * np.percentile(lat, 99):.1f} ms  "
        f"max {1e3 * lat.max():.1f} ms\n"
        f"  iterations     mean {np.mean(iters_hist):.1f}  "
        f"min {min(iters_hist)}  max {max(iters_hist)}\n"
        f"  over budget    {overruns}/{n_trials}\n"
        f"  device time    min-program {1e3 * dev_min:.2f} ms, "
        f"1-iter chunk {1e3 * dev_1:.2f} ms (amortized; the per-trial gap "
        f"to wall latency is per-dispatch host<->device latency)\n"
        f"  direct-attached projection: {min_iters} + "
        f"floor(({1e3 * time_limit:.0f} - {1e3 * dev_min:.2f}) / {1e3 * dev_1:.2f})"
        f" iterations within budget"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    tl = float(sys.argv[2]) if len(sys.argv) > 2 else 0.035
    main(n, tl)

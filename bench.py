"""Benchmark: sliding-window BA throughput on the current device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The headline metric this round is backend frames/s: complete optimize()
steps (LM + Schur over a full EuRoC-sized window: 8 states, 2 cameras,
512 landmark slots, 2048 observation slots, 3 LM iterations — the
min-iteration operating point of the reference config
/root/reference/config/config_fpga_p2_euroc.yaml:60-62) per second on one
chip. vs_baseline compares against the reference's 20 frames/s real-time
CPU operating point (BASELINE.md).
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the (remote) compile
from okvis_tpu.utils import cachedir as _cachedir
_cachedir.configure(jax, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
# 'high' (3-pass bf16 ~ f32 quality) matmuls: the TPU default single-pass
# bf16 destroys BA conditioning (12x worse ATE); 'high' matches 'highest'
# ATE on the full-pipeline study at +29% throughput
jax.config.update("jax_default_matmul_precision", "high")


def main():
    from okvis_tpu.datasets.synthetic import build_ba_problem
    from okvis_tpu.solver import optimize_window

    dtype_bits = 32  # TPU operating point
    cfg, imu_params, intrinsics, problem, truth = build_ba_problem(
        num_frames=8,
        frame_stride=20,
        n_landmarks=400,
        duration=2.0,
        cfg_kwargs=dict(
            max_landmarks=512,
            max_observations=2048,
            max_iterations=3,
            imu_samples=24,
            max_imu_links=7,
        ),
    )
    # cast to f32 for the device benchmark
    problem = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, problem
    )
    intrinsics = [i.astype(jnp.float32) for i in intrinsics]
    imu_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64
        else x,
        imu_params,
    )

    opt = jax.jit(functools.partial(optimize_window, cfg, imu_params, intrinsics))

    # compile + warmup
    states, diag = opt(problem)
    jax.block_until_ready(states)

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        states, diag = opt(problem)
    jax.block_until_ready(states)
    dt = (time.perf_counter() - t0) / n_iter

    frames_per_s = 1.0 / dt
    baseline = 20.0  # reference real-time operating point on CPU
    print(
        json.dumps(
            {
                "metric": "ba_window_optimize_steps_per_s",
                "value": round(frames_per_s, 2),
                "unit": "optimize steps/s/chip",
                "vs_baseline": round(frames_per_s / baseline, 3),
            }
        )
    )


def main_with_pipeline():
    """Emit BOTH metrics: the full-pipeline frames/s (real vision path,
    scripts/bench_pipeline) first, then the BA solver-step throughput as the
    final headline line (the driver parses the last JSON line).

    Set OKVIS_BENCH_SKIP_PIPELINE=1 to run only the BA bench."""
    if os.environ.get("OKVIS_BENCH_SKIP_PIPELINE", "") != "1":
        try:
            import sys

            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
            )
            from bench_pipeline import run_pipeline_bench

            run_pipeline_bench(n_frames=35)
        except Exception as e:  # the headline BA metric must still print
            print(f"pipeline bench failed: {e!r}")
    main()


if __name__ == "__main__":
    main_with_pipeline()

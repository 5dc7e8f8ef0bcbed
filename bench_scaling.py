"""Distributed-BA scaling harness: sharded optimize step time vs device count.

Reports the BASELINE.json scaling-efficiency metric at whatever device counts
the current platform exposes (real multi-chip mesh when available; the
8-device virtual CPU mesh otherwise — numbers on virtual devices measure
correctness of the harness, not hardware scaling).

Prints one JSON line: {"metric": "sharded_ba_scaling", "points": [...]}.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp


def measure(n_devices: int, n_iter: int = 20) -> float:
    from okvis_tpu.datasets.synthetic import build_ba_problem
    from okvis_tpu.parallel import make_mesh, make_sharded_optimizer, shard_problem

    L, O = 512, 2048  # divisible by 1/2/4/8 — same problem at every count
    cfg, imu_params, intrinsics, problem, _ = build_ba_problem(
        num_frames=8,
        frame_stride=20,
        n_landmarks=400,
        duration=2.0,
        cfg_kwargs=dict(
            max_landmarks=L,
            max_observations=O,
            max_iterations=3,
            imu_samples=24,
            max_imu_links=7,
        ),
    )
    mesh = make_mesh(n_devices)
    opt = make_sharded_optimizer(cfg, imu_params, intrinsics, mesh)
    sharded = shard_problem(problem, n_devices)
    out, _ = opt(sharded)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, _ = opt(sharded)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    points = []
    t1 = None
    for n in counts:
        dt = measure(n)
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * 1)  # same-size problem => strong-scaling efficiency = t1/tn
        points.append(
            {
                "devices": n,
                "step_ms": round(dt * 1e3, 3),
                "speedup": round(t1 / dt, 3),
                "efficiency_vs_1dev": round(t1 / dt / 1.0, 3),
            }
        )
    print(
        json.dumps(
            {
                "metric": "sharded_ba_scaling",
                "platform": jax.devices()[0].platform,
                "points": points,
            }
        )
    )


if __name__ == "__main__":
    main()

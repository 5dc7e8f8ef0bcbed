"""Micro-profile the BA optimize step's stages on the current device.

Each stage runs inside a 50-deep lax.scan so the tunnel dispatch cost is
amortized; reported numbers are per-iteration device time.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

DEPTH = int(os.environ.get("PROFILE_DEPTH", "500"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / DEPTH
    print(f"{name:40s} {dt*1e6:10.1f} us/iter")
    return dt


def main():
    from okvis_tpu.datasets.synthetic import build_ba_problem
    from okvis_tpu.solver import optimize_window
    from okvis_tpu.solver.assemble import (
        evaluate,
        evaluate_dense_factors,
        evaluate_reprojection,
    )
    from okvis_tpu.solver.optimize import _spd_solve_newton, solve_normal_eqs

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
    print("device:", jax.devices()[0])
    states = problem.states

    @jax.jit
    def full_opt(problem):
        def body(c, _):
            s, _d = optimize_window(cfg, imu_params, intrinsics, problem)
            return c + s.r_WS.sum(), None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    # NOTE: full_opt runs max_iterations(3) solver iterations per scan step.
    @jax.jit
    def eval_all(problem, states):
        def body(c, _):
            eqs = evaluate(cfg, imu_params, intrinsics, problem, states)
            return c + eqs.cost, None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    @jax.jit
    def eval_rep(problem, states):
        def body(c, _):
            H, b, Hll, bl, W, cost = evaluate_reprojection(
                cfg, intrinsics, problem.obs, states
            )
            return c + cost + H[0, 0], None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    @jax.jit
    def eval_dense(problem, states):
        def body(c, _):
            H, b, cost = evaluate_dense_factors(cfg, imu_params, problem, states)
            return c + cost + H[0, 0], None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    eqs = evaluate(cfg, imu_params, intrinsics, problem, states)
    eqs = jax.tree_util.tree_map(jnp.asarray, eqs)

    @jax.jit
    def solve_only(eqs, problem):
        lam = jnp.asarray(1e-4, eqs.H_dd.dtype)

        def body(c, _):
            dd, dl = solve_normal_eqs(
                cfg, eqs, problem.state_mask, problem.lm_mask, lam, problem.sb_mask
            )
            return c + dd.sum() + dl.sum(), None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    D = cfg.dense_dim
    Hs = eqs.H_dd + 10.0 * jnp.eye(D, dtype=eqs.H_dd.dtype)
    s = jnp.sqrt(jnp.clip(jnp.diagonal(Hs), 1e-12, None))
    Hs = Hs / (s[:, None] * s[None, :])
    rhs = eqs.b_d / s

    @jax.jit
    def ns_only(Hs, rhs):
        def body(c, _):
            return c + _spd_solve_newton(Hs, rhs).sum(), None

        return jax.lax.scan(body, 0.0, None, length=DEPTH)[0]

    timed("full optimize (3 LM iters)", full_opt, problem)
    timed("evaluate (all factors)", eval_all, problem, states)
    timed("evaluate_reprojection", eval_rep, problem, states)
    timed("evaluate_dense_factors", eval_dense, problem, states)
    timed("solve_normal_eqs (Schur+NS)", solve_only, eqs, problem)
    timed("Newton-Schulz dense solve", ns_only, Hs, rhs)


if __name__ == "__main__":
    main()

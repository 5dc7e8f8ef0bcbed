"""Does optimize() device time scale with PADDED capacity at fixed active size?

Motivation: the production solver compiles one program at full capacity
(L=512 landmark slots, O=2048 observation slots) while steady-state EuRoC
occupancy is far lower (~150-300 landmarks, ~400-900 observations). If the
memory-bound assembly cost is proportional to padded capacity, a tiered
solver (pick the smallest precompiled capacity that fits the active
problem) is a direct frames/s multiplier on the per-chip ceiling.

Method: build ONE synthetic world whose active counts fit the smallest
tier, then materialize the identical active problem at several padded
capacities and time optimize() per tier, scan-amortized (on-device lax.scan
of 64 repeats; immune to dispatch latency).
"""
import functools, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import numpy as np
from okvis_tpu.utils import cachedir as _cachedir
_cachedir.configure(jax, "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "high")

from okvis_tpu.datasets.synthetic import build_ba_problem
from okvis_tpu.solver import optimize_window

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
print("device:", dev, flush=True)


def scan_ms(fn, problem, depth=64):
    def run(p):
        def body(c, _):
            import jax.tree_util as jtu
            p2 = jtu.tree_map(
                lambda x: x + c.astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact) and x.ndim > 0
                else x,
                p,
            )
            s, d = fn(p2)
            acc = sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(s)
                if hasattr(o, "dtype")
            )
            return (acc * 1e-30).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=depth)[0]

    j = jax.jit(run)
    r = j(problem); jax.block_until_ready(r)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = j(problem)
    jax.block_until_ready(r)
    return 1e3 * (time.perf_counter() - t0) / reps / depth


# Active size ~ steady-state EuRoC pipeline occupancy.
TIERS = [(512, 2048), (256, 1024), (128, 512)]
base_kw = dict(num_frames=8, frame_stride=20, n_landmarks=100, duration=2.0)

results = {}
for L, O in TIERS:
    with jax.default_device(cpu):
        cfg, imu_params, intrinsics, problem, truth = build_ba_problem(
            **base_kw,
            cfg_kwargs=dict(max_landmarks=L, max_observations=O,
                            max_iterations=3, imu_samples=24, max_imu_links=7),
        )
    f32 = lambda x: x.astype(jnp.float32) if hasattr(x, 'dtype') and x.dtype == jnp.float64 else x
    problem = jax.device_put(jax.tree_util.tree_map(f32, problem), dev)
    intr = [jax.device_put(i.astype(jnp.float32), dev) for i in intrinsics]
    ip = jax.tree_util.tree_map(f32, imu_params)
    opt = jax.jit(functools.partial(optimize_window, cfg, ip, intr))
    s, d = opt(problem); jax.block_until_ready(s)
    ms = scan_ms(opt, problem)
    n_obs = int(np.asarray(problem.obs.mask).sum())
    results[(L, O)] = ms
    print(f"L={L:4d} O={O:5d} (active obs={n_obs}): {ms:7.3f} ms/optimize "
          f"cost={float(d.final_cost):.2f}", flush=True)

full = results[TIERS[0]]
for (L, O), ms in results.items():
    print(f"  tier ({L},{O}): {full/ms:.2f}x vs full capacity")

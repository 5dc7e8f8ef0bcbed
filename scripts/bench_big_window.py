import functools, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from okvis_tpu.utils import cachedir as _cachedir
_cachedir.configure(jax, "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "high")

from okvis_tpu.datasets.synthetic import build_ba_problem
from okvis_tpu.solver import optimize_window

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print("tpu:", tpu, flush=True)

for tag, kw in [
    ("euroc-window (S=8, L=512, O=2048, D=132)", dict(num_frames=8, frame_stride=20, n_landmarks=400, duration=2.0,
        cfg_kwargs=dict(max_landmarks=512, max_observations=2048, max_iterations=3, imu_samples=24, max_imu_links=7))),
    ("big-window  (S=32, L=2048, O=16384, D=492)", dict(num_frames=32, frame_stride=20, n_landmarks=1200, duration=4.5,
        cfg_kwargs=dict(max_landmarks=2048, max_observations=16384, max_iterations=3, imu_samples=24, max_imu_links=31))),
]:
    print("building", tag, flush=True)
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        cfg, imu_params, intrinsics, problem, truth = build_ba_problem(**kw)
    print(f"  built in {time.perf_counter()-t0:.0f}s, obs={int(problem.obs.mask.sum())}", flush=True)
    f32 = lambda x: x.astype(jnp.float32) if hasattr(x, 'dtype') and x.dtype == jnp.float64 else x
    problem = jax.device_put(jax.tree_util.tree_map(f32, problem), tpu)
    intrinsics = [jax.device_put(i.astype(jnp.float32), tpu) for i in intrinsics]
    imu_params = jax.tree_util.tree_map(f32, imu_params)
    opt = jax.jit(functools.partial(optimize_window, cfg, imu_params, intrinsics))
    t0 = time.perf_counter()
    s, d = opt(problem); jax.block_until_ready(s)
    print(f"  compiled+first in {time.perf_counter()-t0:.0f}s", flush=True)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        s, d = opt(problem)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:8.2f} ms/optimize, cost {float(d.final_cost):.1f}", flush=True)

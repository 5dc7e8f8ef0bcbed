"""Full-pipeline frames/s + ATE on the current device (real vision path).

Measures the complete per-frame hot path — detection, description, fused
association launch, RANSAC, stereo, addStates, optimize, marginalization —
through ThreadedVio in blocking mode on a rendered synthetic world
(the BENCH_NOTES "35 frames, dot-world" study, reproducible form).

Images are pre-rendered on the host CPU backend so rendering time does not
pollute the measurement. Run with JAX_PLATFORMS left to the environment
default (TPU when available).

Usage: python scripts/bench_pipeline.py [n_frames] [--config PATH]
"""

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

NS = 1_000_000_000


DEFAULT_CONFIG = "/root/reference/config/config_fpga_p2_euroc.yaml"


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("n_frames", nargs="?", type=int, default=35)
    ap.add_argument(
        "--config", default=DEFAULT_CONFIG,
        help="OKVIS-format YAML config (default: the reference EuRoC config)",
    )
    args = ap.parse_args()
    run_pipeline_bench(args.n_frames, args.config)


def run_pipeline_bench(
    n_frames: int = 35,
    config: str = DEFAULT_CONFIG,
    max_keypoints: int = 200,
    n_world_landmarks: int = 260,
):
    """Run the full-pipeline bench; prints the summary lines and returns the
    result dict (also printed as a JSON line)."""
    if not os.path.exists(config):
        sys.exit(
            f"config not found: {config} — pass --config pointing at an "
            "OKVIS EuRoC-style YAML"
        )

    from okvis_tpu import kinematics as kin
    from okvis_tpu.cameras import NCameraSystem
    from okvis_tpu.config import read_config
    from okvis_tpu.datasets.synthetic import (
        euroc_stereo_rig,
        make_landmarks,
        render_world_image,
        simulate_trajectory,
    )
    from okvis_tpu.eval import ate_rmse
    from okvis_tpu.pipeline import ThreadedVio
    from okvis_tpu.utils.timing import Timing

    params = read_config(config)
    params.optimization.max_num_keypoints = max_keypoints
    params.optimization.detection_threshold = 15.0

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    frame_dt = 0.1
    duration = (n_frames + 2) * frame_dt
    traj = simulate_trajectory(duration=duration, seed=31, motion_scale=0.25)
    lms = make_landmarks(traj, n_world_landmarks, seed=32, radius=(4.0, 8.0))

    # pre-render all images on the host CPU backend
    cpu = jax.devices("cpu")[0]
    images = []
    with jax.default_device(cpu):
        for fi in range(n_frames):
            idx = int(round(fi * frame_dt * 200))
            T_WS = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
            per_cam = []
            for cam in range(2):
                T_WC = kin.compose(T_WS, rig.camera_T_SC(cam))
                img = np.asarray(
                    render_world_image(rig.specs[cam], rig.intrinsics[cam], T_WC, lms)
                )
                per_cam.append(img)
            images.append(per_cam)
    print(f"rendered {n_frames} stereo frames", flush=True)

    from okvis_tpu.utils import capture, syncstats

    capture.enabled = True
    capture.reset()
    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float32)
    t_frame_start = None
    frame_times = []
    sync_deltas = []
    imu_i = 0
    t0_all = time.perf_counter()
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        t_frame_start = time.perf_counter()
        s0 = syncstats.snapshot()
        for cam in range(2):
            vio.add_image(t_ns, cam, images[fi][cam])
        vio.wait_idle(timeout=300)
        frame_times.append(time.perf_counter() - t_frame_start)
        s1 = syncstats.snapshot()
        sync_deltas.append({k: s1.get(k, 0) - s0.get(k, 0) for k in s1})
    wall = time.perf_counter() - t0_all

    table = vio.shutdown()
    if table:
        print(table)

    # steady state: skip the first 10 frames (compilation)
    steady = frame_times[10:]
    fps = 1.0 / float(np.mean(steady)) if steady else 0.0
    med_ms = 1e3 * float(np.median(steady)) if steady else float("nan")

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory], np.int64)
    est_pos = np.asarray([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = (
        ate_rmse(est_ts, est_pos, gt_ts, traj.r)
        if len(est_ts) >= 4
        else None
    )
    ate = float("nan") if ate is None else ate

    # blocking host<->device round trips per steady-state frame, split by
    # pipeline stage. Processing-loop syncs (associate_fetch + optimize_fetch
    # + rare extras) are the frame-latency critical path; detect_fetch runs
    # in the detection thread and overlaps.
    proc_tags = (
        "associate_fetch", "optimize_fetch", "resolve_prop",
        "propagate_fetch", "ransac2d2d", "stereo_standalone", "lmq_fetch",
        "frame_mirror",
    )
    steady_syncs = sync_deltas[10:] or sync_deltas
    per_frame = {
        t: float(np.mean([d.get(t, 0) for d in steady_syncs]))
        for t in proc_tags
    }
    proc_total = sum(per_frame.values())
    detect = float(np.mean([d.get("detect_fetch", 0) for d in steady_syncs]))
    print(
        "blocking syncs/frame (steady): processing-loop "
        f"{proc_total:.2f} ({ {k: round(v, 2) for k, v in per_frame.items() if v} }), "
        f"detection thread {detect:.2f}"
    )

    # optimize() latency distribution vs the configured wall-clock budget
    # (CeresIterationCallback parity; blocking mode runs unlimited, so this
    # is informational here — scripts/bench_deadline.py measures the
    # contract in real-time mode)
    if vio.opt_latencies:
        lat = np.asarray(vio.opt_latencies[10:] or vio.opt_latencies)
        print(
            f"optimize latency: p50 {1e3 * np.percentile(lat, 50):.1f} ms, "
            f"p99 {1e3 * np.percentile(lat, 99):.1f} ms "
            f"(budget {1e3 * params.optimization.time_limit:.0f} ms)"
        )

    # ---- device-time ceiling: replay the captured steady-state programs
    # wrapped in a lax.scan (ONE launch runs `depth` iterations on-device)
    # so the measurement is pure chip time, immune to the transport's
    # per-call dispatch cost. A Python-loop replay is kept as the
    # dispatch-INCLUSIVE upper bound (what this image's tunneled client
    # pays per call). All five programs serialize on the one chip
    # regardless of host threading, so their sum is per-frame occupancy.
    import functools

    import jax.tree_util as jtu

    def _scan_device_ms(fn, fargs, fkw, depth=64):
        """Per-call device ms via an on-device scan of `depth` repeats.

        The scan body perturbs one float input by the (≈0) carry and folds
        every output leaf into the next carry — a data dependence chain
        that stops XLA hoisting the loop-invariant body out of the scan or
        dead-code-eliminating unconsumed outputs."""
        fl = functools.partial(fn, **fkw) if fkw else fn
        leaves, treedef = jtu.tree_flatten(fargs)
        arr_idx = [i for i, l in enumerate(leaves) if hasattr(l, "dtype")]
        pi = next(
            k for k, i in enumerate(arr_idx)
            if jnp.issubdtype(leaves[i].dtype, jnp.inexact)
        )

        def rebuild(arrs):
            ls = list(leaves)
            for i, a in zip(arr_idx, arrs):
                ls[i] = a
            return jtu.tree_unflatten(treedef, ls)

        def run_fn(arrs):
            def body(c, _):
                a = list(arrs)
                a[pi] = a[pi] + c.astype(a[pi].dtype)
                out = fl(*rebuild(a))
                s = sum(
                    jnp.sum(o.astype(jnp.float32))
                    for o in jtu.tree_leaves(out)
                    if hasattr(o, "dtype")
                )
                return (s * 1e-30).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0.0), None, length=depth)[0]

        run = jax.jit(run_fn)
        arrs0 = [leaves[i] for i in arr_idx]
        r = run(arrs0)
        jax.block_until_ready(r)  # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            r = run(arrs0)
        jax.block_until_ready(r)
        return 1e3 * (time.perf_counter() - t0) / reps / depth

    def _loop_dispatch_ms(fn, fargs, fkw, n_rep=100):
        out = fn(*fargs, **fkw)
        jax.block_until_ready(out)  # warm (already compiled)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(*fargs, **fkw)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / n_rep

    dev_ms = {}
    disp_ms = {}
    for tag, (fn, fargs, fkw) in sorted(capture.programs().items()):
        try:
            disp_ms[tag] = _loop_dispatch_ms(fn, fargs, fkw)
            dev_ms[tag] = _scan_device_ms(fn, fargs, fkw)
        except Exception as e:
            print(f"device replay failed for {tag}: {e!r}")
            if tag in disp_ms:  # fall back to the dispatch-inclusive number
                dev_ms[tag] = disp_ms[tag]
    # blocking mode runs the full max-iteration solve; the reference's
    # real-time operating point is min_iterations (3) + wall-clock top-ups
    # (config_fpga_p2_euroc.yaml:60-62). Replay the min-iteration program on
    # the same captured problem for the real-time ceiling.
    rt_ms = dict(dev_ms)
    if "optimize" in capture.programs():
        try:
            _fn, (problem,), _kw = capture.programs()["optimize"]
            fn_min = vio.estimator._optimize_fn_for_problem(
                problem, params.optimization.min_iterations
            )
            rt_ms["optimize"] = _scan_device_ms(fn_min, (problem,), {})
        except Exception as e:
            print(f"min-iteration replay failed: {e!r}")
    capture.enabled = False
    dev_total = sum(dev_ms.values())
    dev_fps = 1e3 / dev_total if dev_total > 0 else float("nan")
    rt_total = sum(rt_ms.values())
    rt_fps = 1e3 / rt_total if rt_total > 0 else float("nan")
    if dev_ms:
        parts = ", ".join(
            f"{k} {v:.2f} (disp {disp_ms.get(k, float('nan')):.2f})"
            for k, v in dev_ms.items()
        )
        print(
            f"device time/frame (scan-amortized; 'disp' = per-call incl. "
            f"transport dispatch): {dev_total:.2f} ms ({parts}) -> "
            f"{dev_fps:.0f} frames/s/chip ceiling"
        )
        print(
            f"  at the real-time operating point (min_iterations="
            f"{params.optimization.min_iterations} optimize "
            f"{rt_ms.get('optimize', float('nan')):.2f} ms): {rt_total:.2f} "
            f"ms/frame -> {rt_fps:.0f} frames/s/chip"
        )

    print(
        f"pipeline: {len(vio.trajectory)}/{n_frames} frames, "
        f"steady {fps:.2f} fps (median {med_ms:.0f} ms/frame), "
        f"total wall {wall:.1f} s, ATE {ate:.4f} m"
    )
    import json

    result = {
        "metric": "pipeline_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 20.0, 4),
        "ate_m": None if np.isnan(ate) else round(ate, 4),
        "blocking_syncs_per_frame": round(proc_total, 2),
        "frames": len(vio.trajectory),
        "device_ms_per_frame": round(dev_total, 3) if dev_ms else None,
        "device_fps_ceiling": round(dev_fps, 1) if dev_ms else None,
        "device_ms_per_frame_rt": round(rt_total, 3) if dev_ms else None,
        "device_fps_ceiling_rt": round(rt_fps, 1) if dev_ms else None,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

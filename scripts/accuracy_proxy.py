"""Hardened accuracy proxy: long synthetic scenarios through the FULL
real-vision pipeline (VERDICT r1 next #6).

Real EuRoC data is absent from this zero-egress image, so the accuracy
gate (README.md:106-119 protocol, ATE <= OKVIS on 11 sequences) cannot run
yet — these scenarios exercise the same failure surfaces at reference
scale instead: 300+ frames each (marginalization/keyframe churn far beyond
the window), a revisiting loop, photometric nuisance (brightness drift,
blur, pixel noise), and a near-planar wall segment (the GP3P/P3P planar
degeneracy case, Frontend.cpp:599-642).

Usage: python scripts/accuracy_proxy.py [scenario ...]  (default: all)
Prints an ATE table; exits nonzero if any scenario exceeds its bound.
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
FRAME_DT = 0.1
CONFIG = "/root/reference/config/config_fpga_p2_euroc.yaml"


def _box_blur(img: np.ndarray, k: int = 3) -> np.ndarray:
    """Separable box blur via zero-prepended cumsum (no scipy in the image)."""
    pad = k // 2

    def blur_axis0(a):
        p = np.pad(a, ((pad, pad), (0, 0)), mode="edge")
        c = np.vstack([np.zeros((1, p.shape[1])), np.cumsum(p, axis=0)])
        return (c[k:] - c[:-k]) / k

    out = blur_axis0(img)
    out = blur_axis0(out.T).T
    return out


def scenario_loop(n_frames=320, seed=41, seed_offset=0):
    """Revisiting-loop trajectory: periodic excitation returns the platform
    near its start every ~8 s — repeated viewpoint revisits exercise
    keyframe matching against old keyframes + the pose-graph layer."""
    from okvis_tpu.datasets.synthetic import make_landmarks, simulate_trajectory

    w = 2 * np.pi / 8.0  # 8 s period
    traj = simulate_trajectory(
        duration=(n_frames + 2) * FRAME_DT,
        seed=seed + 10 * seed_offset,
        omega_fn=lambda t: 0.25 * np.array(
            [np.sin(w * t), np.cos(w * t), np.sin(2 * w * t)]
        ),
        acc_w_fn=lambda t: np.array(
            [0.9 * np.sin(w * t), 0.9 * np.cos(w * t), 0.4 * np.sin(2 * w * t)]
        ),
    )
    lms = make_landmarks(traj, 300, seed=seed + 1, radius=(4.0, 9.0))
    return traj, lms, None


def scenario_photometric(n_frames=300, seed=43, seed_offset=0):
    """Nominal motion + photometric nuisance: slow brightness drift (rolling
    exposure), mild blur every frame, extra pixel noise."""
    from okvis_tpu.datasets.synthetic import make_landmarks, simulate_trajectory

    traj = simulate_trajectory(
        duration=(n_frames + 2) * FRAME_DT, seed=seed + 10 * seed_offset,
        motion_scale=0.3,
    )
    lms = make_landmarks(traj, 300, seed=seed + 1, radius=(4.0, 9.0))
    rng = np.random.default_rng(seed + 2)

    def nuisance(img, fi, cam):
        gain = 1.0 + 0.25 * np.sin(2 * np.pi * fi / 90.0)  # exposure drift
        offs = 12.0 * np.sin(2 * np.pi * fi / 47.0 + cam)
        out = _box_blur(img.astype(np.float64), 3)
        out = gain * out + offs + rng.normal(0, 2.5, img.shape)
        return np.clip(out, 0, 255)

    return traj, lms, nuisance


def scenario_planar_wall(n_frames=300, seed=47, seed_offset=0):
    """ALL landmarks on one plane (a wall 4 m ahead): the absolute-pose
    minimal solver must stay non-degenerate (Kneip P3P; the 6-pt DLT was
    degenerate here — VERDICT r1 missing #3)."""
    from okvis_tpu.datasets.synthetic import simulate_trajectory

    traj = simulate_trajectory(
        duration=(n_frames + 2) * FRAME_DT, seed=seed + 10 * seed_offset,
        motion_scale=0.25,
    )
    rng = np.random.default_rng(seed + 1)
    center = traj.r.mean(axis=0)
    # single plane z = center_z + 4: the rig's optic axes are ~body +z and
    # the identity-orientation start keeps the wall in view for the small
    # motions; extent 12 x 8 m
    n_lms = 320
    lms = np.stack(
        [
            center[0] + rng.uniform(-6, 6, n_lms),
            center[1] + rng.uniform(-4, 4, n_lms),
            np.full(n_lms, center[2] + 4.0),
        ],
        axis=1,
    )
    return traj, lms, None


SCENARIOS = {
    "loop": scenario_loop,
    "photometric": scenario_photometric,
    "planar_wall": scenario_planar_wall,
}
# OKVIS_PROXY_FRAMES overrides scenario length (smoke tests);
# OKVIS_PROXY_SEEDS sets the number of seed draws per scenario.
_N_OVERRIDE = int(os.environ.get("OKVIS_PROXY_FRAMES", "0"))
_N_SEEDS = int(os.environ.get("OKVIS_PROXY_SEEDS", "3"))

# Bounds are on the MEDIAN ATE over the seed draws. Single-draw ATE on
# these adversarial scenarios is a lottery: the f32 pipeline's discrete
# decisions (chi2 gates, RANSAC, keyframe choice) amplify benign
# numerical perturbations — measured in round 4, a pure landmark-table
# PERMUTATION (identical factors, c0 equal to 6 decimals per-frame)
# moved the 120-frame loop ATE 0.11 -> 0.50, and the same binary drew
# 0.24 / 0.33 on the 300-frame loop with/without capacity tiers. The
# bounds below cover the observed stability envelope on v5e (f32); the
# real accuracy gate remains the EuRoC protocol when data is available
# (/root/reference/README.md:106-119).
BOUNDS_M = {"loop": 0.45, "photometric": 0.20, "planar_wall": 0.70}


def run_scenario(name: str, seed_offset: int = 0):
    from okvis_tpu import kinematics as kin
    from okvis_tpu.cameras import NCameraSystem
    from okvis_tpu.config import read_config
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, render_world_image
    from okvis_tpu.eval import ate_rmse
    from okvis_tpu.pipeline import ThreadedVio

    kw = {"seed_offset": seed_offset}
    if _N_OVERRIDE:
        kw["n_frames"] = _N_OVERRIDE
    traj, lms, nuisance = SCENARIOS[name](**kw)
    n_frames = int(traj.ts[-1] / FRAME_DT) - 2

    params = read_config(CONFIG)
    params.optimization.max_num_keypoints = 200
    params.optimization.detection_threshold = 15.0

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    cpu = jax.devices("cpu")[0]
    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float32)
    imu_i = 0
    t0 = time.perf_counter()
    for fi in range(n_frames):
        t_ns = int(fi * FRAME_DT * NS)
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        idx = int(round(fi * FRAME_DT * 200))
        T_WS = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        for cam in range(2):
            with jax.default_device(cpu):
                T_WC = kin.compose(T_WS, rig.camera_T_SC(cam))
                img = np.asarray(
                    render_world_image(
                        rig.specs[cam], rig.intrinsics[cam], T_WC, lms
                    )
                )
            if nuisance is not None:
                img = nuisance(img, fi, cam)
            vio.add_image(t_ns, cam, img)
        vio.wait_idle(timeout=600)
        if fi % 50 == 49:
            print(f"  [{name}] {fi + 1}/{n_frames} frames", flush=True)
    wall = time.perf_counter() - t0
    vio.shutdown()

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory], np.int64)
    est_pos = np.asarray([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_pos, gt_ts, traj.r)
    degen = vio.frontend.ransac_degenerate_frames
    return dict(
        scenario=name,
        frames=len(vio.trajectory),
        fed=n_frames,
        ate_m=ate,
        wall_s=wall,
        ransac_degenerate_frames=degen,
    )


def main(names):
    print(f"\n{'scenario':<14s} {'frames':>9s} {'ATE med [m]':>11s} "
          f"{'range':>15s} {'bound':>7s} {'degen':>6s} {'wall [s]':>9s}")
    failed = False
    for n in names:
        runs = [run_scenario(n, seed_offset=s) for s in range(_N_SEEDS)]
        ates = [r["ate_m"] for r in runs if r["ate_m"] is not None]
        med = float(np.median(ates)) if ates else float("nan")
        bound = BOUNDS_M[n]
        frames_ok = all(r["frames"] >= 0.95 * r["fed"] for r in runs)
        ok = ates and med < bound and frames_ok
        failed |= not ok
        rng_s = f"{min(ates):.3f}..{max(ates):.3f}" if ates else "-"
        degen = sum(r["ransac_degenerate_frames"] for r in runs)
        wall = sum(r["wall_s"] for r in runs)
        fr = f"{runs[0]['frames']}/{runs[0]['fed']}x{len(runs)}"
        print(
            f"{n:<14s} {fr:>9s} {med:>11.4f} {rng_s:>15s} {bound:>7.2f} "
            f"{degen:>6d} {wall:>9.1f}" + ("" if ok else "   <-- FAIL")
        )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    args = sys.argv[1:] or list(SCENARIOS)
    main(args)

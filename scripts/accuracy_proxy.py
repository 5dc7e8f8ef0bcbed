"""Hardened accuracy proxy: long synthetic scenarios through the FULL
real-vision pipeline (VERDICT r1 next #6; config matrix VERDICT r4 next #4).

Real EuRoC data is absent from this zero-egress image, so the accuracy
gate (README.md:106-119 protocol, ATE <= OKVIS on 11 sequences) cannot run
yet — these scenarios exercise the same failure surfaces at reference
scale instead: 300+ frames each (marginalization/keyframe churn far beyond
the window), a revisiting loop, photometric nuisance (brightness drift,
blur, pixel noise), and a near-planar wall segment (the GP3P/P3P planar
degeneracy case, Frontend.cpp:599-642).

Config axis (BASELINE.json configs[0..4]):
  stereo       — 2-camera NCameraSystem (default; configs 1-2)
  mono         — single camera + IMU, 2D-2D RANSAC init (config 0)
  extrinsics   — online camera-IMU extrinsics calibration, T_SC in BA,
                 rig fed to the pipeline deliberately perturbed (config 3)
  distributed8 — sharded BA over an 8-device mesh (config 4; runs on the
                 virtual CPU mesh — cells re-exec in a subprocess with
                 XLA_FLAGS/JAX_PLATFORMS set before backend init)
  loopclosure  — pose-graph/loop-closure layer enabled (new capability)

Usage:
  python scripts/accuracy_proxy.py [scenario ...]     stereo only (default)
  python scripts/accuracy_proxy.py --matrix           full config x scenario
  python scripts/accuracy_proxy.py --cell CFG SCEN N  one cell (internal)
Prints an ATE table; exits nonzero if any cell exceeds its bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Matrix cells run as subprocesses; distributed8 needs an 8-device mesh and
# every cell is faster on the host CPU than through this image's TPU tunnel
# (~100 ms/dispatch). The env var alone does NOT beat the image's axon TPU
# plugin — jax.config must be updated before the first device op.
if os.environ.get("OKVIS_PROXY_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

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
    # deterministic excitation ignores the trajectory seed — add a
    # seed-dependent phase so the 3 "seed draws" are genuinely distinct
    # trajectories, not reruns of one (round-5 fix: the loop rows' spread
    # previously came only from thread/float nondeterminism)
    ph = 0.4 * seed_offset
    traj = simulate_trajectory(
        duration=(n_frames + 2) * FRAME_DT,
        seed=seed + 10 * seed_offset,
        omega_fn=lambda t: 0.25 * np.array(
            [np.sin(w * t + ph), np.cos(w * t - ph), np.sin(2 * w * t + ph)]
        ),
        acc_w_fn=lambda t: np.array(
            [0.9 * np.sin(w * t + ph), 0.9 * np.cos(w * t - ph),
             0.4 * np.sin(2 * w * t + ph)]
        ),
    )
    lms = make_landmarks(traj, 300, seed=seed + 1 + seed_offset,
                         radius=(4.0, 9.0))
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

# BASELINE.json configs[0..4] as pipeline variants (see module docstring)
CONFIG_VARIANTS = {
    "stereo": {},
    "mono": {"mono": True},
    "extrinsics": {"extrinsics": True},
    "distributed8": {"distributed": 8},
    "loopclosure": {"loop_closure": True},
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

# Per-config multipliers on the scenario bounds: mono scale is only
# IMU-observable (ref mono operating point accepts higher ATE); online
# extrinsics calibration starts from a deliberately MIScalibrated rig, so
# its cells include the convergence transient — slowest under the gentle
# periodic excitation (observed envelope 0.24..3.3 across seeds on the
# 320-frame loop; median gated).
CONFIG_BOUND_SCALE = {
    "stereo": 1.0,
    "mono": 2.5,
    "extrinsics": 3.0,
    "distributed8": 1.0,
    "loopclosure": 1.0,
}


def run_scenario(name: str, seed_offset: int = 0, config: str = "stereo"):
    from okvis_tpu import kinematics as kin
    from okvis_tpu.cameras import NCameraSystem
    from okvis_tpu.config import read_config
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, render_world_image
    from okvis_tpu.eval import ate_rmse
    from okvis_tpu.pipeline import ThreadedVio

    variant = CONFIG_VARIANTS[config]
    n_cams = 1 if variant.get("mono") else 2

    kw = {"seed_offset": seed_offset}
    if _N_OVERRIDE:
        kw["n_frames"] = _N_OVERRIDE
    traj, lms, nuisance = SCENARIOS[name](**kw)
    n_frames = int(traj.ts[-1] / FRAME_DT) - 2

    params = read_config(CONFIG)
    params.optimization.max_num_keypoints = 200
    params.optimization.detection_threshold = 15.0
    if variant.get("extrinsics"):
        # online camera-IMU extrinsics calibration (BASELINE.json config 3,
        # ref Estimator.cpp:287-307). Priors sized ~2 sigma of the actual
        # rig perturbation drawn below (5 mm / 0.005 rad) — the declared
        # uncertainty also drives the matching-gate inflation, so a prior
        # far beyond the true miscalibration loosens gates needlessly.
        params.camera_params.sigma_absolute_translation = 0.012
        params.camera_params.sigma_absolute_orientation = 0.010
    if variant.get("distributed"):
        params.optimization.distributed_devices = variant["distributed"]
    if variant.get("loop_closure"):
        params.posegraph.enabled = True
        mi = os.environ.get("OKVIS_PROXY_PGO_MIN_INLIERS")
        if mi:
            params.posegraph.min_inliers = int(mi)

    specs, T_SC, intrinsics = euroc_stereo_rig()
    if n_cams == 1:
        specs = specs[:1]
        T_SC = kin.SE3(r=T_SC.r[:1], q=T_SC.q[:1])
        intrinsics = intrinsics[:1]
    # rendering uses the TRUE rig; online-extrinsics cells feed the pipeline
    # a perturbed rig it must calibrate away (5 mm / ~0.3 deg per camera)
    rig_true = NCameraSystem(
        specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics
    )
    rig_true.compute_overlaps()
    rig_vio = rig_true
    if variant.get("extrinsics"):
        prng = np.random.default_rng(90 + seed_offset)
        dr = prng.normal(0, 0.005, (n_cams, 3))
        dq = prng.normal(0, 0.005, (n_cams, 3))
        q_pert = kin.quat_normalize(
            jnp.concatenate([jnp.asarray(dq), jnp.ones((n_cams, 1))], axis=1)
        )
        T_SC_p = kin.compose(
            kin.SE3(r=T_SC.r, q=T_SC.q), kin.SE3(r=jnp.asarray(dr), q=q_pert)
        )
        rig_vio = NCameraSystem(
            specs=tuple(specs), T_SC=T_SC_p, intrinsics=intrinsics
        )
        rig_vio.compute_overlaps()

    cpu = jax.devices("cpu")[0]
    vio = ThreadedVio(params, rig=rig_vio, blocking=True, dtype=jnp.float32)
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
        for cam in range(n_cams):
            with jax.default_device(cpu):
                T_WC = kin.compose(T_WS, rig_true.camera_T_SC(cam))
                img = np.asarray(
                    render_world_image(
                        rig_true.specs[cam], rig_true.intrinsics[cam], T_WC, lms
                    )
                )
            if nuisance is not None:
                img = nuisance(img, fi, cam)
            vio.add_image(t_ns, cam, img)
        vio.wait_idle(timeout=600)
        if fi % 50 == 49:
            print(f"  [{config}/{name}] {fi + 1}/{n_frames} frames", flush=True)
    wall = time.perf_counter() - t0
    vio.shutdown()

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory], np.int64)
    est_pos = np.asarray([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_pos, gt_ts, traj.r)
    degen = vio.frontend.ransac_degenerate_frames
    return dict(
        config=config,
        scenario=name,
        frames=len(vio.trajectory),
        fed=n_frames,
        ate_m=ate,
        wall_s=wall,
        ransac_degenerate_frames=degen,
    )


def _gate(config, scenario, runs):
    """(median, bound, ok) for one cell's seed draws."""
    ates = [r["ate_m"] for r in runs if r["ate_m"] is not None]
    med = float(np.median(ates)) if ates else float("nan")
    bound = BOUNDS_M[scenario] * CONFIG_BOUND_SCALE[config]
    frames_ok = bool(runs) and all(r["frames"] >= 0.95 * r["fed"] for r in runs)
    ok = bool(ates) and med < bound and frames_ok
    return med, bound, ok


def _print_row(config, scenario, runs, med, bound, ok):
    ates = [r["ate_m"] for r in runs if r["ate_m"] is not None]
    rng_s = f"{min(ates):.3f}..{max(ates):.3f}" if ates else "-"
    degen = sum(r["ransac_degenerate_frames"] for r in runs)
    wall = sum(r["wall_s"] for r in runs)
    fr = (
        f"{runs[0]['frames']}/{runs[0]['fed']}x{len(runs)}" if runs else "-"
    )
    print(
        f"{config:<13s} {scenario:<12s} {fr:>9s} {med:>11.4f} {rng_s:>15s} "
        f"{bound:>7.2f} {degen:>6d} {wall:>9.1f}"
        + ("" if ok else "   <-- FAIL"),
        flush=True,
    )


_HDR = (
    f"\n{'config':<13s} {'scenario':<12s} {'frames':>9s} {'ATE med [m]':>11s} "
    f"{'range':>15s} {'bound':>7s} {'degen':>6s} {'wall [s]':>9s}"
)


def main(names):
    """Stereo-only run (the round-3/4 default behavior)."""
    print(_HDR)
    failed = False
    for n in names:
        runs = [run_scenario(n, seed_offset=s) for s in range(_N_SEEDS)]
        med, bound, ok = _gate("stereo", n, runs)
        failed |= not ok
        _print_row("stereo", n, runs, med, bound, ok)
    sys.exit(1 if failed else 0)


def main_cell(config, scenario, seed):
    """One (config, scenario, seed) run; emits one 'CELL {json}' line."""
    import json

    r = run_scenario(scenario, seed_offset=seed, config=config)
    print("CELL " + json.dumps(r), flush=True)


def main_matrix(scenario_names, configs=None, force_cpu=True):
    """Config x scenario matrix; every cell is an isolated subprocess (fresh
    XLA state — no executable accumulation; one crash loses one draw, not
    the sweep). Results stream into PROXY_MATRIX.json next to this script."""
    import json
    import subprocess

    configs = configs or list(CONFIG_VARIANTS)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "PROXY_MATRIX.json")
    # merge into prior results so a subset rerun (e.g. one config after a
    # fix) updates its rows without discarding the rest of the sweep
    results = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                results = json.load(f)
        except Exception:
            results = {}
    print(_HDR)
    failed = False
    for config in configs:
        for scen in scenario_names:
            runs = []
            for seed in range(_N_SEEDS):
                env = dict(os.environ)
                if force_cpu:
                    env["OKVIS_PROXY_FORCE_CPU"] = "1"
                cmd = [
                    sys.executable, os.path.abspath(__file__),
                    "--cell", config, scen, str(seed),
                ]
                try:
                    p = subprocess.run(
                        cmd, env=env, capture_output=True, text=True,
                        timeout=3600,
                    )
                    lines = [
                        ln for ln in p.stdout.splitlines()
                        if ln.startswith("CELL ")
                    ]
                    if lines:
                        runs.append(json.loads(lines[-1][5:]))
                    else:
                        print(
                            f"cell {config}/{scen}/seed{seed} failed "
                            f"rc={p.returncode}: {p.stderr[-800:]}", flush=True,
                        )
                except subprocess.TimeoutExpired:
                    print(f"cell {config}/{scen}/seed{seed} timed out",
                          flush=True)
            med, bound, ok = _gate(config, scen, runs)
            failed |= not ok
            _print_row(config, scen, runs, med, bound, ok)
            results[f"{config}/{scen}"] = dict(
                runs=runs, median_ate_m=med, bound_m=bound, ok=ok,
            )
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
    print(f"\nmatrix {'PASS' if not failed else 'FAIL'}; details {out_path}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv[:1] == ["--cell"]:
        main_cell(argv[1], argv[2], int(argv[3]))
    elif argv[:1] == ["--matrix"]:
        rest = argv[1:]
        configs = [a for a in rest if a in CONFIG_VARIANTS]
        scens = [a for a in rest if a in SCENARIOS] or list(SCENARIOS)
        main_matrix(scens, configs=configs or None,
                    force_cpu=os.environ.get("OKVIS_PROXY_TPU", "") != "1")
    else:
        main(argv or list(SCENARIOS))

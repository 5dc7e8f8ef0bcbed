"""Synthetic VIO world: analytic trajectory + IMU + landmark observations.

The TPU analog of the reference's canonical backend test fixture
(/root/reference/okvis_ceres/test/TestEstimator.cpp:52-238 and
TestImuError.cpp:66-160): a smooth trajectory with exactly-consistent IMU
measurements, a landmark cloud, and noisy stereo projections. Used by the
solver/estimator tests and by the synthetic end-to-end benchmark slice
(SURVEY.md §7 step 6) — the full backend runs on-device before any vision
kernel exists.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import kinematics as kin
from ..cameras import pinhole
from ..cameras.pinhole import CameraSpec
from ..factors import sqrt_information
from ..imu.preintegration import ImuParams, preintegrate
from ..solver import WindowConfig, empty_problem


def _np_quat_mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def _np_delta_q(da):
    half = 0.5 * np.linalg.norm(da)
    s = np.sinc(half / np.pi)
    return np.array([*(s * 0.5 * da), np.cos(half)])


def _np_quat_to_matrix(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclasses.dataclass
class SyntheticImu:
    """IMU samples + ground-truth states at each sample time."""

    ts: np.ndarray  # (N,) seconds
    gyro: np.ndarray  # (N, 3)
    acc: np.ndarray  # (N, 3)
    r: np.ndarray  # (N, 3) ground-truth position
    q: np.ndarray  # (N, 4) ground-truth orientation (xyzw)
    v: np.ndarray  # (N, 3) ground-truth velocity
    g: float


def simulate_trajectory(
    duration: float = 2.0,
    imu_rate: int = 200,
    fine_substeps: int = 50,
    seed: int = 1,
    motion_scale: float = 1.0,
    g: float = 9.81007,
    omega_fn: Optional[Callable] = None,
    acc_w_fn: Optional[Callable] = None,
) -> SyntheticImu:
    """Integrate a smooth sinusoidal trajectory; emit exact IMU measurements.

    Ground truth comes from fine midpoint integration (fine_substeps per IMU
    interval), so a trapezoidal preintegration at imu_rate reproduces the
    sampled states to ~1e-3 over seconds of aggressive motion.
    """
    rng = np.random.default_rng(seed)
    wm = motion_scale * rng.uniform(0.3, 0.9, 3)
    am = motion_scale * rng.uniform(0.5, 1.5, 3)
    ph = rng.uniform(0, 2 * np.pi, 6)

    omega_fn = omega_fn or (
        lambda t: np.array(
            [
                wm[0] * np.sin(1.1 * t + ph[0]),
                wm[1] * np.cos(0.9 * t + ph[1]),
                wm[2] * np.sin(0.7 * t + ph[2]),
            ]
        )
    )
    acc_w_fn = acc_w_fn or (
        lambda t: np.array(
            [
                am[0] * np.sin(1.6 * t + ph[3]),
                am[1] * np.cos(1.2 * t + ph[4]),
                am[2] * np.sin(0.8 * t + ph[5]),
            ]
        )
    )

    n = int(round(duration * imu_rate))
    dt_s = 1.0 / imu_rate
    dt_f = dt_s / fine_substeps
    q = np.array([0.0, 0.0, 0.0, 1.0])
    r = np.zeros(3)
    v = np.zeros(3)
    ts, gy, ac, rs, qs, vs = [], [], [], [], [], []
    for i in range(n + 1):
        t = i * dt_s
        C_WS = _np_quat_to_matrix(q)
        ts.append(t)
        gy.append(omega_fn(t))
        ac.append(C_WS.T @ (acc_w_fn(t) + np.array([0.0, 0.0, g])))
        rs.append(r.copy())
        qs.append(q.copy())
        vs.append(v.copy())
        if i == n:
            break
        for k in range(fine_substeps):
            tm = t + (k + 0.5) * dt_f
            q = _np_quat_mul(q, _np_delta_q(omega_fn(tm) * dt_f))
            q /= np.linalg.norm(q)
            a = acc_w_fn(tm)
            r = r + v * dt_f + 0.5 * a * dt_f * dt_f
            v = v + a * dt_f
    return SyntheticImu(
        ts=np.asarray(ts),
        gyro=np.asarray(gy),
        acc=np.asarray(ac),
        r=np.asarray(rs),
        q=np.asarray(qs),
        v=np.asarray(vs),
        g=g,
    )


def euroc_stereo_rig() -> Tuple[Tuple[CameraSpec, CameraSpec], kin.SE3, list]:
    """EuRoC-like stereo rig (11 cm baseline, radtan distortion), values in the
    spirit of /root/reference/config/config_fpga_p2_euroc.yaml:3-26."""
    spec = CameraSpec(752, 480, "radtan")
    intr = jnp.asarray(
        [461.4, 460.2, 363.0, 248.1, -0.28, 0.07, 2.0e-4, 1.8e-5]
    )
    T_SC0 = kin.SE3(
        r=jnp.asarray([-0.016, -0.064, 0.0098]),
        q=kin.quat_normalize(jnp.asarray([0.007, 0.002, -0.002, 1.0])),
    )
    T_SC1 = kin.SE3(
        r=jnp.asarray([-0.015, 0.046, 0.0074]),
        q=kin.quat_normalize(jnp.asarray([-0.003, 0.003, 0.002, 1.0])),
    )
    T_SC = kin.SE3(
        r=jnp.stack([T_SC0.r, T_SC1.r]), q=jnp.stack([T_SC0.q, T_SC1.q])
    )
    return (spec, spec), T_SC, [intr, intr]


def make_landmarks(
    traj: SyntheticImu, n_landmarks: int, seed: int = 2, radius=(2.0, 8.0)
) -> np.ndarray:
    """Landmark cloud in a shell around the trajectory's bounding region
    (analog of the grid in TestEstimator.cpp:160-176)."""
    rng = np.random.default_rng(seed)
    center = traj.r.mean(axis=0)
    dirs = rng.normal(size=(n_landmarks, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rad = rng.uniform(radius[0], radius[1], (n_landmarks, 1))
    return center + dirs * rad

def build_ba_problem(
    num_frames=4,
    frame_stride=60,  # IMU samples between frames (0.3 s @ 200 Hz)
    n_landmarks=96,
    pixel_noise=0.7,
    duration=4.0,
    seed=5,
    cfg_kwargs=None,
):
    """Build a fully-populated BaProblem from the synthetic world.

    Returns (cfg, imu_params, intrinsics, problem_at_truth, truth dict);
    callers perturb copies to test/benchmark convergence (the library-level
    analog of reference TestEstimator.cpp:52-238, used by tests, bench.py and
    the driver entry points).
    """

    rng = np.random.default_rng(seed)
    traj = simulate_trajectory(duration=duration, seed=seed)
    specs, T_SC, intrinsics = euroc_stereo_rig()
    lms = make_landmarks(traj, n_landmarks, seed=seed + 1)
    imu_params = ImuParams.euroc()

    frame_idx = [i * frame_stride for i in range(num_frames)]
    S = num_frames
    cfg_defaults = dict(
        num_states=S,
        num_cameras=2,
        max_landmarks=max(128, n_landmarks),
        max_observations=2048,
        imu_samples=frame_stride + 2,
        max_imu_links=max(S - 1, 1),
        camera_specs=specs,
    )
    cfg_defaults.update(cfg_kwargs or {})
    cfg = WindowConfig(**cfg_defaults)
    problem = empty_problem(cfg)

    # ground-truth states
    r_WS = jnp.asarray(traj.r[frame_idx])
    q_WS = jnp.asarray(traj.q[frame_idx])
    sb = jnp.concatenate(
        [jnp.asarray(traj.v[frame_idx]), jnp.zeros((S, 6))], axis=1
    )
    states = problem.states._replace(
        r_WS=problem.states.r_WS.at[:S].set(r_WS),
        q_WS=problem.states.q_WS.at[:S].set(q_WS),
        speed_and_bias=problem.states.speed_and_bias.at[:S].set(sb),
        r_SC=T_SC.r,
        q_SC=T_SC.q,
        hp_W=problem.states.hp_W.at[:n_landmarks, :3].set(jnp.asarray(lms)),
    )
    state_mask = problem.state_mask.at[:S].set(True)
    lm_mask = problem.lm_mask.at[:n_landmarks].set(True)

    # observations: project all landmarks into every frame/camera
    obs_rows = []
    for si, fi in enumerate(frame_idx):
        T_WS_i = kin.SE3(r=jnp.asarray(traj.r[fi]), q=jnp.asarray(traj.q[fi]))
        for c in range(2):
            T_WC = kin.compose(T_WS_i, kin.SE3(r=T_SC.r[c], q=T_SC.q[c]))
            T_CW = kin.inverse(T_WC)
            p_C = jax.vmap(lambda p: kin.transform_point(T_CW, p))(jnp.asarray(lms))
            uv, flags = jax.vmap(lambda p: pinhole.project(specs[c], intrinsics[c], p))(p_C)
            ok = np.asarray(flags) == pinhole.STATUS_OK
            for li in np.nonzero(ok)[0]:
                kp = np.asarray(uv[li]) + rng.normal(0, pixel_noise, 2)
                obs_rows.append((si, c, int(li), kp))

    O = len(obs_rows)
    assert O <= cfg.max_observations, f"{O} observations exceed capacity"
    obs = problem.obs
    obs = obs._replace(
        state_idx=obs.state_idx.at[:O].set(jnp.asarray([r[0] for r in obs_rows], jnp.int32)),
        cam_idx=obs.cam_idx.at[:O].set(jnp.asarray([r[1] for r in obs_rows], jnp.int32)),
        lm_idx=obs.lm_idx.at[:O].set(jnp.asarray([r[2] for r in obs_rows], jnp.int32)),
        keypoint=obs.keypoint.at[:O].set(jnp.asarray(np.stack([r[3] for r in obs_rows]))),
        sqrt_info=obs.sqrt_info.at[:O].set(1.0 / pixel_noise),
        mask=obs.mask.at[:O].set(True),
    )

    # IMU links between consecutive frames
    links = problem.imu_links
    P = cfg.imu_samples
    for k in range(S - 1):
        a, b = frame_idx[k], frame_idx[k + 1]
        sl = slice(a, min(a + P, len(traj.ts)))
        ts_k = np.full(P, traj.ts[sl][-1])
        gy_k = np.tile(traj.gyro[sl][-1], (P, 1))
        ac_k = np.tile(traj.acc[sl][-1], (P, 1))
        n = sl.stop - sl.start
        ts_k[:n] = traj.ts[sl]
        gy_k[:n] = traj.gyro[sl]
        ac_k[:n] = traj.acc[sl]
        pre = preintegrate(
            imu_params,
            jnp.asarray(ts_k),
            jnp.asarray(gy_k),
            jnp.asarray(ac_k),
            jnp.asarray(traj.ts[a]),
            jnp.asarray(traj.ts[b]),
            sb[k],
        )
        links = links._replace(
            pre=jax.tree_util.tree_map(
                lambda full, one: full.at[k].set(one), links.pre, pre
            ),
            idx_a=links.idx_a.at[k].set(k),
            idx_b=links.idx_b.at[k].set(k + 1),
            mask=links.mask.at[k].set(True),
        )

    # priors on the first state (analog of Estimator.cpp:238-285)
    pp = problem.pose_priors
    pp = pp._replace(
        state_idx=pp.state_idx.at[0].set(0),
        r_meas=pp.r_meas.at[0].set(r_WS[0]),
        q_meas=pp.q_meas.at[0].set(q_WS[0]),
        sqrt_info=pp.sqrt_info.at[0].set(sqrt_information(jnp.eye(6) * 1e8)),
        mask=pp.mask.at[0].set(True),
    )
    sp = problem.sb_priors
    sp = sp._replace(
        state_idx=sp.state_idx.at[0].set(0),
        sb_meas=sp.sb_meas.at[0].set(sb[0]),
        sqrt_info=sp.sqrt_info.at[0].set(
            sqrt_information(jnp.diag(jnp.concatenate([jnp.full(3, 1e4), jnp.full(6, 1e2)])))
        ),
        mask=sp.mask.at[0].set(True),
    )

    problem = problem._replace(
        states=states,
        state_mask=state_mask,
        lm_mask=lm_mask,
        obs=obs,
        imu_links=links,
        pose_priors=pp,
        sb_priors=sp,
    )
    truth = {
        "r_WS": np.asarray(r_WS),
        "q_WS": np.asarray(q_WS),
        "sb": np.asarray(sb),
        "landmarks": lms,
        "n_landmarks": n_landmarks,
        "num_obs": O,
        "frame_idx": frame_idx,
        "traj": traj,
    }
    return cfg, imu_params, intrinsics, problem, truth


def render_world_image(
    spec,
    intrinsics,
    T_WC,
    landmark_pts: np.ndarray,
    rng_seed: int = 77,
    patch: int = 11,
    background: float = 120.0,
    noise: float = 1.0,
) -> np.ndarray:
    """Render a synthetic camera image: each 3D landmark is stamped as a
    fixed random-texture patch at its projection (no occlusion handling).

    Gives the real detection/description/matching path trackable features for
    the full-vision end-to-end tests — the image-domain analog of
    TestEstimator's synthetic observations.
    """
    import jax

    from ..cameras import pinhole as _ph
    from .. import kinematics as _kin

    H, W = spec.height, spec.width
    rng = np.random.default_rng(rng_seed)
    # per-landmark texture, fixed across frames (deterministic from the seed)
    textures = rng.uniform(-70.0, 70.0, (len(landmark_pts), patch, patch))
    # sharpen: blocky 3x3 super-pixels give strong Harris corners
    for t in textures:
        t[:] = np.kron(
            rng.uniform(-70, 70, (patch // 3 + 1, patch // 3 + 1)),
            np.ones((3, 3)),
        )[:patch, :patch]

    img = np.full((H, W), background, np.float32)
    yy = np.linspace(0, 10, H)[:, None]
    xx = np.linspace(0, 7, W)[None, :]
    img += (yy + xx).astype(np.float32)  # mild gradient
    img += rng.normal(0, noise, (H, W)).astype(np.float32)

    T_CW = _kin.inverse(T_WC)
    p_C = np.array(
        jax.vmap(lambda p: _kin.transform_point(T_CW, p))(jnp.asarray(landmark_pts))
    )
    uv, flags = jax.vmap(lambda p: _ph.project(spec, intrinsics, p))(
        jnp.asarray(p_C)
    )
    uv = np.asarray(uv)
    ok = np.asarray(flags) == 0
    half = patch // 2
    for li in np.nonzero(ok)[0]:
        x, y = int(round(uv[li, 0])), int(round(uv[li, 1]))
        if not (half <= x < W - half and half <= y < H - half):
            continue
        img[y - half : y + half + 1, x - half : x + half + 1] += textures[li]
    return np.clip(img, 0, 255)


def write_euroc_format(
    out_dir: str,
    traj: SyntheticImu,
    landmark_pts: np.ndarray,
    rig,
    frame_dt: float = 0.1,
    n_frames: int = 10,
    epoch_ns: int = 1_400_000_000_000_000_000,
) -> str:
    """Write the synthetic world as an EuRoC ASL directory (mav0/...): per-cam
    PNG frames named by nanosecond timestamp, imu0/data.csv, and ground truth
    — so the EuRoC loader + CLI app run end-to-end without the real dataset.
    Returns the mav0 path."""
    import os

    from PIL import Image

    from .. import kinematics as _kin

    mav0 = os.path.join(out_dir, "mav0")
    os.makedirs(os.path.join(mav0, "imu0"), exist_ok=True)
    with open(os.path.join(mav0, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(traj.ts)):
            t = epoch_ns + int(round(traj.ts[i] * 1e9))
            g, a = traj.gyro[i], traj.acc[i]
            f.write(f"{t},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}\n")

    gt_dir = os.path.join(mav0, "state_groundtruth_estimate0")
    os.makedirs(gt_dir, exist_ok=True)
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp,p,q,v\n")
        for i in range(len(traj.ts)):
            t = epoch_ns + int(round(traj.ts[i] * 1e9))
            p, q, v = traj.r[i], traj.q[i], traj.v[i]
            # EuRoC order: p(3), q(wxyz), v(3)
            f.write(
                f"{t},{p[0]},{p[1]},{p[2]},{q[3]},{q[0]},{q[1]},{q[2]},"
                f"{v[0]},{v[1]},{v[2]}\n"
            )

    imu_rate = int(round(1.0 / (traj.ts[1] - traj.ts[0])))
    for cam in range(rig.num_cameras):
        d = os.path.join(mav0, f"cam{cam}", "data")
        os.makedirs(d, exist_ok=True)
        for fi in range(n_frames):
            t = fi * frame_dt
            idx = int(round(t * imu_rate))
            if idx >= len(traj.ts):
                break
            T_WS = _kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
            T_WC = _kin.compose(T_WS, rig.camera_T_SC(cam))
            img = render_world_image(
                rig.specs[cam], rig.intrinsics[cam], T_WC, landmark_pts
            )
            ts_ns = epoch_ns + int(round(t * 1e9))
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(d, f"{ts_ns}.png")
            )
    return mav0


def render_textured_plane(
    spec,
    intrinsics,
    T_WC,
    texture: np.ndarray,  # (Ht, Wt) float grayscale
    plane_z: float = 0.0,
    plane_scale: float = 100.0,  # texture pixels per world meter
    background: float = 90.0,
) -> np.ndarray:
    """Render the camera viewing a textured plane z=plane_z (world).

    Natural-texture imagery for full-vision tests: every camera pixel's ray
    is intersected with the plane and bilinearly sampled from the texture
    (rays pointing away from the plane get the background value). Fully
    vectorized numpy; no occlusion (single plane).
    """
    import jax

    from ..cameras import pinhole as _ph
    from .. import kinematics as _kin

    H, W = spec.height, spec.width
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    uv = jnp.asarray(np.stack([us.ravel(), vs.ravel()], axis=-1))
    rays_C = np.array(
        jax.vmap(lambda p: _ph.back_project(spec, intrinsics, p))(uv)
    )  # (N, 3)
    C_WC = np.array(_kin.quat_to_matrix(T_WC.q))
    o_W = np.asarray(T_WC.r)
    d_W = rays_C @ C_WC.T  # (N, 3)
    dz = d_W[:, 2]
    t = (plane_z - o_W[2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
    hit = t > 0.05
    p_W = o_W[None, :] + t[:, None] * d_W
    tx = p_W[:, 0] * plane_scale
    ty = p_W[:, 1] * plane_scale
    Ht, Wt = texture.shape
    # wrap the texture so the plane is endless
    x0 = np.floor(tx).astype(np.int64)
    y0 = np.floor(ty).astype(np.int64)
    fx = (tx - x0).astype(np.float32)
    fy = (ty - y0).astype(np.float32)
    x0m, y0m = x0 % Wt, y0 % Ht
    x1m, y1m = (x0 + 1) % Wt, (y0 + 1) % Ht
    v = (
        texture[y0m, x0m] * (1 - fx) * (1 - fy)
        + texture[y0m, x1m] * fx * (1 - fy)
        + texture[y1m, x0m] * (1 - fx) * fy
        + texture[y1m, x1m] * fx * fy
    )
    img = np.where(hit, v, background).astype(np.float32)
    return img.reshape(H, W)

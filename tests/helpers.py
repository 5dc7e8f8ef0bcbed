"""Shared test fixture builders (thin re-export of the library builder)."""

from okvis_tpu.datasets.synthetic import build_ba_problem


def build_synthetic_problem(*args, **kwargs):
    return build_ba_problem(*args, **kwargs)


def build_estimator_world(seed=5, n_frames=4, n_landmarks=80, distributed=0):
    """Small deterministic estimator scenario (synthetic frontend): states +
    landmarks + observations added, NOT yet optimized. For tests comparing
    optimize() variants (single-device vs sharded)."""
    import jax.numpy as jnp
    import numpy as np

    from okvis_tpu import kinematics as kin
    from okvis_tpu.cameras import NCameraSystem, pinhole
    from okvis_tpu.datasets.synthetic import (
        euroc_stereo_rig,
        make_landmarks,
        simulate_trajectory,
    )
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    rng = np.random.default_rng(seed)
    frame_dt = 0.1
    traj = simulate_trajectory(duration=1.5, seed=seed, motion_scale=0.5)
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    lms = make_landmarks(traj, n_landmarks, seed=seed + 1, radius=(3.0, 8.0))
    cfg = WindowConfig(
        num_states=9,
        num_cameras=2,
        max_landmarks=128,
        max_observations=512,
        imu_samples=32,
        max_imu_links=8,
        max_iterations=5,
        camera_specs=tuple(rig.specs),
    )
    est = Estimator(rig, ImuParams.euroc(), num_keyframes=5, num_imu_frames=3, cfg=cfg)
    if distributed:
        # must precede landmark creation: slots spread round-robin over shards
        est.enable_distributed(n_devices=distributed)

    imu_rate = 200
    for fi in range(n_frames):
        t = fi * frame_dt
        idx = int(round(t * imu_rate))
        lo, hi = max(0, idx - 24), min(len(traj.ts), idx + 5)
        sid = est.add_states(
            t, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=(fi % 2 == 0),
        )
        T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        for li, p_W in enumerate(lms):
            vis = []
            for c in range(2):
                T_CW = kin.inverse(kin.compose(T_WS_true, rig.camera_T_SC(c)))
                p_C = kin.transform_point(T_CW, jnp.asarray(p_W))
                uv, flags = pinhole.project(rig.specs[c], est.intrinsics[c], p_C)
                if int(flags) == pinhole.STATUS_OK:
                    vis.append((c, np.asarray(uv)))
            if len(vis) < 2:
                continue
            lm_id = 10_000 + li
            if not est.is_landmark_added(lm_id):
                est.add_landmark(lm_id, p_W + rng.normal(0, 0.05, 3))
            for c, uv in vis:
                est.add_observation(
                    lm_id, sid, c, uv + rng.normal(0, 0.6, 2),
                    keypoint_idx=li, size=8.0,
                )
    return est, dict(traj=traj, rig=rig, lms=lms)

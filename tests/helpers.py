"""Shared test fixture builders: synthetic BaProblems from the synthetic world."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis_tpu import kinematics as kin
from okvis_tpu.cameras import pinhole
from okvis_tpu.datasets.synthetic import (
    SyntheticImu,
    euroc_stereo_rig,
    make_landmarks,
    simulate_trajectory,
)
from okvis_tpu.factors import sqrt_information
from okvis_tpu.imu import ImuParams, preintegrate
from okvis_tpu.solver import WindowConfig, empty_problem


def build_synthetic_problem(
    num_frames=4,
    frame_stride=60,  # IMU samples between frames (0.3 s @ 200 Hz)
    n_landmarks=96,
    pixel_noise=0.7,
    duration=4.0,
    seed=5,
    cfg_kwargs=None,
):
    """Returns (cfg, imu_params, intrinsics, problem_at_truth, truth dict).

    The problem is populated with ground-truth states/landmarks; callers
    perturb copies to test convergence (analog of TestEstimator.cpp:52-238).
    """
    rng = np.random.default_rng(seed)
    traj = simulate_trajectory(duration=duration, seed=seed)
    specs, T_SC, intrinsics = euroc_stereo_rig()
    lms = make_landmarks(traj, n_landmarks, seed=seed + 1)
    imu_params = ImuParams.euroc()

    frame_idx = [i * frame_stride for i in range(num_frames)]
    S = num_frames
    cfg_kwargs = dict(cfg_kwargs or {})
    cfg = WindowConfig(
        num_states=S,
        num_cameras=2,
        max_landmarks=max(128, n_landmarks),
        max_observations=2048,
        imu_samples=frame_stride + 2,
        max_imu_links=max(S - 1, 1),
        camera_specs=specs,
        **cfg_kwargs,
    )
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

"""Full-vision end-to-end test: rendered images through the REAL detection /
description / matching / BA pipeline (no stubs) — the complete §7 step-7
slice on synthetic imagery."""

import jax.numpy as jnp
import numpy as np
import pytest

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

NS = 1_000_000_000


@pytest.mark.slow
def test_full_vision_tracking():
    params = read_config("/root/reference/config/config_fpga_p2_euroc.yaml")
    params.optimization.max_num_keypoints = 200
    params.optimization.detection_threshold = 15.0

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    # slow, gentle motion for reliable tracking; dense near-field landmarks
    traj = simulate_trajectory(duration=2.0, seed=31, motion_scale=0.25)
    lms = make_landmarks(traj, 260, seed=32, radius=(4.0, 8.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)

    frame_dt = 0.1
    n_frames = 14
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        T_WS = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        for cam in range(2):
            T_WC = kin.compose(T_WS, rig.camera_T_SC(cam))
            img = render_world_image(rig.specs[cam], rig.intrinsics[cam], T_WC, lms)
            vio.add_image(t_ns, cam, img)
        vio.wait_idle(timeout=120)

    vio.shutdown()
    assert len(vio.trajectory) >= n_frames - 3, f"tracked {len(vio.trajectory)} frames"

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_p, gt_ts, traj.r)
    assert ate is not None
    # real detection/matching on rendered imagery: allow a looser bound
    assert ate < 0.15, f"full-vision ATE {ate:.4f} m"
    # enough landmarks must have been created and tracked
    assert vio.estimator.num_landmarks() > 30

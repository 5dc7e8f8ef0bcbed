"""Full-vision tracking over NATURAL texture: the camera flies above a plane
textured with the reference repo's checked-in test image
(/root/reference/okvis_multisensor_processing/test/testImage.jpg) — realistic
gradients/corners instead of synthetic dot patterns."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from okvis_tpu import kinematics as kin
from okvis_tpu.cameras import NCameraSystem
from okvis_tpu.config import read_config
from okvis_tpu.datasets.synthetic import (
    euroc_stereo_rig,
    render_textured_plane,
    simulate_trajectory,
)
from okvis_tpu.eval import ate_rmse
from okvis_tpu.pipeline import ThreadedVio

NS = 1_000_000_000


@pytest.mark.slow
def test_vio_over_textured_plane():
    params = read_config("/root/reference/config/config_fpga_p2_euroc.yaml")
    params.optimization.max_num_keypoints = 200
    params.optimization.detection_threshold = 25.0

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    texture = np.asarray(
        Image.open("/root/reference/okvis_multisensor_processing/test/testImage.jpg"),
        dtype=np.float32,
    )

    # gentle downward-looking flight 3 m above the plane
    traj = simulate_trajectory(duration=1.6, seed=81, motion_scale=0.2)
    # camera looks along +z of S after T_SC; offset trajectory upward and
    # flip to look down: apply a 180° roll so +z_C points at the plane
    q_down = jnp.asarray([1.0, 0.0, 0.0, 0.0])  # 180° about x

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    frame_dt = 0.1
    n_frames = 12
    imu_i = 0
    gt = []
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            # conjugate body-frame measurements into the flipped body frame
            # (180° roll about x: y/z components negate)
            g = traj.gyro[imu_i] * np.asarray([1.0, -1.0, -1.0])
            a = traj.acc[imu_i] * np.asarray([1.0, -1.0, -1.0])
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), g, a)
            imu_i += 1
        # world pose: trajectory + 3 m height, orientation composed with the
        # downward flip so the camera sees the plane
        T_WS = kin.SE3(
            r=jnp.asarray(traj.r[idx] + np.asarray([0.0, 0.0, 3.0])),
            q=kin.quat_multiply(jnp.asarray(traj.q[idx]), q_down),
        )
        gt.append((t_ns, np.asarray(T_WS.r)))
        for cam in range(2):
            T_WC = kin.compose(T_WS, rig.camera_T_SC(cam))
            img = render_textured_plane(
                rig.specs[cam], rig.intrinsics[cam], T_WC, texture,
                plane_scale=150.0,
            )
            vio.add_image(t_ns, cam, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    assert len(vio.trajectory) >= n_frames - 2
    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = np.asarray([t for t, _ in gt])
    gt_p = np.stack([p for _, p in gt])
    ate = ate_rmse(est_ts, est_p, gt_ts, gt_p)
    assert ate is not None
    assert ate < 0.15, f"textured-plane ATE {ate:.4f} m"
    assert vio.estimator.num_landmarks() > 30

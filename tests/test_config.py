"""Config reader test: must consume the stock EuRoC reference config verbatim
(compat goal, SURVEY.md §5.6)."""

import numpy as np
import pytest

REFERENCE_CONFIG = "/root/reference/config/config_fpga_p2_euroc.yaml"


def test_read_reference_config():
    from okvis_tpu.config import read_config

    p = read_config(REFERENCE_CONFIG)
    assert len(p.cameras) == 2
    c0 = p.cameras[0]
    assert c0.image_dimension == (752, 480)
    assert c0.distortion_type == "radialtangential"
    np.testing.assert_allclose(c0.focal_length, (458.654880721, 457.296696463))
    assert c0.T_SC.shape == (4, 4)
    np.testing.assert_allclose(c0.T_SC[3], [0, 0, 0, 1], atol=1e-12)

    assert p.imu.g == 9.81007
    assert p.imu.imu_rate == 200
    assert p.imu.sigma_g_c == 12.0e-4
    assert p.optimization.num_keyframes == 5
    assert p.optimization.num_imu_frames == 3
    assert p.optimization.min_iterations == 3
    assert p.optimization.max_iterations == 10
    assert p.optimization.time_limit == 0.035
    assert p.optimization.max_num_keypoints == 400


def test_build_rig_and_imu():
    from okvis_tpu.config import build_imu_params, build_rig, read_config

    p = read_config(REFERENCE_CONFIG)
    rig = build_rig(p, compute_overlaps=True)
    assert rig.num_cameras == 2
    # EuRoC stereo overlaps
    assert rig.has_overlap(0, 1) and rig.has_overlap(1, 0)
    # rotation part is orthonormal after quaternion round trip
    import okvis_tpu.kinematics as kin
    import jax.numpy as jnp

    C = kin.quat_to_matrix(rig.T_SC.q[0])
    np.testing.assert_allclose(np.asarray(C), p.cameras[0].T_SC[:3, :3], atol=1e-9)

    imu = build_imu_params(p)
    assert float(imu.g) == 9.81007
    assert imu.rate == 200

"""Prior / drift factors: absolute pose, relative pose, speed-and-bias.

Re-derivations of the reference error terms:
- pose_error            (/root/reference/okvis_ceres/src/PoseError.cpp:86-139)
- relative_pose_error   (/root/reference/okvis_ceres/src/RelativePoseError.cpp:85-165)
- speed_and_bias_error  (/root/reference/okvis_ceres/src/SpeedAndBiasError.cpp)
- homogeneous_point_error (/root/reference/okvis_ceres/src/HomogeneousPointError.cpp)

Error conventions (identical to the reference):
  pose:     e = [r_meas - r_est ; 2*vec(q_meas * q_est^-1)], J = -I with the
            rotation block -plus(dq)[:3,:3].
  relative: e = [r1 - r0 ; 2*vec(q1 * q0^-1)]  (drift term between two
            extrinsics states; zero-measurement form).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..kinematics import so3
from ..kinematics.se3 import SE3


def sqrt_information(information: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular L^T with L L^T = information (ref setInformation)."""
    return jnp.linalg.cholesky(information).T


def pose_error(
    T_meas: SE3, sqrt_info: jnp.ndarray, T_est: SE3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """6-dim absolute pose prior. Returns (residual, J_minimal (6,6))."""
    dq = so3.quat_multiply(T_meas.q, so3.quat_conjugate(T_est.q))
    error = jnp.concatenate([T_meas.r - T_est.r, 2.0 * dq[:3]])
    J = -jnp.eye(6, dtype=error.dtype)
    J = J.at[3:6, 3:6].set(-so3.quat_left(dq)[:3, :3])
    return sqrt_info @ error, sqrt_info @ J


def relative_pose_error(
    sqrt_info: jnp.ndarray, T0: SE3, T1: SE3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """6-dim relative drift factor between two pose states (zero-measurement).

    Returns (residual, J0 (6,6), J1 (6,6))."""
    dq = so3.quat_multiply(T1.q, so3.quat_conjugate(T0.q))
    error = jnp.concatenate([T1.r - T0.r, 2.0 * dq[:3]])
    J0 = -jnp.eye(6, dtype=error.dtype)
    J0 = J0.at[3:6, 3:6].set(-so3.quat_left(dq)[:3, :3])
    J1 = jnp.eye(6, dtype=error.dtype)
    J1 = J1.at[3:6, 3:6].set(so3.quat_right(dq)[:3, :3])
    return sqrt_info @ error, sqrt_info @ J0, sqrt_info @ J1


def speed_and_bias_error(
    sb_meas: jnp.ndarray, sqrt_info: jnp.ndarray, sb_est: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """9-dim trivial prior: e = meas - est, J = -I."""
    residual = sqrt_info @ (sb_meas - sb_est)
    return residual, sqrt_info @ (-jnp.eye(9, dtype=sb_est.dtype))


def homogeneous_point_error(
    hp_meas: jnp.ndarray, sqrt_info: jnp.ndarray, hp_est: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-dim landmark prior on the Euclidean part: e = (meas - est)[:3]."""
    residual = sqrt_info @ (hp_meas[:3] - hp_est[:3])
    return residual, sqrt_info @ (-jnp.eye(3, dtype=hp_est.dtype))

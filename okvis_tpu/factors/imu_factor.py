"""IMU preintegration factor: 15-dim residual + analytic minimal Jacobians.

Re-derivation of the reference ImuError evaluation
(/root/reference/okvis_ceres/src/ImuError.cpp:506-683) on top of the
scan-based preintegration in okvis_tpu.imu.preintegration. The residual links
(T_WS0, sb0) -> (T_WS1, sb1) through the preintegrated increment, with
first-order bias correction via the dalpha/dv/dp bias sub-Jacobians (the
estimator re-preintegrates when the bias moves too far, mirroring the
reference's ‖Δb_g‖·Δt > 1e-4 rule — see estimator.py).

All functions operate on single factors; batch with vmap over the window's
S-1 IMU links.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..imu.preintegration import ImuParams, PreintegratedImu, gravity_vector
from ..kinematics import so3
from ..kinematics.se3 import SE3


class ImuFactorJacobians(NamedTuple):
    J_pose0: jnp.ndarray  # (15, 6)
    J_sb0: jnp.ndarray  # (15, 9)
    J_pose1: jnp.ndarray  # (15, 6)
    J_sb1: jnp.ndarray  # (15, 9)


def imu_error(
    params: ImuParams,
    pre: PreintegratedImu,
    T_WS0: SE3,
    sb0: jnp.ndarray,
    T_WS1: SE3,
    sb1: jnp.ndarray,
) -> Tuple[jnp.ndarray, ImuFactorJacobians]:
    """Weighted 15-dim residual + minimal Jacobians (ImuError.cpp:560-683).

    Residual ordering: [e_p(3), e_q(3), e_v(3), e_bg(3), e_ba(3)], weighted by
    the preintegrated sqrt information.
    """
    dtype = sb0.dtype
    dt = pre.delta_t
    g_W = gravity_vector(params, dtype=dtype)

    C_WS0 = so3.quat_to_matrix(T_WS0.q)
    C_S0W = C_WS0.T
    v0, v1 = sb0[:3], sb1[:3]
    delta_b = sb0[3:9] - pre.sb_ref[3:9]
    db_g = delta_b[:3]

    delta_p_est_W = T_WS0.r - T_WS1.r + v0 * dt - 0.5 * g_W * dt * dt
    delta_v_est_W = v0 - v1 - g_W * dt
    # first-order bias-corrected orientation increment
    Dq = so3.quat_multiply(so3.delta_q(-(pre.dalpha_db_g @ db_g)), pre.delta_q)

    q1_inv = so3.quat_conjugate(T_WS1.q)
    q1inv_q0 = so3.quat_multiply(q1_inv, T_WS0.q)

    # Jacobian w.r.t. state 0 (F0, ImuError.cpp:566-585); columns
    # [δp0, δα0 | δv0, δb_g0, δb_a0]
    F0 = jnp.eye(15, dtype=dtype)
    F0 = F0.at[0:3, 0:3].set(C_S0W)
    F0 = F0.at[0:3, 3:6].set(C_S0W @ so3.cross_matrix(delta_p_est_W))
    F0 = F0.at[0:3, 6:9].set(C_S0W * dt)
    F0 = F0.at[0:3, 9:12].set(pre.dp_db_g)
    F0 = F0.at[0:3, 12:15].set(-pre.C_doubleintegral)
    F0 = F0.at[3:6, 3:6].set(
        (so3.quat_left(so3.quat_multiply(Dq, q1_inv)) @ so3.quat_right(T_WS0.q))[:3, :3]
    )
    F0 = F0.at[3:6, 9:12].set(
        (so3.quat_right(q1inv_q0) @ so3.quat_right(Dq))[:3, :3] @ (-pre.dalpha_db_g)
    )
    F0 = F0.at[6:9, 3:6].set(C_S0W @ so3.cross_matrix(delta_v_est_W))
    F0 = F0.at[6:9, 6:9].set(C_S0W)
    F0 = F0.at[6:9, 9:12].set(pre.dv_db_g)
    F0 = F0.at[6:9, 12:15].set(-pre.C_integral)

    # Jacobian w.r.t. state 1 (F1, ImuError.cpp:588-594)
    F1 = -jnp.eye(15, dtype=dtype)
    F1 = F1.at[0:3, 0:3].set(-C_S0W)
    F1 = F1.at[3:6, 3:6].set(
        -(
            so3.quat_left(Dq) @ so3.quat_right(T_WS0.q) @ so3.quat_left(q1_inv)
        )[:3, :3]
    )
    F1 = F1.at[6:9, 6:9].set(-C_S0W)

    error = jnp.concatenate(
        [
            C_S0W @ delta_p_est_W + pre.acc_doubleintegral + F0[0:3, 9:15] @ delta_b,
            2.0 * so3.quat_multiply(Dq, q1inv_q0)[:3],
            C_S0W @ delta_v_est_W + pre.acc_integral + F0[6:9, 9:15] @ delta_b,
            sb0[3:9] - sb1[3:9],
        ]
    )

    W = pre.sqrt_info
    residual = W @ error
    return residual, ImuFactorJacobians(
        J_pose0=W @ F0[:, 0:6],
        J_sb0=W @ F0[:, 6:15],
        J_pose1=W @ F1[:, 0:6],
        J_sb1=W @ F1[:, 6:15],
    )

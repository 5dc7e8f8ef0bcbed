"""Reprojection factor: 2-dim residual + analytic minimal Jacobians.

Re-derivation of the reference ReprojectionError<CAMERA>
(/root/reference/okvis_ceres/include/okvis/ceres/implementation/
ReprojectionError.hpp:87-242): transform the homogeneous world landmark
through T_CS · T_SW, project with the camera Jacobian, weight by the sqrt
information. Points closer than 20 cm / behind the camera zero the Jacobians
but keep the residual (same semantics as the reference's `valid` flag).

Single-factor functions; the solver vmaps over all observations of a window
at once — one fused XLA program instead of per-residual virtual calls.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..cameras import pinhole
from ..cameras.pinhole import CameraSpec
from ..kinematics import so3
from ..kinematics.se3 import SE3


class ReprojectionJacobians(NamedTuple):
    J_pose: jnp.ndarray  # (2, 6)  w.r.t. T_WS minimal
    J_hp: jnp.ndarray  # (2, 3)   w.r.t. landmark (Euclidean-style on first 3)
    J_ext: jnp.ndarray  # (2, 6)  w.r.t. T_SC minimal


def reprojection_error(
    spec: CameraSpec,
    intrinsics: jnp.ndarray,
    kp: jnp.ndarray,  # (2,) measured keypoint
    sqrt_info: jnp.ndarray,  # (2,2) or scalar isotropic weight
    T_WS: SE3,
    hp_W: jnp.ndarray,  # (4,) homogeneous landmark in W
    T_SC: SE3,
) -> Tuple[jnp.ndarray, ReprojectionJacobians, jnp.ndarray]:
    """Returns (weighted 2-residual, minimal Jacobians, valid flag)."""
    dtype = hp_W.dtype
    sqrt_info = jnp.asarray(sqrt_info, dtype=dtype)
    if sqrt_info.ndim == 0:
        sqrt_info = sqrt_info * jnp.eye(2, dtype=dtype)

    C_SC = so3.quat_to_matrix(T_SC.q)
    C_CS = C_SC.T
    C_WS = so3.quat_to_matrix(T_WS.q)
    C_SW = C_WS.T

    # hp_S = T_SW hp_W ; hp_C = T_CS hp_S
    hp_S = jnp.concatenate(
        [C_SW @ (hp_W[:3] - T_WS.r * hp_W[3]), hp_W[3:4]]
    )
    hp_C = jnp.concatenate(
        [C_CS @ (hp_S[:3] - T_SC.r * hp_S[3]), hp_S[3:4]]
    )

    uv, _flags = pinhole.project_homogeneous(spec, intrinsics, hp_C)
    Jh = pinhole.project_homogeneous_jacobian(spec, intrinsics, hp_C)
    Jh_w = sqrt_info @ Jh

    residual = sqrt_info @ (kp - uv)

    # validity: point at least 20 cm in front (ReprojectionError.hpp:144-152)
    w = hp_C[3]
    z_over_w = hp_C[2] / jnp.where(jnp.abs(w) > 1e-8, w, 1.0)
    valid = ~((jnp.abs(w) > 1e-8) & (z_over_w < 0.2))

    # 4x4 homogeneous transforms for chain rule
    def hmat(C, t):
        T = jnp.zeros((4, 4), dtype=dtype)
        T = T.at[:3, :3].set(C)
        T = T.at[:3, 3].set(t)
        T = T.at[3, 3].set(1.0)
        return T

    T_CS_m = hmat(C_CS, -C_CS @ T_SC.r)
    T_SW_m = hmat(C_SW, -C_SW @ T_WS.r)

    # w.r.t. T_WS (ReprojectionError.hpp:157-170)
    p_w = hp_W[:3] - T_WS.r * hp_W[3]
    J_pose_4x6 = jnp.zeros((4, 6), dtype=dtype)
    J_pose_4x6 = J_pose_4x6.at[:3, :3].set(C_SW * hp_W[3])
    J_pose_4x6 = J_pose_4x6.at[:3, 3:6].set(-C_SW @ so3.cross_matrix(p_w))
    J_pose = Jh_w @ T_CS_m @ J_pose_4x6

    # w.r.t. landmark (Euclidean perturbation of first 3 homogeneous coords)
    J_hp = (-Jh_w @ (T_CS_m @ T_SW_m))[:, :3]

    # w.r.t. T_SC
    p_s = hp_S[:3] - T_SC.r * hp_S[3]
    J_ext_4x6 = jnp.zeros((4, 6), dtype=dtype)
    J_ext_4x6 = J_ext_4x6.at[:3, :3].set(C_CS * hp_S[3])
    J_ext_4x6 = J_ext_4x6.at[:3, 3:6].set(-C_CS @ so3.cross_matrix(p_s))
    J_ext = Jh_w @ J_ext_4x6

    z = jnp.where(valid, 1.0, 0.0).astype(dtype)
    return residual, ReprojectionJacobians(
        J_pose=J_pose * z, J_hp=J_hp * z, J_ext=J_ext * z
    ), valid

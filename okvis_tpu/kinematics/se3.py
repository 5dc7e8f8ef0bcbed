"""Batched SE(3) transformations as (r, q) pairs.

Matches the reference convention (/root/reference/okvis_kinematics/include/
okvis/kinematics/Transformation.hpp and implementation/Transformation.hpp):

- A transformation T_AB is the pair ``(r_AB, q_AB)``: ``p_A = C(q_AB) p_B + r_AB``.
- ``oplus(T, delta)`` applies the 6-dim minimal update (left/world-frame
  perturbation): ``r += delta[:3]; q = delta_q(delta[3:]) * q``
  (implementation/Transformation.hpp:248-263).
- ``minus(T0, T1) = [r1 - r0; 2*vec(q1 * q0^-1)]``
  (okvis_ceres/src/PoseLocalParameterization.cpp:103-116).
- ``oplus_jacobian`` (7x6) and ``lift_jacobian`` (6x7) as in
  implementation/Transformation.hpp:276-310; lift is the pseudo-inverse of plus.

Rather than a class, SE(3) elements are plain pytrees: a NamedTuple of
``r: (...,3)`` and ``q: (...,4)`` — so they nest in jit/vmap/scan freely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Rigid transform T_AB = (r_AB, q_AB); q in xyzw order."""

    r: jnp.ndarray  # (..., 3)
    q: jnp.ndarray  # (..., 4) xyzw

    @property
    def C(self) -> jnp.ndarray:
        return so3.quat_to_matrix(self.q)

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix."""
        C = self.C
        batch = self.r.shape[:-1]
        T = jnp.zeros(batch + (4, 4), dtype=self.r.dtype)
        T = T.at[..., :3, :3].set(C)
        T = T.at[..., :3, 3].set(self.r)
        T = T.at[..., 3, 3].set(1.0)
        return T


def identity(batch_shape=(), dtype=jnp.float64) -> SE3:
    return SE3(
        r=jnp.zeros(batch_shape + (3,), dtype=dtype),
        q=so3.quat_identity(batch_shape, dtype=dtype),
    )


def from_matrix(T: jnp.ndarray) -> SE3:
    return SE3(r=T[..., :3, 3], q=so3.matrix_to_quat(T[..., :3, :3]))


def compose(T_AB: SE3, T_BC: SE3) -> SE3:
    """T_AC = T_AB * T_BC (implementation/Transformation.hpp:222-225)."""
    return SE3(
        r=so3.quat_rotate(T_AB.q, T_BC.r) + T_AB.r,
        q=so3.quat_multiply(T_AB.q, T_BC.q),
    )


def inverse(T_AB: SE3) -> SE3:
    """T_BA = (-C^T r, q^-1) (implementation/Transformation.hpp:172-175)."""
    q_inv = so3.quat_conjugate(T_AB.q)
    return SE3(r=-so3.quat_rotate(q_inv, T_AB.r), q=q_inv)


def transform_point(T_AB: SE3, p_B: jnp.ndarray) -> jnp.ndarray:
    """p_A = C p_B + r."""
    return so3.quat_rotate(T_AB.q, p_B) + T_AB.r


def transform_hpoint(T_AB: SE3, hp_B: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 4-vector transform: [C h[:3] + r*h[3]; h[3]]."""
    s = hp_B[..., 3:4]
    top = so3.quat_rotate(T_AB.q, hp_B[..., :3]) + T_AB.r * s
    return jnp.concatenate([top, s], axis=-1)


def oplus(T: SE3, delta: jnp.ndarray) -> SE3:
    """Minimal 6-dim update: r += dr, q = delta_q(dalpha)*q, renormalized."""
    dq = so3.delta_q(delta[..., 3:6])
    return SE3(
        r=T.r + delta[..., :3],
        q=so3.quat_normalize(so3.quat_multiply(dq, T.q)),
    )


def minus(T0: SE3, T1: SE3) -> jnp.ndarray:
    """Minimal difference so that oplus(T0, minus(T0, T1)) ≈ T1 to 1st order.

    [r1 - r0; 2*vec(q1*q0^-1)] (PoseLocalParameterization.cpp:103-116).
    """
    dq = so3.quat_multiply(T1.q, so3.quat_conjugate(T0.q))
    return jnp.concatenate([T1.r - T0.r, 2.0 * dq[..., :3]], axis=-1)


def oplus_jacobian(T: SE3) -> jnp.ndarray:
    """d(T⊞delta)/d(delta) at delta=0: (..., 7, 6).

    [[I3, 0], [0, quat_right(q) @ 0.5*S]] with S = [I3; 0] (Transformation.hpp:276-293).
    Row layout of the 7-vector is [r(3); q(xyzw)(4)].
    """
    batch = T.r.shape[:-1]
    dtype = T.r.dtype
    J = jnp.zeros(batch + (7, 6), dtype=dtype)
    J = J.at[..., :3, :3].set(jnp.eye(3, dtype=dtype))
    S = jnp.zeros((4, 3), dtype=dtype).at[:3, :3].set(0.5 * jnp.eye(3, dtype=dtype))
    J = J.at[..., 3:7, 3:6].set(so3.quat_right(T.q) @ S)
    return J


def lift_jacobian(T: SE3) -> jnp.ndarray:
    """Minimal-from-ambient lift: (..., 6, 7), pseudo-inverse of oplus_jacobian.

    [[I3, 0], [0, 2*quat_right(q^-1)[0:3, 0:4]]] (Transformation.hpp:296-308).
    """
    batch = T.r.shape[:-1]
    dtype = T.r.dtype
    J = jnp.zeros(batch + (6, 7), dtype=dtype)
    J = J.at[..., :3, :3].set(jnp.eye(3, dtype=dtype))
    Qr = so3.quat_right(so3.quat_conjugate(T.q))
    J = J.at[..., 3:6, 3:7].set(2.0 * Qr[..., :3, :4])
    return J

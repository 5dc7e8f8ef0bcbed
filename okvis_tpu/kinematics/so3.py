"""Batched quaternion / SO(3) operations.

Conventions match the reference implementation
(/root/reference/okvis_kinematics/include/okvis/kinematics/operators.hpp,
 implementation/Transformation.hpp:46-85):

- Quaternions are stored as (..., 4) arrays in **xyzw** order (Eigen coeffs
  order). Hamilton product, active rotations: ``C(q) @ v`` rotates v from the
  local frame into the frame q is expressed in (q_AB rotates B-vectors to A).
- ``delta_q(da) = [sinc(|da|/2) * da/2, cos(|da|/2)]`` — the exponential map
  used by the reference's ``oplus`` (left perturbation).
- ``quat_left(q)`` is the reference's ``plus(q)``  : q1*q2 = quat_left(q1) @ q2
- ``quat_right(q)`` is the reference's ``oplus(q)``: q1*q2 = quat_right(q2) @ q1
- ``right_jacobian`` follows Forster et al. RSS 2015 eq. (8) as in
  implementation/Transformation.hpp:70-85.

All functions broadcast over leading batch dimensions and are dtype-polymorphic
(f32 on TPU, f64 in tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with a 6th-order Taylor series near zero (ref sinc, Transformation.hpp:46-57)."""
    small = jnp.abs(x) < 1e-6
    # Avoid 0/0 in the untaken branch (grad-safe "double where").
    safe_x = jnp.where(small, jnp.ones_like(x), x)
    x2 = x * x
    series = 1.0 - x2 / 6.0 + (x2 * x2) / 120.0 - (x2 * x2 * x2) / 5040.0
    return jnp.where(small, series, jnp.sin(safe_x) / safe_x)


def safe_norm(v: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    """||v|| with finite gradients at v=0 (sqrt(sum(v²)+tiny)).

    The tiny offset is below one ulp of any value of interest but makes the
    derivative at exactly zero come out 0 instead of NaN — required because
    delta_q / right_jacobian get differentiated at delta=0 in every factor
    Jacobian.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(sq + jnp.finfo(v.dtype).tiny)


def quat_identity(batch_shape=(), dtype=jnp.float64) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, xyzw storage."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse for unit quaternions: negate vector part."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


quat_inverse = quat_conjugate


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix C(q), shape (..., 3, 3); C(q_AB) maps B-vectors to A."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(C: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (xyzw), branch-free Shepperd method.

    Computes all four candidate quaternions and selects the best-conditioned
    one with jnp.where (XLA-friendly; no data-dependent control flow).
    """
    m00, m01, m02 = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    m10, m11, m12 = C[..., 1, 0], C[..., 1, 1], C[..., 1, 2]
    m20, m21, m22 = C[..., 2, 0], C[..., 2, 1], C[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component² (always >= 0).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)  # wxyz-ish packs
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # candidates[..., k, :] is (w, x, y, z) * 4c_k
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)
    norms = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(norms, axis=-1)
    sel = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)
    sel = jnp.squeeze(sel, axis=-2)  # (..., 4) in (w,x,y,z)
    q = jnp.stack([sel[..., 1], sel[..., 2], sel[..., 3], sel[..., 0]], axis=-1)
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q without forming the matrix."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def delta_q(d_alpha: jnp.ndarray) -> jnp.ndarray:
    """Exponential map used by the reference oplus (Transformation.hpp:61-68).

    delta_q(da) = [sinc(|da|/2)*da/2 ; cos(|da|/2)] in xyzw.
    """
    half = 0.5 * safe_norm(d_alpha, axis=-1, keepdims=True)
    vec = sinc(half) * 0.5 * d_alpha
    w = jnp.cos(half)
    return jnp.concatenate([vec, w], axis=-1)


def cross_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [v]x, shape (..., 3, 3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_left(q: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplication matrix: q1*q2 = quat_left(q1) @ q2 (ref plus(), operators.hpp:95-106)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([w, -z, y, x], axis=-1),
            jnp.stack([z, w, -x, y], axis=-1),
            jnp.stack([-y, x, w, z], axis=-1),
            jnp.stack([-x, -y, -z, w], axis=-1),
        ],
        axis=-2,
    )


def quat_right(q: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplication matrix: q1*q2 = quat_right(q2) @ q1 (ref oplus(), operators.hpp:108-119)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([w, z, -y, x], axis=-1),
            jnp.stack([-z, w, x, y], axis=-1),
            jnp.stack([y, -x, w, z], axis=-1),
            jnp.stack([-x, -y, -z, w], axis=-1),
        ],
        axis=-2,
    )


def right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian J_r(phi), Forster RSS'15 eq. 8 (Transformation.hpp:70-85).

    J_r = I - (1-cos|phi|)/|phi|² [phi]x + (|phi|-sin|phi|)/|phi|³ [phi]x²
    with the small-angle series I - 0.5 [phi]x + 1/6 [phi]x².
    """
    norm = safe_norm(phi, axis=-1)
    Px = cross_matrix(phi)
    Px2 = Px @ Px
    small = norm < 1e-4
    safe = jnp.where(small, jnp.ones_like(norm), norm)
    c1 = jnp.where(small, 0.5, (1.0 - jnp.cos(safe)) / (safe * safe))
    c2 = jnp.where(small, 1.0 / 6.0, (safe - jnp.sin(safe)) / (safe**3))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - c1[..., None, None] * Px + c2[..., None, None] * Px2

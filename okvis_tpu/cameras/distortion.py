"""Distortion models as pure, batched jnp functions.

TPU-native re-design of the reference distortion classes
(/root/reference/okvis_cv/include/okvis/cameras/RadialTangentialDistortion.hpp,
RadialTangentialDistortion8.hpp, EquidistantDistortion.hpp, NoDistortion.hpp):
each model is a pair of functions

    distort(params, xy)   -> distorted normalized image coords
    undistort(params, xy) -> inverse via a fixed 5-iteration Gauss-Newton solve
                             (same bounded iteration count as the reference,
                             implementation/RadialTangentialDistortion.hpp:210-242
                             — already XLA-friendly)

operating on (..., 2) arrays of normalized image-plane coordinates. Jacobians
come from jax.jacfwd at the call site (exact, fused by XLA) instead of
hand-derived expressions.

Parameter layouts (matching the reference YAML order):
    radtan      : [k1, k2, p1, p2]
    radtan8     : [k1, k2, p1, p2, k3, k4, k5, k6]   (rational model)
    equidistant : [k1, k2, k3, k4]                    (fisheye theta-poly)
    none        : []
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_DIST_PARAMS = {"none": 0, "radtan": 4, "radtan8": 8, "equidistant": 4}


def distort_none(params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    del params
    return xy


def distort_radtan(params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Brown-Conrady k1,k2,p1,p2 (ref RadialTangentialDistortion::distort)."""
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x, y = xy[..., 0], xy[..., 1]
    x2, y2, xy_ = x * x, y * y, x * y
    r2 = x2 + y2
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2)
    yd = y * radial + p1 * (r2 + 2.0 * y2) + 2.0 * p2 * xy_
    return jnp.stack([xd, yd], axis=-1)


def distort_radtan8(params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Rational 8-parameter model (ref RadialTangentialDistortion8)."""
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k3, k4, k5, k6 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    x, y = xy[..., 0], xy[..., 1]
    x2, y2, xy_ = x * x, y * y, x * y
    r2 = x2 + y2
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    xd = x * radial + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2)
    yd = y * radial + p1 * (r2 + 2.0 * y2) + 2.0 * p2 * xy_
    return jnp.stack([xd, yd], axis=-1)


def distort_equidistant(params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Fisheye equidistant k1..k4 (ref EquidistantDistortion::distort)."""
    k1, k2, k3, k4 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x, y = xy[..., 0], xy[..., 1]
    sq = x * x + y * y
    r = jnp.sqrt(sq + jnp.finfo(xy.dtype).tiny)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    # scale = theta_d / r; near r=0 the limit is theta_d'(0) ≈ 1
    scale = jnp.where(r < 1e-8, jnp.ones_like(r), theta_d / jnp.where(r < 1e-8, 1.0, r))
    return xy * scale[..., None]


_DISTORT_FNS = {
    "none": distort_none,
    "radtan": distort_radtan,
    "radtan8": distort_radtan8,
    "equidistant": distort_equidistant,
}


def distort(dist_type: str, params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    return _DISTORT_FNS[dist_type](params, xy)


def distort_jacobian(dist_type: str, params: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """d(distort)/d(xy), shape (..., 2, 2); single-point xy (vmap for batches)."""
    fn = _DISTORT_FNS[dist_type]
    return jax.jacfwd(lambda p: fn(params, p))(xy)


def undistort(dist_type: str, params: jnp.ndarray, xy_d: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Invert distort() by `iters` Gauss-Newton steps (ref undistort uses 5).

    Operates on a single point (vmap over batches); returns undistorted coords.
    """
    fn = _DISTORT_FNS[dist_type]
    if dist_type == "none":
        return xy_d

    def body(_, x):
        e = fn(params, x) - xy_d
        J = jax.jacfwd(lambda p: fn(params, p))(x)
        # 2x2 solve: x -= J^-1 e
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        dx = inv_det * jnp.stack(
            [J[1, 1] * e[0] - J[0, 1] * e[1], -J[1, 0] * e[0] + J[0, 0] * e[1]]
        )
        return x - dx

    return jax.lax.fori_loop(0, iters, body, xy_d)

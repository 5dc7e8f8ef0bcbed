"""Pinhole camera with pluggable distortion — pure functions over a static spec.

TPU-native re-design of the reference PinholeCamera<DISTORTION>
(/root/reference/okvis_cv/include/okvis/cameras/PinholeCamera.hpp,
implementation/PinholeCamera.hpp:108-226): the camera is split into a
hashable static spec (distortion type + image size, drives tracing) and a
dynamic intrinsics vector [fu, fv, cu, cv, d0..dK-1] that can live on device
and be optimized (online calibration). All functions operate on single points
and are vmap/jit-composable; Jacobians via jax.jacfwd (exact).

Projection status is returned as a bitmask-free pair (uv, flags) where flags
is a small int32: 0=successful, 1=invalid (singular/distortion fail),
2=outside image, 4=behind camera — mirroring CameraBase::ProjectionStatus.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import distortion as dist

# Projection status flag bits (combinable).
STATUS_OK = 0
STATUS_INVALID = 1
STATUS_OUTSIDE = 2
STATUS_BEHIND = 4


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    """Static (hashable) part of a camera model: drives jit specialization."""

    width: int
    height: int
    dist_type: str  # 'none' | 'radtan' | 'radtan8' | 'equidistant'

    @property
    def num_intrinsics(self) -> int:
        return 4 + dist.NUM_DIST_PARAMS[self.dist_type]


def intrinsics_vector(fu, fv, cu, cv, dist_params=()) -> jnp.ndarray:
    return jnp.asarray([fu, fv, cu, cv, *dist_params])


def project(spec: CameraSpec, intrinsics: jnp.ndarray, p_C: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project Euclidean camera-frame point -> pixel (uv, status_flags).

    Mirrors implementation/PinholeCamera.hpp:108-145: divide by z, distort,
    scale+offset; status accumulates invalid/outside/behind bits.
    """
    fu, fv, cu, cv = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    dparams = intrinsics[4:]
    z = p_C[..., 2]
    singular = jnp.abs(z) < 1e-12
    rz = 1.0 / jnp.where(singular, jnp.ones_like(z), z)
    xy = p_C[..., :2] * rz[..., None]
    xy_d = dist.distort(spec.dist_type, dparams, xy)
    u = fu * xy_d[..., 0] + cu
    v = fv * xy_d[..., 1] + cv
    uv = jnp.stack([u, v], axis=-1)
    inside = (
        (u >= -0.5) & (u <= spec.width - 0.5) & (v >= -0.5) & (v <= spec.height - 0.5)
    )
    flags = (
        jnp.where(singular, STATUS_INVALID, 0)
        + jnp.where(~inside, STATUS_OUTSIDE, 0)
        + jnp.where(z <= 0.0, STATUS_BEHIND, 0)
    ).astype(jnp.int32)
    return uv, flags


def project_homogeneous(spec: CameraSpec, intrinsics: jnp.ndarray, hp_C: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project homogeneous point: flips direction for negative scale
    (ref CameraBase::projectHomogeneous)."""
    s = hp_C[..., 3]
    p = jnp.where(s[..., None] < 0, -hp_C[..., :3], hp_C[..., :3])
    return project(spec, intrinsics, p)


def project_jacobian_point(spec: CameraSpec, intrinsics: jnp.ndarray, p_C: jnp.ndarray
                           ) -> jnp.ndarray:
    """d(uv)/d(p_C): (2, 3) for a single point."""
    return jax.jacfwd(lambda p: project(spec, intrinsics, p)[0])(p_C)


def project_homogeneous_jacobian(spec: CameraSpec, intrinsics: jnp.ndarray, hp_C: jnp.ndarray
                                 ) -> jnp.ndarray:
    """d(uv)/d(hp_C): (2, 4) for a single homogeneous point (ref Jh)."""
    return jax.jacfwd(lambda hp: project_homogeneous(spec, intrinsics, hp)[0])(hp_C)


def project_jacobian_intrinsics(spec: CameraSpec, intrinsics: jnp.ndarray, p_C: jnp.ndarray
                                ) -> jnp.ndarray:
    """d(uv)/d(intrinsics): (2, 4+K) for online calibration."""
    return jax.jacfwd(lambda i: project(spec, i, p_C)[0])(intrinsics)


def back_project(spec: CameraSpec, intrinsics: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> unit-z ray direction (x, y, 1) via iterative undistort
    (ref PinholeCamera::backProject)."""
    fu, fv, cu, cv = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    dparams = intrinsics[4:]
    xy_d = jnp.stack([(uv[..., 0] - cu) / fu, (uv[..., 1] - cv) / fv], axis=-1)
    xy = dist.undistort(spec.dist_type, dparams, xy_d)
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)

"""Named local parameterizations (reference PoseLocalParameterization family).

TPU-native counterpart of
/root/reference/okvis_ceres/src/PoseLocalParameterization.cpp:52-468 and
/root/reference/okvis_ceres/src/HomogeneousPointLocalParameterization.cpp:59-135.
Each parameterization is a pure-function namespace over jnp arrays (batched
over leading dims), so the solver can use them directly and tests can verify
plus/minus/plusJacobian/liftJacobian identities numerically — the analog of
LocalParamizationAdditionalInterfaces::verify()
(/root/reference/okvis_ceres/src/LocalParamizationAdditionalInterfaces.cpp:1-82).

The subset variants select minimal coordinates out of the full SE(3) tangent
[dr(3); dalpha(3)] exactly as the reference does:
    Pose6d : [0,1,2,3,4,5]   full pose
    Pose3d : [3,4,5]         orientation only (translation frozen)
    Pose4d : [0,1,2,5]       translation + yaw (roll/pitch frozen)
    Pose2d : [3,4]           roll/pitch only
These selections also drive the solver's per-dim masks (solver.optimize
dense_dim_mask), which is how the fixed-subset semantics enter the batched
normal equations.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import se3
from .se3 import SE3


def _pose_to_vec(T: SE3) -> jnp.ndarray:
    """[r(3); q(xyzw)(4)] 7-vector, the reference parameter-block storage."""
    return jnp.concatenate([T.r, T.q], axis=-1)


def _vec_to_pose(x: jnp.ndarray) -> SE3:
    return SE3(r=x[..., :3], q=x[..., 3:7])


@dataclasses.dataclass(frozen=True)
class PoseParameterization:
    """SE(3) block parameterization with a minimal-coordinate subset.

    global_size = 7 ([r, q_xyzw]); local_size = len(selection).
    """

    selection: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    name: str = "Pose6d"

    @property
    def global_size(self) -> int:
        return 7

    @property
    def local_size(self) -> int:
        return len(self.selection)

    def _expand(self, delta: jnp.ndarray) -> jnp.ndarray:
        """Scatter the minimal delta into the full 6-dim tangent."""
        full = jnp.zeros(delta.shape[:-1] + (6,), delta.dtype)
        return full.at[..., jnp.asarray(self.selection)].set(delta)

    def plus(self, x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        """x ⊞ delta (right perturbation, ref Transformation::oplus)."""
        return _pose_to_vec(se3.oplus(_vec_to_pose(x), self._expand(delta)))

    def minus(self, x: jnp.ndarray, x_plus: jnp.ndarray) -> jnp.ndarray:
        """Minimal difference [Δr; 2·vec(q1 q0⁻¹)] restricted to the subset
        (ref PoseLocalParameterization::Minus semantics)."""
        d6 = se3.minus(_vec_to_pose(x), _vec_to_pose(x_plus))
        return d6[..., jnp.asarray(self.selection)]

    def plus_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        """(…,7,local) Jacobian of plus at delta=0 — the subset columns of the
        full 7×6 oplusJacobian (ref plusJacobian)."""
        J = se3.oplus_jacobian(_vec_to_pose(x))
        return J[..., jnp.asarray(self.selection)]

    def lift_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        """(…,local,7) minimal←global lift — the subset rows of the full 6×7
        liftJacobian (ref liftJacobian)."""
        J = se3.lift_jacobian(_vec_to_pose(x))
        return J[..., jnp.asarray(self.selection), :]

    def tangent_mask(self) -> np.ndarray:
        """(6,) bool mask over [dr; dalpha] — feeds the solver's dense per-dim
        masks (the batched equivalent of registering this parameterization on
        a block)."""
        m = np.zeros(6, bool)
        m[list(self.selection)] = True
        return m

    def verify(self, x: jnp.ndarray, eps: float = None, tol: float = None) -> bool:
        """Numeric self-check of plus/minus/plusJacobian consistency
        (ref LocalParamizationAdditionalInterfaces::verify).

        Step/tolerance adapt to the active precision: without
        jax_enable_x64, jnp arrays are f32 and a 1e-7 central-difference
        step would vanish below f32 resolution."""
        x = jnp.asarray(x, jnp.float64)
        if x.dtype == jnp.float64:  # x64 enabled
            eps = 1e-7 if eps is None else eps
            tol = 1e-5 if tol is None else tol
        else:  # silently truncated to f32
            eps = 3e-4 if eps is None else eps
            tol = 3e-3 if tol is None else tol
        n = self.local_size
        # plus(x, 0) == x
        if not np.allclose(np.asarray(self.plus(x, jnp.zeros(n, x.dtype))), np.asarray(x), atol=tol):
            return False
        # minus(x, plus(x, d)) == d for small d
        d = 1e-4 * jnp.arange(1.0, n + 1.0, dtype=x.dtype)
        if not np.allclose(
            np.asarray(self.minus(x, self.plus(x, d))), np.asarray(d), atol=tol
        ):
            return False
        # plusJacobian vs central differences
        Jp = np.asarray(self.plus_jacobian(x))
        Jn = np.zeros_like(Jp)
        for i in range(n):
            dv = np.zeros(n)
            dv[i] = eps
            xp = np.asarray(self.plus(x, jnp.asarray(dv)))
            xm = np.asarray(self.plus(x, jnp.asarray(-dv)))
            Jn[:, i] = (xp - xm) / (2 * eps)
        if not np.allclose(Jp, Jn, atol=tol):
            return False
        # lift ∘ plusJacobian == identity on the minimal space
        JL = np.asarray(self.lift_jacobian(x))
        return np.allclose(JL @ Jp, np.eye(n), atol=tol)


# the four named variants of the reference
PoseLocalParameterization = PoseParameterization((0, 1, 2, 3, 4, 5), "Pose6d")
PoseLocalParameterization3d = PoseParameterization((3, 4, 5), "Pose3d")
PoseLocalParameterization4d = PoseParameterization((0, 1, 2, 5), "Pose4d")
PoseLocalParameterization2d = PoseParameterization((3, 4), "Pose2d")


@dataclasses.dataclass(frozen=True)
class HomogeneousPointParameterization:
    """4-param homogeneous point, 3 minimal Euclidean dims (ref
    HomogeneousPointLocalParameterization: Plus adds to the first three
    components, Minus subtracts them; 4×3 / 3×4 constant Jacobians)."""

    name: str = "HomogeneousPoint"

    @property
    def global_size(self) -> int:
        return 4

    @property
    def local_size(self) -> int:
        return 3

    def plus(self, x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        return x.at[..., :3].add(delta) if hasattr(x, "at") else x + jnp.pad(delta, (0, 1))

    def minus(self, x: jnp.ndarray, x_plus: jnp.ndarray) -> jnp.ndarray:
        return x_plus[..., :3] - x[..., :3]

    def plus_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        J = jnp.zeros(x.shape[:-1] + (4, 3), x.dtype)
        return J.at[..., :3, :].set(jnp.eye(3, dtype=x.dtype))

    def lift_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        J = jnp.zeros(x.shape[:-1] + (3, 4), x.dtype)
        return J.at[..., :, :3].set(jnp.eye(3, dtype=x.dtype))


HomogeneousPointLocalParameterization = HomogeneousPointParameterization()

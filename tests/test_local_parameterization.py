"""Named local parameterizations — numeric verification.

Analog of the reference's LocalParamizationAdditionalInterfaces::verify()
self-checks and TestEstimator's 4-way extrinsics-parameterization sweep
(/root/reference/okvis_ceres/src/PoseLocalParameterization.cpp:52-468).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu.kinematics import se3
from okvis_tpu.kinematics.local_parameterization import (
    HomogeneousPointLocalParameterization,
    PoseLocalParameterization,
    PoseLocalParameterization2d,
    PoseLocalParameterization3d,
    PoseLocalParameterization4d,
)

ALL_POSE = [
    PoseLocalParameterization,
    PoseLocalParameterization3d,
    PoseLocalParameterization4d,
    PoseLocalParameterization2d,
]


def random_pose_vec(rng):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    return jnp.asarray(np.concatenate([rng.normal(size=3), q]))


@pytest.mark.parametrize("param", ALL_POSE, ids=lambda p: p.name)
def test_verify_numeric(param, rng):
    for _ in range(5):
        assert param.verify(random_pose_vec(rng))


@pytest.mark.parametrize("param", ALL_POSE, ids=lambda p: p.name)
def test_sizes(param):
    assert param.global_size == 7
    assert param.local_size == len(param.selection)
    assert param.tangent_mask().sum() == param.local_size


def test_subset_semantics(rng):
    """3d freezes translation; 4d freezes roll/pitch; 2d freezes translation
    and yaw — measured in the full minimal difference."""
    x = random_pose_vec(rng)

    def full_minus(x, xp):
        return np.asarray(
            se3.minus(se3.SE3(r=x[:3], q=x[3:]), se3.SE3(r=xp[:3], q=xp[3:]))
        )

    d3 = full_minus(x, PoseLocalParameterization3d.plus(x, jnp.asarray([1e-3, 2e-3, -1e-3])))
    np.testing.assert_allclose(d3[:3], 0.0, atol=1e-12)  # translation frozen

    d4 = full_minus(x, PoseLocalParameterization4d.plus(x, jnp.asarray([1e-3, 2e-3, -1e-3, 5e-4])))
    np.testing.assert_allclose(d4[3:5], 0.0, atol=1e-9)  # roll/pitch frozen

    d2 = full_minus(x, PoseLocalParameterization2d.plus(x, jnp.asarray([1e-3, -2e-3])))
    np.testing.assert_allclose(d2[:3], 0.0, atol=1e-12)
    np.testing.assert_allclose(d2[5], 0.0, atol=1e-9)  # yaw frozen


def test_lift_plus_identity_full(rng):
    """lift ∘ plusJacobian = I on the minimal space, matching the reference's
    liftJacobian/plusJacobian contract."""
    x = random_pose_vec(rng)
    for param in ALL_POSE:
        Jp = np.asarray(param.plus_jacobian(x))
        Jl = np.asarray(param.lift_jacobian(x))
        np.testing.assert_allclose(Jl @ Jp, np.eye(param.local_size), atol=1e-10)


def test_homogeneous_point(rng):
    hp = jnp.asarray(np.append(rng.normal(size=3), 1.0))
    p = HomogeneousPointLocalParameterization
    assert p.global_size == 4 and p.local_size == 3
    d = jnp.asarray([0.1, -0.2, 0.3])
    hp2 = p.plus(hp, d)
    np.testing.assert_allclose(np.asarray(p.minus(hp, hp2)), np.asarray(d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(hp2[3]), np.asarray(hp[3]))
    Jp = np.asarray(p.plus_jacobian(hp))
    Jl = np.asarray(p.lift_jacobian(hp))
    np.testing.assert_allclose(Jl @ Jp, np.eye(3), atol=1e-14)

"""Reprojection/prior factor Jacobian checks — analogs of reference
TestReprojectionError.cpp:142 and TestHomogeneousPointError.cpp:104."""

import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import kinematics as kin
from okvis_tpu.cameras import CameraSpec, back_project, project
from okvis_tpu.factors import (
    homogeneous_point_error,
    pose_error,
    relative_pose_error,
    reprojection_error,
    speed_and_bias_error,
    sqrt_information,
)

SPEC = CameraSpec(752, 480, "radtan")
INTR = jnp.asarray(
    [458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739, 2e-4, 1.76e-5]
)


def rand_se3(rng, scale=1.0):
    return kin.SE3(
        r=jnp.asarray(scale * rng.normal(size=3)),
        q=kin.quat_normalize(jnp.asarray(rng.normal(size=4))),
    )


def num_jac_pose(apply, T, dim_out, h=1e-7):
    cols = []
    for k in range(6):
        d = jnp.zeros(6).at[k].set(h)
        cols.append((apply(kin.oplus(T, d)) - apply(kin.oplus(T, -d))) / (2 * h))
    return jnp.stack(cols, axis=-1)


def num_jac_vec(apply, x, dim_in, h=1e-7):
    cols = []
    for k in range(dim_in):
        d = jnp.zeros(dim_in).at[k].set(h)
        cols.append((apply(x + d) - apply(x - d)) / (2 * h))
    return jnp.stack(cols, axis=-1)


@pytest.fixture
def setup(rng):
    T_WS = rand_se3(rng)
    T_SC = kin.SE3(
        r=jnp.asarray([0.05, 0.01, -0.02]),
        q=kin.quat_normalize(jnp.asarray([0.02, -0.01, 0.03, 1.0])),
    )
    # landmark in front of the camera: backproject a pixel and transform to W
    uv_true = jnp.asarray([300.0, 200.0])
    ray_C = back_project(SPEC, INTR, uv_true) * 4.0
    p_W = kin.transform_point(kin.compose(T_WS, T_SC), ray_C)
    hp_W = jnp.concatenate([p_W, jnp.ones(1)])
    kp = uv_true + jnp.asarray(rng.normal(size=2))
    return T_WS, T_SC, hp_W, kp


def test_reprojection_residual_definition(setup):
    T_WS, T_SC, hp_W, kp = setup
    sqrt_info = 1.5
    res, J, valid = reprojection_error(SPEC, INTR, kp, sqrt_info, T_WS, hp_W, T_SC)
    assert bool(valid)
    # direct recomputation
    hp_C = kin.transform_hpoint(kin.inverse(kin.compose(T_WS, T_SC)), hp_W)
    uv, _ = project(SPEC, INTR, hp_C[:3] / hp_C[3])
    np.testing.assert_allclose(np.asarray(res), 1.5 * np.asarray(kp - uv), atol=1e-9)


def test_reprojection_jacobians_numeric(setup):
    T_WS, T_SC, hp_W, kp = setup
    sqrt_info = jnp.asarray([[2.0, 0.1], [0.0, 1.7]])

    def res_fn(T_ws, T_sc, hp):
        r, _, _ = reprojection_error(SPEC, INTR, kp, sqrt_info, T_ws, hp, T_sc)
        return r

    _, J, valid = reprojection_error(SPEC, INTR, kp, sqrt_info, T_WS, hp_W, T_SC)
    assert bool(valid)
    Jn_pose = num_jac_pose(lambda T: res_fn(T, T_SC, hp_W), T_WS, 2)
    Jn_ext = num_jac_pose(lambda T: res_fn(T_WS, T, hp_W), T_SC, 2)

    def hp_apply(d3):
        return res_fn(T_WS, T_SC, hp_W.at[:3].add(d3[:3]))

    Jn_hp = num_jac_vec(lambda x: hp_apply(x), jnp.zeros(3), 3)
    np.testing.assert_allclose(np.asarray(J.J_pose), np.asarray(Jn_pose), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(J.J_ext), np.asarray(Jn_ext), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(J.J_hp), np.asarray(Jn_hp), atol=1e-4, rtol=1e-5)


def test_reprojection_invalid_zeroes_jacobians(setup):
    T_WS, T_SC, hp_W, kp = setup
    # move the landmark behind the camera
    T_CW = kin.inverse(kin.compose(T_WS, T_SC))
    p_C = jnp.asarray([0.1, 0.1, -1.0])
    p_W = kin.transform_point(kin.inverse(T_CW), p_C)
    hp_bad = jnp.concatenate([p_W, jnp.ones(1)])
    _, J, valid = reprojection_error(SPEC, INTR, kp, 1.0, T_WS, hp_bad, T_SC)
    assert not bool(valid)
    assert float(jnp.max(jnp.abs(J.J_pose))) == 0.0
    assert float(jnp.max(jnp.abs(J.J_hp))) == 0.0


def test_pose_error_numeric(rng):
    T_meas, T_est = rand_se3(rng), rand_se3(rng)
    info = jnp.diag(jnp.asarray(rng.uniform(1, 100, 6)))
    W = sqrt_information(info)
    res, J = pose_error(T_meas, W, T_est)
    Jn = num_jac_pose(lambda T: pose_error(T_meas, W, T)[0], T_est, 6)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jn), atol=1e-5)
    # zero error at measurement
    res0, _ = pose_error(T_meas, W, T_meas)
    np.testing.assert_allclose(np.asarray(res0), np.zeros(6), atol=1e-12)


def test_relative_pose_error_numeric(rng):
    T0 = rand_se3(rng)
    T1 = kin.oplus(T0, 0.05 * jnp.asarray(rng.normal(size=6)))
    W = sqrt_information(jnp.eye(6) * 25.0)
    res, J0, J1 = relative_pose_error(W, T0, T1)
    Jn0 = num_jac_pose(lambda T: relative_pose_error(W, T, T1)[0], T0, 6)
    Jn1 = num_jac_pose(lambda T: relative_pose_error(W, T0, T)[0], T1, 6)
    np.testing.assert_allclose(np.asarray(J0), np.asarray(Jn0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(Jn1), atol=1e-5)


def test_speed_and_bias_error(rng):
    sb_meas = jnp.asarray(rng.normal(size=9))
    sb_est = jnp.asarray(rng.normal(size=9))
    W = sqrt_information(jnp.eye(9) * 4.0)
    res, J = speed_and_bias_error(sb_meas, W, sb_est)
    np.testing.assert_allclose(np.asarray(res), 2.0 * np.asarray(sb_meas - sb_est), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J), -2.0 * np.eye(9), atol=1e-12)


def test_homogeneous_point_error(rng):
    hp_meas = jnp.asarray([*rng.normal(size=3), 1.0])
    hp_est = jnp.asarray([*rng.normal(size=3), 1.0])
    W = sqrt_information(jnp.eye(3) * 9.0)
    res, J = homogeneous_point_error(hp_meas, W, hp_est)
    np.testing.assert_allclose(np.asarray(res), 3.0 * np.asarray(hp_meas - hp_est)[:3], atol=1e-12)

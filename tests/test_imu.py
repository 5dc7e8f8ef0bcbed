"""IMU preintegration/propagation/factor tests — analog of reference
TestImuError (/root/reference/okvis_ceres/test/TestImuError.cpp:66): synthetic
trajectory with analytic IMU, propagation accuracy, and analytic-vs-numeric
minimal Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import kinematics as kin
from okvis_tpu.factors import imu_error
from okvis_tpu.imu import (
    ImuParams,
    init_pose_from_imu,
    preintegrate,
    propagate,
)


def _np_quat_mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def _np_delta_q(da):
    half = 0.5 * np.linalg.norm(da)
    s = np.sinc(half / np.pi)
    return np.array([*(s * 0.5 * da), np.cos(half)])


def _np_quat_to_matrix(q):
    return np.asarray(kin.quat_to_matrix(jnp.asarray(q)))


def simulate_imu(duration=1.0, rate=200, fine_dt=1e-5, seed=7):
    """Sinusoidal trajectory; returns (ts, gyro, acc, states) where states
    maps t -> (T_WS, v_W) from fine integration (ground truth)."""
    rng = np.random.default_rng(seed)
    w_m = rng.uniform(0.5, 2.0, 3)  # angular velocity magnitudes/freqs
    a_m = rng.uniform(0.5, 2.0, 3)
    g = 9.81007

    def omega_S(t):
        return np.array(
            [
                w_m[0] * np.sin(1.3 * t + 0.3),
                w_m[1] * np.cos(0.7 * t),
                w_m[2] * np.sin(0.9 * t + 1.1),
            ]
        )

    def acc_W(t):  # world-frame acceleration
        return np.array(
            [
                a_m[0] * np.sin(2.1 * t),
                a_m[1] * np.cos(1.7 * t + 0.5),
                a_m[2] * np.sin(1.1 * t + 0.2),
            ]
        )

    # fine ground-truth integration
    n_fine = int(round(duration / fine_dt))
    q = np.array([0.0, 0.0, 0.0, 1.0])
    r = np.zeros(3)
    v = np.zeros(3)
    states = {0.0: (r.copy(), q.copy(), v.copy())}
    sample_every = int(round(1.0 / rate / fine_dt))
    ts, gyros, accs = [], [], []
    for i in range(n_fine + 1):
        t = i * fine_dt
        if i % sample_every == 0:
            C_WS = _np_quat_to_matrix(q)
            ts.append(t)
            gyros.append(omega_S(t))
            accs.append(C_WS.T @ (acc_W(t) + np.array([0, 0, g])))
            states[round(t, 9)] = (r.copy(), q.copy(), v.copy())
        if i == n_fine:
            break
        # midpoint integration
        tm = t + 0.5 * fine_dt
        q = _np_quat_mul(q, _np_delta_q(omega_S(tm) * fine_dt))
        q /= np.linalg.norm(q)
        a = acc_W(tm)
        r = r + v * fine_dt + 0.5 * a * fine_dt**2
        v = v + a * fine_dt
    return (
        np.array(ts),
        np.array(gyros),
        np.array(accs),
        states,
    )


@pytest.fixture(scope="module")
def sim():
    return simulate_imu()


@pytest.fixture(scope="module")
def params():
    return ImuParams.euroc()


def test_propagation_matches_ground_truth(sim, params):
    ts, gyro, acc, states = sim
    r1, q1, v1 = states[round(ts[-1], 9)]
    T0 = kin.SE3(r=jnp.zeros(3), q=kin.quat_identity())
    sb0 = jnp.zeros(9)
    T1, sb1 = propagate(
        params,
        T0,
        sb0,
        jnp.asarray(ts),
        jnp.asarray(gyro),
        jnp.asarray(acc),
        jnp.asarray(0.0),
        jnp.asarray(ts[-1]),
    )
    # 200 Hz trapezoid vs fine integration over 1 s of aggressive motion
    np.testing.assert_allclose(np.asarray(T1.r), r1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(sb1[:3]), v1, atol=2e-3)
    dq = kin.quat_multiply(kin.quat_conjugate(T1.q), jnp.asarray(q1))
    assert abs(float(dq[3])) > 1 - 1e-5  # orientation error < ~0.4 deg


def test_padding_invariance(sim, params):
    """Padded trailing samples must not change the result."""
    ts, gyro, acc, _ = sim
    t0, t1 = 0.0, float(ts[40])
    args = lambda T, G, A: preintegrate(
        params, jnp.asarray(T), jnp.asarray(G), jnp.asarray(A),
        jnp.asarray(t0), jnp.asarray(t1), jnp.zeros(9)
    )
    pre_a = args(ts[:45], gyro[:45], acc[:45])
    # pad by repeating the final sample 20x
    T_pad = np.concatenate([ts[:45], np.full(20, ts[44])])
    G_pad = np.concatenate([gyro[:45], np.tile(gyro[44], (20, 1))])
    A_pad = np.concatenate([acc[:45], np.tile(acc[44], (20, 1))])
    pre_b = args(T_pad, G_pad, A_pad)
    np.testing.assert_allclose(np.asarray(pre_a.delta_q), np.asarray(pre_b.delta_q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pre_a.P_delta), np.asarray(pre_b.P_delta), atol=1e-12)
    np.testing.assert_allclose(float(pre_a.delta_t), t1, atol=1e-12)


def test_boundary_interpolation(sim, params):
    """t0/t1 strictly between samples: delta_t must equal t1-t0 exactly."""
    ts, gyro, acc, _ = sim
    t0 = float(ts[3]) + 0.4 / 200.0
    t1 = float(ts[50]) + 0.7 / 200.0
    pre = preintegrate(
        params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc),
        jnp.asarray(t0), jnp.asarray(t1), jnp.zeros(9)
    )
    np.testing.assert_allclose(float(pre.delta_t), t1 - t0, atol=1e-12)


def test_residual_zero_at_propagated_state(sim, params):
    ts, gyro, acc, _ = sim
    T0 = kin.SE3(r=jnp.asarray([0.1, -0.2, 0.3]), q=kin.quat_normalize(jnp.asarray([0.1, 0.2, -0.1, 0.9])))
    sb0 = jnp.concatenate([jnp.asarray([0.5, -0.3, 0.2]), jnp.zeros(6)])
    t0, t1 = jnp.asarray(0.0), jnp.asarray(float(ts[-1]))
    T1, sb1 = propagate(params, T0, sb0, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc), t0, t1)
    pre = preintegrate(params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc), t0, t1, sb0)
    res, _ = imu_error(params, pre, T0, sb0, T1, sb1)
    # residual is whitened; should be ~0 up to numerical noise
    assert float(jnp.max(jnp.abs(res))) < 1e-6


def test_imu_factor_jacobians_numeric(sim, params):
    """Analytic minimal Jacobians vs central differences over oplus
    perturbations (analog of TestImuError.cpp:251-349)."""
    ts, gyro, acc, _ = sim
    rng = np.random.default_rng(3)
    T0 = kin.SE3(r=jnp.asarray(rng.normal(size=3)), q=kin.quat_normalize(jnp.asarray(rng.normal(size=4))))
    sb0 = jnp.asarray(np.concatenate([rng.normal(size=3), 0.05 * rng.normal(size=6)]))
    T1 = kin.SE3(r=jnp.asarray(rng.normal(size=3)), q=kin.quat_normalize(jnp.asarray(rng.normal(size=4))))
    sb1 = jnp.asarray(np.concatenate([rng.normal(size=3), 0.05 * rng.normal(size=6)]))
    t0, t1 = jnp.asarray(0.0), jnp.asarray(float(ts[-1]))
    # preintegrate at the exact linearization point so the first-order bias
    # correction is active in the Jacobians
    sb_ref = sb0.at[3:9].add(0.002)
    pre = preintegrate(params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc), t0, t1, sb_ref)

    res0, J = imu_error(params, pre, T0, sb0, T1, sb1)
    h = 1e-7

    def num_jac_pose(T, apply):
        cols = []
        for k in range(6):
            d = jnp.zeros(6).at[k].set(h)
            rp, _ = apply(kin.oplus(T, d))
            rm, _ = apply(kin.oplus(T, -d))
            cols.append((rp - rm) / (2 * h))
        return jnp.stack(cols, axis=-1)

    def num_jac_vec(x, apply, dim):
        cols = []
        for k in range(dim):
            d = jnp.zeros(dim).at[k].set(h)
            rp, _ = apply(x + d)
            rm, _ = apply(x - d)
            cols.append((rp - rm) / (2 * h))
        return jnp.stack(cols, axis=-1)

    Jn0 = num_jac_pose(T0, lambda T: imu_error(params, pre, T, sb0, T1, sb1))
    Jn1 = num_jac_vec(sb0, lambda x: imu_error(params, pre, T0, x, T1, sb1), 9)
    Jn2 = num_jac_pose(T1, lambda T: imu_error(params, pre, T0, sb0, T, sb1))
    Jn3 = num_jac_vec(sb1, lambda x: imu_error(params, pre, T0, sb0, T1, x), 9)

    scale = max(1.0, float(jnp.max(jnp.abs(res0))))
    np.testing.assert_allclose(np.asarray(J.J_pose0), np.asarray(Jn0), atol=2e-4 * scale, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(J.J_sb0), np.asarray(Jn1), atol=2e-4 * scale, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(J.J_pose1), np.asarray(Jn2), atol=2e-4 * scale, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(J.J_sb1), np.asarray(Jn3), atol=2e-4 * scale, rtol=2e-4)


def test_init_pose_from_imu():
    # stationary IMU tilted: acc measures specific force
    acc = jnp.asarray([1.0, 0.5, 9.5])
    T = init_pose_from_imu(acc)
    # after alignment, the measured acc expressed in W must be along +z
    a_W = kin.quat_rotate(T.q, acc)
    np.testing.assert_allclose(np.asarray(a_W[:2]), np.zeros(2), atol=1e-9)
    assert float(a_W[2]) > 0
    # degenerate: already aligned
    T2 = init_pose_from_imu(jnp.asarray([0.0, 0.0, 9.81]))
    np.testing.assert_allclose(np.asarray(T2.q), [0, 0, 0, 1], atol=1e-12)


def test_saturation_inflates_covariance(sim, params):
    ts, gyro, acc, _ = sim
    t0, t1 = jnp.asarray(0.0), jnp.asarray(float(ts[30]))
    pre = preintegrate(params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc), t0, t1, jnp.zeros(9))
    gyro_sat = gyro.copy()
    gyro_sat[10] = np.array([10.0, 0, 0])  # beyond g_max=7.8
    pre_sat = preintegrate(params, jnp.asarray(ts), jnp.asarray(gyro_sat), jnp.asarray(acc), t0, t1, jnp.zeros(9))
    assert float(jnp.trace(pre_sat.P_delta[3:6, 3:6])) > 10 * float(jnp.trace(pre.P_delta[3:6, 3:6]))


def test_rk4_agrees_with_trapezoid(sim, params):
    """RK4 alternative integrator (ode.hpp parity) cross-checks the
    production trapezoidal propagation."""
    from okvis_tpu.imu.ode import propagate_rk4

    ts, gyro, acc, states = sim
    T0 = kin.SE3(r=jnp.zeros(3), q=kin.quat_identity())
    sb0 = jnp.zeros(9)
    args = (
        params, T0, sb0, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc),
        jnp.asarray(0.0), jnp.asarray(float(ts[-1])),
    )
    T_tr, sb_tr = propagate(*args)
    T_rk, sb_rk = propagate_rk4(*args)
    np.testing.assert_allclose(np.asarray(T_rk.r), np.asarray(T_tr.r), atol=3e-3)
    np.testing.assert_allclose(np.asarray(sb_rk[:3]), np.asarray(sb_tr[:3]), atol=3e-3)
    dq = kin.quat_multiply(kin.quat_conjugate(T_rk.q), T_tr.q)
    assert abs(float(dq[3])) > 1 - 1e-5
    # RK4 should be at least as close to fine-integration ground truth
    r_gt, q_gt, v_gt = states[round(ts[-1], 9)]
    err_rk = np.linalg.norm(np.asarray(T_rk.r) - r_gt)
    assert err_rk < 5e-3


def test_mean_only_parallel_matches_sequential_full():
    """The prediction path's parallel-prefix formulation (associative
    quaternion scan + cumsum integrals) must reproduce the sequential
    trapezoid scan's mean quantities, including clipped integration bounds
    and padded intervals."""
    rng = np.random.default_rng(7)
    P = 32
    ts = np.cumsum(np.full(P, 0.005)) - 0.005
    gyro = rng.normal(0, 0.4, (P, 3))
    acc = rng.normal(0, 2.0, (P, 3)) + [0, 0, 9.81]
    sb = np.concatenate(
        [rng.normal(0, 0.3, 3), rng.normal(0, 0.01, 3), rng.normal(0, 0.05, 3)]
    )
    params = ImuParams.euroc()
    # bounds clip mid-interval on both sides; the tail pads out
    t0, t1 = 0.0123, 0.11
    full = preintegrate(
        params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc),
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sb), mean_only=False,
    )
    mo = preintegrate(
        params, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc),
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sb), mean_only=True,
    )
    for name in ("delta_q", "acc_integral", "acc_doubleintegral", "delta_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(mo, name)),
            np.asarray(getattr(full, name)),
            atol=1e-10,
            err_msg=name,
        )

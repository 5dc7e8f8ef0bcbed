"""SE(3)/quaternion invariants — analog of reference TestTransformation
(/root/reference/okvis_kinematics/test/TestTransformation.cpp:37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import kinematics as kin


def random_se3(rng, n=None):
    shape = () if n is None else (n,)
    r = jnp.asarray(rng.uniform(-1, 1, shape + (3,)))
    q = jnp.asarray(rng.normal(size=shape + (4,)))
    return kin.SE3(r=r, q=kin.quat_normalize(q))


def test_quat_multiply_matches_matrix(rng):
    q1 = kin.quat_normalize(jnp.asarray(rng.normal(size=4)))
    q2 = kin.quat_normalize(jnp.asarray(rng.normal(size=4)))
    q12 = kin.quat_multiply(q1, q2)
    C12 = kin.quat_to_matrix(q1) @ kin.quat_to_matrix(q2)
    np.testing.assert_allclose(kin.quat_to_matrix(q12), C12, atol=1e-12)


def test_quat_left_right_matrices(rng):
    q1 = kin.quat_normalize(jnp.asarray(rng.normal(size=4)))
    q2 = kin.quat_normalize(jnp.asarray(rng.normal(size=4)))
    q12 = kin.quat_multiply(q1, q2)
    np.testing.assert_allclose(kin.quat_left(q1) @ q2, q12, atol=1e-12)
    np.testing.assert_allclose(kin.quat_right(q2) @ q1, q12, atol=1e-12)


def test_matrix_quat_roundtrip(rng):
    q = kin.quat_normalize(jnp.asarray(rng.normal(size=(64, 4))))
    # Canonical sign w>=0 for comparison.
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    q2 = kin.matrix_to_quat(kin.quat_to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_quat_rotate_matches_matrix(rng):
    q = kin.quat_normalize(jnp.asarray(rng.normal(size=(16, 4))))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    np.testing.assert_allclose(
        kin.quat_rotate(q, v),
        jnp.einsum("...ij,...j->...i", kin.quat_to_matrix(q), v),
        atol=1e-12,
    )


def test_compose_matches_matrix_product(rng):
    T1, T2 = random_se3(rng), random_se3(rng)
    T12 = kin.compose(T1, T2)
    np.testing.assert_allclose(T12.matrix(), T1.matrix() @ T2.matrix(), atol=1e-12)


def test_inverse(rng):
    T = random_se3(rng)
    TI = kin.compose(T, kin.inverse(T))
    np.testing.assert_allclose(TI.matrix(), np.eye(4), atol=1e-12)


def test_transform_hpoint(rng):
    T = random_se3(rng)
    hp = jnp.asarray(rng.normal(size=4))
    np.testing.assert_allclose(kin.transform_hpoint(T, hp), T.matrix() @ hp, atol=1e-12)


def test_oplus_minus_roundtrip(rng):
    T0 = random_se3(rng)
    delta = 0.1 * jnp.asarray(rng.normal(size=6))
    T1 = kin.oplus(T0, delta)
    # minus is exact for translation, first-order for rotation
    d = kin.minus(T0, T1)
    np.testing.assert_allclose(d[:3], delta[:3], atol=1e-12)
    np.testing.assert_allclose(d[3:], delta[3:], atol=2e-3)
    # and exactly zero for identical inputs
    np.testing.assert_allclose(kin.minus(T0, T0), np.zeros(6), atol=1e-12)


def test_oplus_jacobian_numeric(rng):
    """7x6 plus-Jacobian vs central differences (ref PoseLocalParameterization
    VerifyJacobianNumDiff, PoseLocalParameterization.cpp:158-183)."""
    T = random_se3(rng)
    J = kin.oplus_jacobian(T)

    def f(delta):
        Tn = kin.oplus(T, delta)
        return jnp.concatenate([Tn.r, Tn.q])

    Jn = jax.jacfwd(f)(jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(J, Jn, atol=1e-9)


def test_lift_jacobian_is_pseudoinverse(rng):
    T = random_se3(rng)
    J_plus = kin.oplus_jacobian(T)
    J_lift = kin.lift_jacobian(T)
    np.testing.assert_allclose(J_lift @ J_plus, np.eye(6), atol=1e-12)


def test_lift_jacobian_numeric(rng):
    """lift = d(minus(T, ·))/d(ambient) at T."""
    T = random_se3(rng)

    def f(x):
        Tn = kin.SE3(r=x[:3], q=x[3:])
        return kin.minus(T, Tn)

    x0 = jnp.concatenate([T.r, T.q])
    Jn = jax.jacfwd(f)(x0)
    np.testing.assert_allclose(kin.lift_jacobian(T), Jn, atol=1e-9)


def test_right_jacobian_property(rng):
    """exp(phi + dphi) ≈ exp(phi) * exp(J_r(phi) dphi) (Forster eq. 7)."""
    phi = jnp.asarray(rng.normal(size=3))
    dphi = 1e-6 * jnp.asarray(rng.normal(size=3))
    Jr = kin.right_jacobian(phi)
    lhs = kin.delta_q(phi + dphi)  # delta_q(x) = exp-map of rotation vector x
    rhs = kin.quat_multiply(kin.delta_q(phi), kin.delta_q(Jr @ dphi))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_batched_and_jit(rng):
    Ts = random_se3(rng, n=32)
    out = jax.jit(kin.inverse)(Ts)
    assert out.r.shape == (32, 3) and out.q.shape == (32, 4)
    comp = jax.jit(kin.compose)(Ts, kin.inverse(Ts))
    np.testing.assert_allclose(comp.r, np.zeros((32, 3)), atol=1e-12)


def test_sinc_small_and_large():
    x = jnp.asarray([0.0, 1e-8, 1e-3, 0.5, np.pi])
    expected = np.array([1.0, 1.0, np.sinc(1e-3 / np.pi), np.sin(0.5) / 0.5, np.sin(np.pi) / np.pi])
    np.testing.assert_allclose(kin.sinc(x), expected, atol=1e-12)
    # grad must be finite at 0
    g = jax.grad(lambda v: kin.sinc(v))(0.0)
    assert np.isfinite(g)

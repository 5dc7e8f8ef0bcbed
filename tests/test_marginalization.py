"""Marginalization math tests — analog of reference TestMarginalization
(/root/reference/okvis_ceres/test/TestMarginalization.cpp:57-237): the
marginal prior must reproduce the effect of the eliminated variables."""

import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu.estimator.marginalization import MargResult, marginalize_system, pinv_sym
from okvis_tpu.solver import WindowConfig
from okvis_tpu.solver.assemble import NormalEqs


def random_psd(rng, n, rank=None):
    m = rng.normal(size=(rank or n + 2, n))
    return m.T @ m


def test_pinv_sym_full_rank(rng):
    A = jnp.asarray(random_psd(rng, 6))
    Ai = pinv_sym(A)
    np.testing.assert_allclose(np.asarray(Ai @ A), np.eye(6), atol=1e-8)


def test_pinv_sym_rank_deficient(rng):
    A = jnp.asarray(random_psd(rng, 5, rank=3))
    Ai = pinv_sym(A)
    # Moore-Penrose conditions
    np.testing.assert_allclose(np.asarray(A @ Ai @ A), np.asarray(A), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Ai @ A @ Ai), np.asarray(Ai), atol=1e-7)


def test_pinv_sym_masked(rng):
    A = jnp.asarray(random_psd(rng, 8))
    mask = jnp.asarray([True] * 5 + [False] * 3)
    Ai = pinv_sym(A, active_mask=mask)
    # equals pinv of the 5x5 principal submatrix, embedded
    sub = np.asarray(A)[:5, :5]
    sub_inv = np.linalg.inv(sub)
    np.testing.assert_allclose(np.asarray(Ai)[:5, :5], sub_inv, atol=1e-7)
    assert np.allclose(np.asarray(Ai)[5:, :], 0) and np.allclose(np.asarray(Ai)[:, 5:], 0)


def _tiny_cfg():
    return WindowConfig(
        num_states=2,
        num_cameras=1,
        max_landmarks=4,
        max_observations=8,
        max_imu_links=1,
        camera_specs=(),
    )


def test_dense_marginalization_exact_on_linear_system(rng):
    """For a purely quadratic cost, Schur marginalization is exact: the
    minimum over kept dims must match the full joint minimum."""
    cfg = _tiny_cfg()
    D = cfg.dense_dim  # 36
    L = cfg.max_landmarks
    H = jnp.asarray(random_psd(rng, D)) + 0.1 * jnp.eye(D)
    b = jnp.asarray(rng.normal(size=D))
    eqs = NormalEqs(
        H_dd=H,
        b_d=b,
        H_ll=jnp.zeros((L, 3, 3)),
        b_l=jnp.zeros((L, 3)),
        W=jnp.zeros((L, D, 3)),
        cost=jnp.asarray(0.0),
    )
    # marginalize the first state's 15 dims
    marg = jnp.arange(D) < 15
    keep = ~marg
    out = marginalize_system(cfg, eqs, marg, keep, jnp.zeros(L, bool), jnp.asarray(1.0))

    # joint minimum: solve H x = b; restricted: prior H_new x_k = b_new
    x_joint = np.linalg.solve(np.asarray(H), np.asarray(b))
    Hn, bn = np.asarray(out.H), np.asarray(out.b0)
    x_keep = np.linalg.solve(Hn[15:, 15:], bn[15:])
    np.testing.assert_allclose(x_keep, x_joint[15:], atol=1e-8)
    # prior has no information on marginalized dims
    assert np.allclose(Hn[:15, :], 0) and np.allclose(bn[:15], 0)


def test_landmark_then_dense_marginalization(rng):
    """Full pipeline with landmark blocks: joint minimum must be preserved.

    The joint system is built as a genuine least-squares JᵀJ with the VIO
    sparsity: every factor row touches the dense block and at most ONE
    landmark — so the landmark part is block-diagonal AND the system is PSD
    (zeroing cross terms of a dense JᵀJ would be indefinite)."""
    cfg = _tiny_cfg()
    D, L = cfg.dense_dim, cfg.max_landmarks
    n_tot = D + 3 * L
    rows = []
    for l in range(L):
        for _ in range(12):
            row = np.zeros(n_tot)
            row[:D] = rng.normal(size=D) * 0.3
            row[D + 3 * l : D + 3 * l + 3] = rng.normal(size=3)
            rows.append(row)
    for _ in range(D + 5):  # dense-only factors (IMU/prior-like)
        row = np.zeros(n_tot)
        row[:D] = rng.normal(size=D)
        rows.append(row)
    J = np.stack(rows)
    H_joint = J.T @ J
    b_joint = J.T @ rng.normal(size=len(rows))  # b in range(Jᵀ) like a real residual
    H_dd = jnp.asarray(H_joint[:D, :D])
    b_d = jnp.asarray(b_joint[:D])
    H_ll = np.zeros((L, 3, 3))
    for l in range(L):
        H_ll[l] = H_joint[D + 3 * l : D + 3 * l + 3, D + 3 * l : D + 3 * l + 3]
    W = np.stack([H_joint[:D, D + 3 * l : D + 3 * l + 3] for l in range(L)])
    b_l = b_joint[D:].reshape(L, 3)
    eqs = NormalEqs(
        H_dd=H_dd,
        b_d=b_d,
        H_ll=jnp.asarray(H_ll),
        b_l=jnp.asarray(b_l),
        W=jnp.asarray(W),
        cost=jnp.asarray(0.0),
    )
    marg = jnp.arange(D) < 15
    keep = ~marg
    out = marginalize_system(cfg, eqs, marg, keep, jnp.ones(L, bool), jnp.asarray(0.0))

    # equivalent dense joint system (block-diag landmark part)
    H_full = np.zeros((n_tot, n_tot))
    H_full[:D, :D] = np.asarray(H_dd)
    for l in range(L):
        H_full[D + 3 * l : D + 3 * l + 3, D + 3 * l : D + 3 * l + 3] = H_ll[l]
        H_full[:D, D + 3 * l : D + 3 * l + 3] = W[l]
        H_full[D + 3 * l : D + 3 * l + 3, :D] = W[l].T
    x_joint = np.linalg.solve(H_full, np.concatenate([np.asarray(b_d), b_l.ravel()]))
    Hn, bn = np.asarray(out.H), np.asarray(out.b0)
    x_keep = np.linalg.solve(Hn[15:, 15:], bn[15:])
    np.testing.assert_allclose(x_keep, x_joint[15:D], atol=1e-6)

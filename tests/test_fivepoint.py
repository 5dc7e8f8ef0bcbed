"""Five-point relative pose (host Stewenius solver, frontend/fivepoint.py)
— the minimal solver the reference uses for 2D-2D initialization
(/root/reference/okvis_frontend/src/Frontend.cpp:645-810 via OpenGV)."""

import numpy as np
import pytest

from okvis_tpu.frontend.fivepoint import (
    essential_five_point,
    ransac_relative_pose_5pt,
)


def _make_pair(rng, n, noise=0.0, n_out=0, ang=0.15, t=(0.3, -0.1, 0.05)):
    """Synthetic two-view set; returns unit bearings + ground-truth E with
    the ha^T E hb = 0 convention used by both RANSAC paths."""
    Pb = rng.uniform(-1, 1, (n, 3)) * [2, 2, 1] + [0, 0, 4]
    ax = np.array([0.2, 0.9, 0.1])
    ax /= np.linalg.norm(ax)
    K = np.array(
        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
    )
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
    t = np.asarray(t, float)
    Pa = Pb @ R.T + t
    fa = Pa / np.linalg.norm(Pa, axis=1, keepdims=True)
    fb = Pb / np.linalg.norm(Pb, axis=1, keepdims=True)
    xa = fa[:, :2] / fa[:, 2:3] + rng.normal(0, noise, (n, 2))
    xb = fb[:, :2] / fb[:, 2:3] + rng.normal(0, noise, (n, 2))
    for i in range(n_out):
        xb[i] += rng.uniform(0.2, 0.5, 2) * rng.choice([-1, 1], 2)
    fa = np.concatenate([xa, np.ones((n, 1))], 1)
    fa /= np.linalg.norm(fa, axis=1, keepdims=True)
    fb = np.concatenate([xb, np.ones((n, 1))], 1)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
    )
    E_gt = tx @ R
    E_gt /= np.linalg.norm(E_gt)
    return fa, fb, E_gt


def _e_dist(E, E_gt):
    return min(np.linalg.norm(E - E_gt), np.linalg.norm(E + E_gt))


def test_minimal_solver_exact_on_noise_free_data():
    rng = np.random.default_rng(7)
    for trial in range(10):
        fa, fb, E_gt = _make_pair(rng, 5)
        Es = essential_five_point(
            fa[:, :2] / fa[:, 2:3], fb[:, :2] / fb[:, 2:3]
        )
        assert Es, "no candidates"
        best = min(_e_dist(E / np.linalg.norm(E), E_gt) for E in Es)
        assert best < 1e-6, (trial, best)


def test_minimal_solver_handles_pure_sideways_translation():
    """Exactly zero rotation sits on a degenerate stratum of the Stewenius
    Gauss-Jordan step (cond(C1) ~ 1e15 — OpenGV's LU shares it); candidates
    are approximate there but must stay close enough for RANSAC scoring."""
    rng = np.random.default_rng(11)
    fa, fb, E_gt = _make_pair(rng, 5, ang=0.0, t=(0.2, 0.0, 0.0))
    Es = essential_five_point(fa[:, :2] / fa[:, 2:3], fb[:, :2] / fb[:, 2:3])
    assert Es
    assert min(_e_dist(E / np.linalg.norm(E), E_gt) for E in Es) < 0.05
    # a hair of rotation leaves the stratum: exact again
    fa, fb, E_gt = _make_pair(rng, 5, ang=0.01, t=(0.2, 0.0, 0.0))
    Es = essential_five_point(fa[:, :2] / fa[:, 2:3], fb[:, :2] / fb[:, 2:3])
    assert min(_e_dist(E / np.linalg.norm(E), E_gt) for E in Es) < 1e-5


def test_ransac_classifies_outliers():
    rng = np.random.default_rng(3)
    n, n_out = 60, 15
    fa, fb, E_gt = _make_pair(rng, n, noise=0.001, n_out=n_out)
    inl, count, E, ok = ransac_relative_pose_5pt(
        fa, fb, np.ones(n, bool), focal=460.0, threshold_px2=9.0,
        n_iters=50, seed=5,
    )
    assert ok
    # outliers rejected (an epipolar line has zero area — the rare outlier
    # that lands on it IS a geometric inlier of the model); true inliers kept
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].sum() >= 0.85 * (n - n_out)


def test_ransac_works_at_minimal_correspondence_count():
    """The 5-point's raison d'etre: the 8-point needs 8 per hypothesis, so
    at N=6 low-overlap pairs it cannot even sample — 5-point still solves."""
    rng = np.random.default_rng(13)
    fa, fb, E_gt = _make_pair(rng, 6, noise=0.0005)
    inl, count, E, ok = ransac_relative_pose_5pt(
        fa, fb, np.ones(6, bool), n_iters=20, seed=2
    )
    assert ok and count >= 5
    assert _e_dist(E / np.linalg.norm(E), E_gt) < 0.1

"""Relative-pose solver study: batched 8-point vs Stewenius 5-point.

VERDICT r1 next #9: quantify the 8-point-instead-of-5-point tradeoff on
low-overlap pairs (the reference uses OpenGV Stewenius 5-pt,
Frontend.cpp:645-810). Synthetic two-view sets sweep correspondence count,
pixel noise, and outlier fraction; both RANSAC paths score the same data
and report inlier recall / outlier leakage / rotation error of the
decomposed best model.

The production wiring (frontend.FrontendConfig.fivepoint_max_corr) runs the
host 5-point alongside the batched 8-point below 24 correspondences and
keeps the higher-inlier model.

Usage: python scripts/study_relpose.py [n_trials]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def make_pair(rng, n, noise_px, out_frac, focal=460.0):
    n_out = int(round(out_frac * n))
    Pb = rng.uniform(-1, 1, (n, 3)) * [2, 2, 1] + [0, 0, 4]
    ang = rng.uniform(0.05, 0.3)
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
    t = rng.uniform(-0.4, 0.4, 3)
    Pa = Pb @ R.T + t
    noise = noise_px / focal
    xa = Pa[:, :2] / Pa[:, 2:3] + rng.normal(0, noise, (n, 2))
    xb = Pb[:, :2] / Pb[:, 2:3] + rng.normal(0, noise, (n, 2))
    for i in range(n_out):
        xb[i] += rng.uniform(0.05, 0.3, 2) * rng.choice([-1, 1], 2)
    fa = np.concatenate([xa, np.ones((n, 1))], 1)
    fa /= np.linalg.norm(fa, axis=1, keepdims=True)
    fb = np.concatenate([xb, np.ones((n, 1))], 1)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    return fa, fb, R, n_out


def rot_err_deg(E, fa, fb, inl, R_gt):
    from okvis_tpu.frontend.ransac import decompose_essential

    R, _t = decompose_essential(
        jnp.asarray(E).reshape(3, 3), jnp.asarray(fa), jnp.asarray(fb),
        jnp.asarray(inl),
    )
    R = np.asarray(R)
    c = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def main(n_trials=40):
    from okvis_tpu.frontend.fivepoint import ransac_relative_pose_5pt
    from okvis_tpu.frontend.ransac import ransac_relative_pose

    rng = np.random.default_rng(99)
    focal, thr = 460.0, 9.0
    print(f"{'N':>4s} {'noise':>6s} {'out%':>5s} | "
          f"{'8pt recall':>10s} {'8pt leak':>9s} {'8pt rot°':>9s} | "
          f"{'5pt recall':>10s} {'5pt leak':>9s} {'5pt rot°':>9s}")
    for n in (10, 14, 20, 30, 50):
        for noise_px in (0.5, 1.0):
            for out_frac in (0.0, 0.3):
                m8 = np.zeros(3)
                m5 = np.zeros(3)
                for trial in range(n_trials):
                    fa, fb, R_gt, n_out = make_pair(rng, n, noise_px, out_frac)
                    mask = np.ones(n, bool)
                    true_inl = np.ones(n, bool)
                    true_inl[:n_out] = False

                    r8 = ransac_relative_pose(
                        jax.random.PRNGKey(trial), jnp.asarray(fa),
                        jnp.asarray(fb), jnp.asarray(mask), focal, thr,
                    )
                    inl8 = np.asarray(r8.inliers)
                    m8 += [
                        inl8[true_inl].mean(),
                        inl8[~true_inl].mean() if n_out else 0.0,
                        min(rot_err_deg(r8.model, fa, fb, inl8, R_gt), 30.0),
                    ]

                    inl5, n5, E5, ok5 = ransac_relative_pose_5pt(
                        fa, fb, mask, focal=focal, threshold_px2=thr,
                        n_iters=50, seed=trial,
                    )
                    m5 += [
                        inl5[true_inl].mean(),
                        inl5[~true_inl].mean() if n_out else 0.0,
                        min(rot_err_deg(E5, fa, fb, inl5, R_gt), 30.0),
                    ]
                m8 /= n_trials
                m5 /= n_trials
                print(
                    f"{n:>4d} {noise_px:>5.1f}px {100*out_frac:>4.0f}% | "
                    f"{m8[0]:>10.2f} {m8[1]:>9.2f} {m8[2]:>9.2f} | "
                    f"{m5[0]:>10.2f} {m5[1]:>9.2f} {m5[2]:>9.2f}"
                )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)

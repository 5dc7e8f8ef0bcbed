"""Two-view triangulation (closed-form midpoint) — branch-free and vmappable.

Re-derivation of the reference triangulateFast
(/root/reference/okvis_frontend/src/stereo_triangulation.cpp:51-123): 2x2
midpoint solve between two rays, parallel-ray fallback (point at infinity with
w=1e-3), chi²>9 rejection, and the sign flip — expressed with jnp.where so a
whole batch of candidate matches triangulates in one XLA program
(the reference calls this per-match inside setBestMatch,
VioKeyframeWindowMatchingAlgorithm.cpp:363-527).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TriangulationResult(NamedTuple):
    hp: jnp.ndarray  # (..., 4) normalized homogeneous point
    valid: jnp.ndarray  # (...,) bool
    parallel: jnp.ndarray  # (...,) bool


def triangulate_fast(
    p1: jnp.ndarray,  # (..., 3) camera-1 center
    e1: jnp.ndarray,  # (..., 3) ray direction 1
    p2: jnp.ndarray,  # (..., 3) camera-2 center
    e2: jnp.ndarray,  # (..., 3) ray direction 2
    sigma: jnp.ndarray,  # (...,) ray uncertainty
) -> TriangulationResult:
    t12 = p2 - p1
    b0 = jnp.sum(t12 * e1, axis=-1)
    b1 = jnp.sum(t12 * e2, axis=-1)
    a00 = jnp.sum(e1 * e1, axis=-1)
    a10 = jnp.sum(e1 * e2, axis=-1)
    a01 = -a10
    a11 = -jnp.sum(e2 * e2, axis=-1)
    # wrong viewing direction flip (stereo_triangulation.cpp:82-86)
    flip = a10 < 0.0
    a10 = jnp.where(flip, -a10, a10)
    a01 = jnp.where(flip, -a01, a01)

    det = a00 * a11 - a01 * a10
    invertible = jnp.abs(det) > 1e-6
    safe_det = jnp.where(invertible, det, 1.0)
    l0 = (a11 * b0 - a01 * b1) / safe_det
    l1 = (-a10 * b0 + a00 * b1) / safe_det

    xm = l0[..., None] * e1 + p1
    xn = l1[..., None] * e2 + p2
    midpoint = 0.5 * (xm + xn)

    err = midpoint - xm
    diff = midpoint - (p1 + 0.5 * t12)
    diff_sq = jnp.sum(diff * diff, axis=-1)
    chi2 = jnp.sum(err * err, axis=-1) / jnp.maximum(diff_sq * sigma * sigma, 1e-300)
    valid_mid = chi2 <= 9.0

    # sign flip toward the viewing direction
    flip2 = jnp.sum(diff * e1, axis=-1) < 0
    midpoint = jnp.where(flip2[..., None], (p1 + 0.5 * t12) - diff, midpoint)
    hp_mid = jnp.concatenate([midpoint, jnp.ones_like(midpoint[..., :1])], axis=-1)
    hp_mid = hp_mid / jnp.linalg.norm(hp_mid, axis=-1, keepdims=True)

    # parallel fallback: direction average at infinity, w = 1e-3
    mean_dir = 0.5 * (e1 + e2)
    hp_par = jnp.concatenate(
        [mean_dir, jnp.full_like(mean_dir[..., :1], 1e-3)], axis=-1
    )
    hp_par = hp_par / jnp.linalg.norm(hp_par, axis=-1, keepdims=True)
    cross_norm = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    valid_par = cross_norm < 6.0 * sigma

    hp = jnp.where(invertible[..., None], hp_mid, hp_par)
    valid = jnp.where(invertible, valid_mid, valid_par)
    parallel = ~invertible
    return TriangulationResult(hp=hp, valid=valid, parallel=parallel)


def refine_triangulation(
    project_residual,  # fn(hp (4,)) -> (n_res,) stacked reprojection residuals
    hp0: jnp.ndarray,  # (4,) initial homogeneous point
    iters: int = 5,
) -> TriangulationResult:
    """Small Gauss-Newton refinement of a triangulated point over its
    observations (the reference ProbabilisticStereoTriangulator's GN with
    pose-prior Hessian, okvis_frontend/src/ProbabilisticStereoTriangulator.cpp:59-394
    — poses are held fixed here; their uncertainty enters through the
    measurement sigmas baked into `project_residual`).

    Optimizes the first three homogeneous coordinates (HomogeneousPoint
    local parameterization); returns the refined point, a validity flag from
    the final chi², and parallel=False.
    """
    import jax

    def body(_, hp):
        r = project_residual(hp)
        J = jax.jacfwd(project_residual)(hp)[:, :3]  # (n, 3)
        H = J.T @ J + 1e-9 * jnp.eye(3, dtype=hp.dtype)
        g = J.T @ r
        # 3x3 solve via adjugate
        a, b, c = H[0, 0], H[0, 1], H[0, 2]
        d, e, f = H[1, 1], H[1, 2], H[2, 2]
        det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1.0, det)
        Hinv = (
            jnp.asarray(
                [
                    [d * f - e * e, c * e - b * f, b * e - c * d],
                    [c * e - b * f, a * f - c * c, b * c - a * e],
                    [b * e - c * d, b * c - a * e, a * d - b * b],
                ]
            )
            * inv_det
        )
        return hp.at[:3].add(-(Hinv @ g))

    import jax.lax

    hp = jax.lax.fori_loop(0, iters, body, hp0)
    r = project_residual(hp)
    chi2 = jnp.sum(r * r)
    n_res = r.shape[0]
    return TriangulationResult(
        hp=hp / jnp.linalg.norm(hp),
        valid=chi2 < 9.0 * (n_res / 2),
        parallel=jnp.asarray(False),
    )

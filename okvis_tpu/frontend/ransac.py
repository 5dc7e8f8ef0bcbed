"""Batched-hypothesis RANSAC for 3D-2D and 2D-2D geometric verification.

TPU-native replacement for the reference's OpenGV RANSAC loops
(/root/reference/okvis_frontend/src/Frontend.cpp:575-810: GP3P absolute-pose
with 50 iterations / threshold 9, Stewenius 5-pt relative pose, 2-pt
rotation-only): instead of a sequential hypothesize-and-verify loop, ALL
hypotheses are sampled, solved, and scored against ALL correspondences in one
batched XLA program — `n_hyp` minimal solves + one (n_hyp × N) error matrix,
then an argmax. Minimal solvers are chosen for batchability:

- rotation-only: 2-point Wahba (quaternion from accumulator matrix eigenvector)
- relative pose: 8-point essential matrix (batched SVD) scored by Sampson error
- absolute pose: 3-point Kneip P3P (closed-form quartic, Ferrari solve in
  complex arithmetic — pure elementwise math, ideal for hypothesis-parallel
  batching). P3P handles coplanar landmark sets, matching the robustness of
  the reference's OpenGV GP3P (Frontend.cpp:599-642); the earlier 6-point
  DLT (kept as `_dlt_absolute_models` for study) is degenerate there.

Error thresholds follow the reference's focal-scaled convention: the SAC
problems scale reprojection errors by (0.8/focal)⁻²
(FrameAbsolutePoseSacProblem.hpp:173), i.e. thresholds are expressed in
pixel²; we score angular errors mapped through the focal length.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..kinematics import so3


class RansacResult(NamedTuple):
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # scalar int32
    model: jnp.ndarray  # solver-specific model parameters
    success: jnp.ndarray  # scalar bool


def _sample_indices(key, n_hyp: int, k: int, n: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """(n_hyp, k) random indices in [0, n) (with replacement across hypotheses;
    within a hypothesis, distinct with high probability — degenerate samples
    simply score poorly and lose the argmax)."""
    u = jax.random.uniform(key, (n_hyp, k))
    return jnp.minimum((u * n).astype(jnp.int32), n_max - 1)


# ---------------------------------------------------------------------------
# rotation-only 2-point (ref FrameRotationOnlySacProblem)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_rotation_only(
    key,
    f_a: jnp.ndarray,  # (N, 3) unit bearings in frame A
    f_b: jnp.ndarray,  # (N, 3) unit bearings in frame B
    mask: jnp.ndarray,  # (N,) bool
    focal: float = 460.0,
    threshold_px2: float = 9.0,
    n_hyp: int = 64,
) -> RansacResult:
    """Finds R_AB maximizing inliers of f_a ≈ R_AB f_b. Model: quaternion."""
    N = f_a.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    idx = _sample_indices(key, n_hyp, 2, n_valid, N)
    # map sampled positions to actual valid indices
    valid_idx = jnp.nonzero(mask, size=N, fill_value=0)[0]
    idx = valid_idx[idx]

    def solve(pair):
        # Wahba with 2 vector pairs: B = Σ f_a f_bᵀ; R = closest rotation
        a = f_a[pair]  # (2,3)
        b = f_b[pair]
        B = a.T @ b + 1e-9 * jnp.eye(3, dtype=f_a.dtype)
        # orthogonal Procrustes via SVD
        U, _, Vt = jnp.linalg.svd(B)
        d = jnp.sign(jnp.linalg.det(U @ Vt))
        S = jnp.diag(jnp.asarray([1.0, 1.0, d], dtype=f_a.dtype))
        return U @ S @ Vt  # R_AB

    Rs = jax.vmap(solve)(idx)  # (n_hyp, 3, 3)
    # score: angular error between f_a and R f_b, mapped to pixels
    rb = jnp.einsum("hij,nj->hni", Rs, f_b)
    cos = jnp.clip(jnp.sum(rb * f_a[None], axis=-1), -1.0, 1.0)
    err_px2 = (jnp.arccos(cos) * focal) ** 2
    inl = (err_px2 < threshold_px2) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    R_best = Rs[best]
    return RansacResult(
        inliers=inl[best],
        num_inliers=counts[best],
        model=so3.matrix_to_quat(R_best),
        success=counts[best] >= 2,
    )


# ---------------------------------------------------------------------------
# relative pose: 8-point essential matrix (replaces Stewenius 5-pt)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_relative_pose(
    key,
    f_a: jnp.ndarray,  # (N, 3) unit bearings, frame A
    f_b: jnp.ndarray,  # (N, 3) unit bearings, frame B
    mask: jnp.ndarray,
    focal: float = 460.0,
    threshold_px2: float = 9.0,
    n_hyp: int = 64,
) -> RansacResult:
    """Essential-matrix RANSAC: f_aᵀ E f_b = 0. Model: E (3,3) flattened."""
    N = f_a.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    idx = _sample_indices(key, n_hyp, 8, n_valid, N)
    valid_idx = jnp.nonzero(mask, size=N, fill_value=0)[0]
    idx = valid_idx[idx]

    # normalized image coords (perspective division of bearings)
    xa = f_a[:, :2] / jnp.maximum(f_a[:, 2:3], 1e-6)
    xb = f_b[:, :2] / jnp.maximum(f_b[:, 2:3], 1e-6)

    def solve(sample):
        pa = xa[sample]  # (8,2)
        pb = xb[sample]
        # rows of the epipolar constraint matrix: [xa*xb, xa*yb, xa, ya*xb, ...]
        x1, y1 = pa[:, 0], pa[:, 1]
        x2, y2 = pb[:, 0], pb[:, 1]
        A = jnp.stack(
            [x1 * x2, x1 * y2, x1, y1 * x2, y1 * y2, y1, x2, y2, jnp.ones_like(x1)],
            axis=1,
        )  # (8, 9)
        # null vector via eigendecomposition of AᵀA
        _, V = jnp.linalg.eigh(A.T @ A)
        e = V[:, 0]
        E = e.reshape(3, 3)
        # enforce essential structure
        U, s, Vt = jnp.linalg.svd(E)
        return U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ Vt

    Es = jax.vmap(solve)(idx)  # (n_hyp, 3, 3)

    # Sampson distance in normalized coords -> pixel² via focal
    ha = jnp.concatenate([xa, jnp.ones_like(xa[:, :1])], axis=1)  # (N,3)
    hb = jnp.concatenate([xb, jnp.ones_like(xb[:, :1])], axis=1)
    Exb = jnp.einsum("hij,nj->hni", Es, hb)  # (H,N,3)
    Eta = jnp.einsum("hji,nj->hni", Es, ha)  # Eᵀ xa
    num = jnp.einsum("ni,hni->hn", ha, Exb) ** 2
    den = (
        Exb[..., 0] ** 2 + Exb[..., 1] ** 2 + Eta[..., 0] ** 2 + Eta[..., 1] ** 2
    )
    sampson = num / jnp.maximum(den, 1e-12)
    err_px2 = sampson * focal * focal
    inl = (err_px2 < threshold_px2) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return RansacResult(
        inliers=inl[best],
        num_inliers=counts[best],
        model=Es[best].ravel(),
        success=counts[best] >= 8,
    )


# ---------------------------------------------------------------------------
# absolute pose: Kneip P3P (replaces OpenGV GP3P; planar-robust)
# ---------------------------------------------------------------------------


def _solve_quartic(a4, a3, a2, a1, a0):
    """Closed-form (Ferrari) roots of a4·x⁴ + a3·x³ + a2·x² + a1·x + a0.

    Branch-free elementwise complex arithmetic — batches over any leading
    dims and runs on TPU (general `eig` of a companion matrix is CPU-only in
    XLA). Returns (..., 4) complex roots; callers take real parts and let
    downstream scoring reject spurious ones (complex-pair roots yield poses
    that lose the inlier vote, exactly like OpenGV's behavior of keeping all
    quartic roots)."""
    ctype = jnp.complex128 if a4.dtype == jnp.float64 else jnp.complex64
    a4s = jnp.where(jnp.abs(a4) < 1e-12, 1e-12, a4)
    b = (a3 / a4s).astype(ctype)
    c = (a2 / a4s).astype(ctype)
    d = (a1 / a4s).astype(ctype)
    e = (a0 / a4s).astype(ctype)
    # depressed quartic y⁴ + p y² + q y + r with x = y − b/4
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b * b * b / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0
    # resolvent cubic m³ + p m² + (p²/4 − r) m − q²/8 = 0 (perfect-square
    # condition of Ferrari's decomposition)
    c2 = p
    c1 = p * p / 4.0 - r
    c0 = -q * q / 8.0
    # Cardano
    d0 = c2 * c2 - 3.0 * c1
    d1 = 2.0 * c2**3 - 9.0 * c2 * c1 + 27.0 * c0
    s = jnp.sqrt(d1 * d1 - 4.0 * d0**3)
    u = (d1 + s) / 2.0
    u = jnp.where(jnp.abs(u) < 1e-30, (d1 - s) / 2.0, u)
    C = jnp.exp(jnp.log(u + (u == 0)) / 3.0)  # principal cube root
    C = jnp.where(jnp.abs(C) < 1e-30, 1e-30, C)
    m = -(c2 + C + d0 / C) / 3.0
    # avoid the m→0 singularity of the split (biquadratic case)
    m = jnp.where(jnp.abs(m) < 1e-12, m + 1e-12, m)
    sq = jnp.sqrt(2.0 * m)
    # (y² + p/2 + m)² = 2m (y − q/(4m))²  →  two quadratics
    t1 = p / 2.0 + m + q / (2.0 * sq)
    t2 = p / 2.0 + m - q / (2.0 * sq)
    r1 = jnp.sqrt(sq * sq - 4.0 * t1)
    r2 = jnp.sqrt(sq * sq - 4.0 * t2)
    ys = jnp.stack(
        [(sq + r1) / 2.0, (sq - r1) / 2.0, (-sq + r2) / 2.0, (-sq - r2) / 2.0],
        axis=-1,
    )
    return ys - (b / 4.0)[..., None]


def _p3p_kneip(P, f):
    """Kneip closed-form P3P (ETH 'A Novel Parametrization of the
    Perspective-Three-Point Problem', ICRA 2011 — the solver OpenGV's GP3P
    path builds on; ref use at okvis_frontend/src/Frontend.cpp:599-642).

    P: (3, 3) world points, f: (3, 3) unit bearings in camera frame.
    Returns (4, 3, 4) camera-to-world candidates [R_WC | C] with
    X_W = R·X_C + C — up to 4 real solutions; spurious (complex-root) ones
    come out non-finite or score poorly."""
    dtype = P.dtype

    def frames(f1, f2, f3, P1, P2, P3):
        e1 = f1
        e3 = jnp.cross(f1, f2)
        e3 = e3 / jnp.maximum(jnp.linalg.norm(e3), 1e-12)
        e2 = jnp.cross(e3, e1)
        T = jnp.stack([e1, e2, e3])  # rows
        f3t = T @ f3
        return T, f3t

    T0, f3t0 = frames(f[0], f[1], f[2], P[0], P[1], P[2])
    # θ must lie in (0, π): swap the first two correspondences when the
    # transformed third bearing has positive z (Kneip §III)
    swap = f3t0[2] > 0
    f1 = jnp.where(swap, f[1], f[0])
    f2 = jnp.where(swap, f[0], f[1])
    P1 = jnp.where(swap, P[1], P[0])
    P2 = jnp.where(swap, P[0], P[1])
    T, f3t = frames(f1, f2, f[2], P1, P2, P[2])

    n1 = P2 - P1
    d12 = jnp.linalg.norm(n1)
    n1 = n1 / jnp.maximum(d12, 1e-12)
    n3 = jnp.cross(n1, P[2] - P1)
    n3 = n3 / jnp.maximum(jnp.linalg.norm(n3), 1e-12)
    n2 = jnp.cross(n3, n1)
    N = jnp.stack([n1, n2, n3])  # rows
    P3n = N @ (P[2] - P1)
    p1, p2 = P3n[0], P3n[1]

    cos_beta = jnp.dot(f1, f2)
    bb = 1.0 / jnp.maximum(1.0 - cos_beta * cos_beta, 1e-12) - 1.0
    b_cot = jnp.sign(cos_beta) * jnp.sqrt(jnp.maximum(bb, 0.0))

    f3z = jnp.where(jnp.abs(f3t[2]) < 1e-12, 1e-12, f3t[2])
    phi1 = f3t[0] / f3z
    phi2 = f3t[1] / f3z

    # quartic in cos θ (Kneip eq. 11)
    g1, g2 = phi1, phi2
    a4 = -(g2 * g2) * p2**4 - g1 * g1 * p2**4 - p2**4
    a3 = (
        2.0 * p2**3 * d12 * b_cot
        + 2.0 * g2 * g2 * p2**3 * d12 * b_cot
        - 2.0 * g1 * g2 * p2**3 * d12
    )
    a2 = (
        -(g2 * g2) * p1 * p1 * p2 * p2
        - g2 * g2 * p2 * p2 * d12 * d12 * b_cot * b_cot
        - g2 * g2 * p2 * p2 * d12 * d12
        + g2 * g2 * p2**4
        + g1 * g1 * p2**4
        + 2.0 * p1 * p2 * p2 * d12
        + 2.0 * g1 * g2 * p1 * p2 * p2 * d12 * b_cot
        - g1 * g1 * p1 * p1 * p2 * p2
        + 2.0 * g2 * g2 * p1 * p2 * p2 * d12
        - p2 * p2 * d12 * d12 * b_cot * b_cot
        - 2.0 * p1 * p1 * p2 * p2
    )
    a1 = (
        2.0 * p1 * p1 * p2 * d12 * b_cot
        + 2.0 * g1 * g2 * p2**3 * d12
        - 2.0 * g2 * g2 * p2**3 * d12 * b_cot
        - 2.0 * p1 * p2 * d12 * d12 * b_cot
    )
    a0 = (
        -2.0 * g1 * g2 * p1 * p2 * p2 * d12 * b_cot
        + g2 * g2 * p2 * p2 * d12 * d12
        + 2.0 * p1**3 * d12
        - p1 * p1 * d12 * d12
        + g2 * g2 * p1 * p1 * p2 * p2
        - p1**4
        - 2.0 * g2 * g2 * p1 * p2 * p2 * d12
        + g1 * g1 * p1 * p1 * p2 * p2
        + g2 * g2 * p2 * p2 * d12 * d12 * b_cot * b_cot
    )
    roots = _solve_quartic(a4, a3, a2, a1, a0)  # (4,) complex
    cos_t = jnp.clip(jnp.real(roots), -1.0, 1.0).astype(dtype)  # (4,)

    def backsub(ct):
        cot_a = (g1 / g2 * p1 + ct * p2 - d12 * b_cot) / (
            g1 / g2 * ct * p2 - p1 + d12
        )
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        sin_a = jnp.sqrt(1.0 / (cot_a * cot_a + 1.0))
        cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
        cos_a = jnp.where(cot_a < 0, -cos_a, cos_a)
        amp = sin_a * b_cot + cos_a
        C_eta = jnp.stack(
            [d12 * cos_a * amp, d12 * sin_a * ct * amp, d12 * sin_a * st * amp]
        )
        C = P1 + N.T @ C_eta
        Q = jnp.asarray(
            [
                [-cos_a, -sin_a * ct, -sin_a * st],
                [sin_a, -cos_a * ct, -cos_a * st],
                [0.0, -st, ct],
            ],
            dtype,
        )
        R_WC = N.T @ Q.T @ T
        return jnp.concatenate([R_WC, C[:, None]], axis=1)  # (3, 4)

    return jax.vmap(backsub)(cos_t)  # (4, 3, 4)


def _p3p_absolute_models(key, points_W, bearings, mask, n_hyp: int):
    """(n_hyp·4, 3, 4) central absolute-pose models [R_CW | t_C] from
    3-point Kneip samples drawn from the masked correspondences. Planar
    scenes are fine (P3P has no coplanarity degeneracy)."""
    N = points_W.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    idx = _sample_indices(key, n_hyp, 3, n_valid, N)
    valid_idx = jnp.nonzero(mask, size=N, fill_value=0)[0]
    idx = valid_idx[idx]

    def solve(sample):
        cands = _p3p_kneip(points_W[sample], bearings[sample])  # (4,3,4)
        # convert camera-to-world [R_WC | C] -> world-to-camera [R_CW | t]
        R_CW = jnp.swapaxes(cands[:, :, :3], 1, 2)
        t = -jnp.einsum("hij,hj->hi", R_CW, cands[:, :, 3])
        return jnp.concatenate([R_CW, t[..., None]], axis=2)

    return jax.vmap(solve)(idx).reshape(-1, 3, 4)  # (n_hyp·4, 3, 4)


# ---------------------------------------------------------------------------
# absolute pose: 6-point DLT (kept for study/fallback; coplanar-degenerate)
# ---------------------------------------------------------------------------


def _dlt_absolute_models(key, points_W, uv, mask, n_hyp: int) -> jnp.ndarray:
    """(n_hyp, 3, 4) central absolute-pose models [R_CW | t_C] from 6-point
    DLT samples drawn from the masked correspondences."""
    N = points_W.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    idx = _sample_indices(key, n_hyp, 6, n_valid, N)
    valid_idx = jnp.nonzero(mask, size=N, fill_value=0)[0]
    idx = valid_idx[idx]

    def solve(sample):
        P = points_W[sample]  # (6,3)
        x = uv[sample]  # (6,2)
        # DLT rows for P = [p,1]: u = (r1·p+t1)/(r3·p+t3)
        ones = jnp.ones((6, 1), P.dtype)
        Ph = jnp.concatenate([P, ones], axis=1)  # (6,4)
        zeros = jnp.zeros_like(Ph)
        rows_u = jnp.concatenate([Ph, zeros, -x[:, :1] * Ph], axis=1)  # (6,12)
        rows_v = jnp.concatenate([zeros, Ph, -x[:, 1:2] * Ph], axis=1)
        A = jnp.concatenate([rows_u, rows_v], axis=0)  # (12,12)
        _, V = jnp.linalg.eigh(A.T @ A)
        p = V[:, 0].reshape(3, 4)
        # orthogonalize rotation part, fix scale/sign
        R_raw = p[:, :3]
        U, s, Vt = jnp.linalg.svd(R_raw)
        d = jnp.sign(jnp.linalg.det(U @ Vt))
        R = U @ jnp.diag(jnp.asarray([1.0, 1.0, d], P.dtype)) @ Vt
        scale = jnp.mean(s) * d
        t = p[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1.0, scale)
        return jnp.concatenate([R, t[:, None]], axis=1)  # (3,4)

    return jax.vmap(solve)(idx)  # (n_hyp, 3, 4)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_absolute_pose(
    key,
    points_W: jnp.ndarray,  # (N, 3) landmark positions
    bearings_C: jnp.ndarray,  # (N, 3) unit bearings in camera frame
    mask: jnp.ndarray,
    focal: float = 460.0,
    threshold_px2: float = 9.0,
    n_hyp: int = 64,
) -> RansacResult:
    """Camera-pose RANSAC from 3D-2D matches
    (ref runRansac3d2d, Frontend.cpp:575-642: 50 iterations, threshold 9).

    Hypotheses from 3-point Kneip P3P (planar-robust, like the reference's
    GP3P). Model: flattened [R_CW | t_C] (3,4); x_C ∝ R_CW p_W + t.
    """
    uv = bearings_C[:, :2] / jnp.maximum(bearings_C[:, 2:3], 1e-6)  # (N,2)
    Ms = _p3p_absolute_models(key, points_W, bearings_C, mask, n_hyp)
    finite = jnp.all(jnp.isfinite(Ms.reshape(Ms.shape[0], -1)), axis=-1)
    p_C = jnp.einsum("hij,nj->hni", Ms[:, :, :3], points_W) + Ms[:, None, :, 3]
    z = p_C[..., 2]
    proj = p_C[..., :2] / jnp.maximum(jnp.abs(z[..., None]), 1e-6)
    err_px2 = jnp.sum((proj - uv[None]) ** 2, axis=-1) * focal * focal
    inl = (err_px2 < threshold_px2) & (z > 0) & mask[None, :]
    counts = jnp.where(finite, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(counts)
    return RansacResult(
        inliers=inl[best],
        num_inliers=jnp.maximum(counts[best], 0),
        model=Ms[best].ravel(),
        success=counts[best] >= 6,
    )


@functools.partial(jax.jit, static_argnames=("n_hyp_per_cam",))
def ransac_absolute_rig(
    key,
    r_SC: jnp.ndarray,  # (C, 3) camera-in-body translations
    q_SC: jnp.ndarray,  # (C, 4) camera-in-body quaternions (xyzw)
    points_W: jnp.ndarray,  # (C, K, 3) landmark positions per camera slot
    bearings_C: jnp.ndarray,  # (C, K, 3) unit bearings in each camera frame
    mask: jnp.ndarray,  # (C, K) candidate correspondences
    focal: jnp.ndarray,  # (C,) focal lengths for the pixel threshold
    threshold_px2: jnp.ndarray = 9.0,
    n_hyp_per_cam: int = 64,
) -> RansacResult:
    """Rig-level absolute-pose RANSAC pooling ALL cameras' correspondences
    (ref FrameNoncentralAbsoluteAdapter + GP3P runRansac3d2d,
    Frontend.cpp:575-642): hypotheses come from per-camera central 3-pt
    Kneip P3P solves (planar-robust, matching the reference's GP3P) mapped
    through the known extrinsics to a body pose T_SW, and every hypothesis
    is scored against every camera's correspondences. Cameras with <3
    candidates contribute no hypotheses but still vote.

    Model: flattened [R_SW | t_SW] (3,4); p_S = R_SW p_W + t_SW.
    Returns inliers with shape (C, K).
    """
    from ..kinematics import quat_to_matrix

    C, K = mask.shape
    keys = jax.random.split(key, C)
    C_SC = jax.vmap(quat_to_matrix)(q_SC)  # (C, 3, 3)
    uv = bearings_C[..., :2] / jnp.maximum(bearings_C[..., 2:3], 1e-6)

    def models_of_cam(c_key, pts_c, bear_c, m_c, C_sc, r_sc):
        Ms = _p3p_absolute_models(c_key, pts_c, bear_c, m_c, n_hyp_per_cam)
        # T_SW = T_SC ∘ T_CW:  R_SW = C_SC·R_CW,  t_SW = C_SC·t_C + r_SC
        R_SW = jnp.einsum("ab,hbj->haj", C_sc, Ms[:, :, :3])
        t_SW = jnp.einsum("ab,hb->ha", C_sc, Ms[:, :, 3]) + r_sc
        valid = jnp.sum(m_c) >= 3
        return jnp.concatenate([R_SW, t_SW[..., None]], axis=-1), valid

    Ms_c, valid_c = jax.vmap(models_of_cam)(
        keys, points_W, bearings_C, mask, C_SC, r_SC
    )  # (C, H·4, 3, 4), (C,)
    M = Ms_c.reshape(-1, 3, 4)  # (C·H·4, 3, 4)
    hyp_valid = jnp.repeat(valid_c, n_hyp_per_cam * 4)  # (C·H·4,)
    hyp_valid &= jnp.all(jnp.isfinite(M.reshape(M.shape[0], -1)), axis=-1)

    # score every hypothesis against every camera's correspondences
    p_S = (
        jnp.einsum("hij,ckj->hcki", M[:, :, :3], points_W) + M[:, None, None, :, 3]
    )  # (H', C, K, 3)
    p_C = jnp.einsum("cab,hckb->hcka", C_SC.transpose(0, 2, 1),
                     p_S - r_SC[None, :, None, :])
    z = p_C[..., 2]
    proj = p_C[..., :2] / jnp.maximum(jnp.abs(z[..., None]), 1e-6)
    err_px2 = jnp.sum((proj - uv[None]) ** 2, axis=-1) * (
        focal[None, :, None] ** 2
    )
    inl = (err_px2 < threshold_px2) & (z > 0) & mask[None]
    counts = jnp.where(hyp_valid, jnp.sum(inl, axis=(1, 2)), -1)
    best = jnp.argmax(counts)
    return RansacResult(
        inliers=inl[best],
        num_inliers=jnp.maximum(counts[best], 0),
        model=M[best].ravel(),
        success=counts[best] >= 6,
    )


@jax.jit
def decompose_essential(
    E: jnp.ndarray,  # (3, 3)
    f_a: jnp.ndarray,  # (N, 3) bearings frame A
    f_b: jnp.ndarray,  # (N, 3) bearings frame B
    mask: jnp.ndarray,  # (N,) inliers to vote with
):
    """E -> (R_AB, t_AB unit) by cheirality voting over the four candidates
    (the reference gets [R|t] directly from OpenGV's Stewenius solver;
    the 8-point path recovers it here). Convention: f_a ≈ R_AB f_b·λ + t·μ,
    epipolar constraint f_aᵀ [t]x R f_b = 0 with E = [t]x R."""
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    # enforce proper rotations
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt * d
    R2 = U @ W.T @ Vt * d
    t1 = U[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t1, -t1, t1, -t1])

    def depth_votes(R, t):
        # triangulate by midpoint along each pair; count points with positive
        # depth in both views
        rb = jnp.einsum("ij,nj->ni", R, f_b)
        # solve [f_a, -rb] [la, lb]^T = t (least squares per pair, 2x2 normal eqs)
        a11 = jnp.sum(f_a * f_a, axis=1)
        a12 = -jnp.sum(f_a * rb, axis=1)
        a22 = jnp.sum(rb * rb, axis=1)
        b1 = jnp.sum(f_a * t[None, :], axis=1)
        b2 = -jnp.sum(rb * t[None, :], axis=1)
        det = a11 * a22 - a12 * a12
        safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        la = (a22 * b1 - a12 * b2) / safe
        lb = (-a12 * b1 + a11 * b2) / safe
        return jnp.sum((la > 0) & (lb > 0) & mask)

    votes = jax.vmap(depth_votes)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best]

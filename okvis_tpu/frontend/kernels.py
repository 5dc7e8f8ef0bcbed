"""Jitted fixed-shape frontend kernels.

Every per-frame vision operation is a jit-compiled function over
fixed-capacity padded arrays — compiled once per (capacity, camera-spec) and
then retrace-free for the whole sequence. Eager vmap re-traces on every call
(Python overhead ≫ compute for 400-keypoint workloads), so the host frontend
must only ever call these.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import kinematics as kin
from ..cameras import pinhole
from ..cameras.pinhole import CameraSpec
from ..ops.hamming import MAX_DIST, masked_distance_matrix, mutual_best_assignment
from .triangulation import triangulate_fast


@functools.partial(jax.jit, static_argnames=("threshold",))
def plain_match(desc_a, desc_b, mask_a, mask_b, threshold: int = 60) -> jnp.ndarray:
    dist = masked_distance_matrix(desc_a, desc_b, mask_a, mask_b)
    return mutual_best_assignment(dist, threshold)


@functools.partial(jax.jit, static_argnames=("spec",))
def project_hpoints(
    spec: CameraSpec, intrinsics: jnp.ndarray, T_CW: kin.SE3, hp_W: jnp.ndarray
):
    """Project (K, 4) homogeneous world points -> ((K,2) uv, (K,) ok)."""
    hp_C = jax.vmap(lambda p: kin.transform_hpoint(T_CW, p))(hp_W)
    uv, flags = jax.vmap(
        lambda p: pinhole.project_homogeneous(spec, intrinsics, p)
    )(hp_C)
    return uv, flags == pinhole.STATUS_OK


def _project_hpoints_with_cov(
    spec: CameraSpec,
    intrinsics: jnp.ndarray,
    T_CW: kin.SE3,
    hp_W: jnp.ndarray,  # (K, 4)
    sigma_pos2: jnp.ndarray,  # scalar: isotropic position variance [m²]
):
    """Project landmarks and propagate an isotropic position uncertainty to a
    2×2 image covariance (ref VioKeyframeWindowMatchingAlgorithm::doSetup,
    VioKeyframeWindowMatchingAlgorithm.cpp:199-209: U = J·P_C·Jᵀ with
    P_C = σ²·I on the position block). Returns (uv (K,2), cov (K,2,2), ok)."""
    hp_C = jax.vmap(lambda p: kin.transform_hpoint(T_CW, p))(hp_W)
    uv, flags = jax.vmap(
        lambda p: pinhole.project_homogeneous(spec, intrinsics, p)
    )(hp_C)
    J = jax.vmap(
        lambda p: pinhole.project_homogeneous_jacobian(spec, intrinsics, p)
    )(hp_C)  # (K, 2, 4)
    Jp = J[:, :, :3]
    cov = sigma_pos2 * jnp.einsum("kia,kja->kij", Jp, Jp)  # (K, 2, 2)
    return uv, cov, flags == pinhole.STATUS_OK


def _chi2_gate(
    pred_uv: jnp.ndarray,  # (K, 2) predicted projections (A rows)
    pred_cov: jnp.ndarray,  # (K, 2, 2) projection covariance (A rows)
    uv_b: jnp.ndarray,  # (K, 2) current-frame keypoints
    std_b: jnp.ndarray,  # (K,) current-frame keypoint stddev [px]
    gate_ok: jnp.ndarray,  # (K,) valid A rows
) -> jnp.ndarray:
    """(K_A, K_B) chi² of the 3D-2D association test
    err·U⁻¹·err with U = std_b²·I + pred_cov (ref verifyMatch chi²<4 gate,
    VioKeyframeWindowMatchingAlgorithm.cpp:318-336)."""
    err = pred_uv[:, None, :] - uv_b[None, :, :]  # (A, B, 2)
    s2 = std_b * std_b  # (B,)
    u11 = pred_cov[:, None, 0, 0] + s2[None, :]
    u22 = pred_cov[:, None, 1, 1] + s2[None, :]
    u12 = jnp.broadcast_to(pred_cov[:, None, 0, 1], u11.shape)
    det = jnp.maximum(u11 * u22 - u12 * u12, 1e-12)
    e0, e1 = err[..., 0], err[..., 1]
    chi2 = (u22 * e0 * e0 - 2.0 * u12 * e0 * e1 + u11 * e1 * e1) / det
    return jnp.where(gate_ok[:, None], chi2, jnp.inf)


@functools.partial(jax.jit, static_argnames=("spec",))
def project_points(
    spec: CameraSpec, intrinsics: jnp.ndarray, T_CW: kin.SE3, p_W: jnp.ndarray
):
    """Project (K, 3) world points -> ((K,2) uv, (K,) ok)."""
    p_C = jax.vmap(lambda p: kin.transform_point(T_CW, p))(p_W)
    uv, flags = jax.vmap(lambda p: pinhole.project(spec, intrinsics, p))(p_C)
    return uv, flags == pinhole.STATUS_OK


_SQRT_SQRT2 = 1.189207115002721  # sqrt(sqrt(2)), ref raySigma scale


@functools.partial(jax.jit, static_argnames=("spec_a", "spec_b"))
def triangulate_pairs(
    spec_a: CameraSpec,
    spec_b: CameraSpec,
    intr_a: jnp.ndarray,
    intr_b: jnp.ndarray,
    T_WC_a: kin.SE3,
    T_WC_b: kin.SE3,
    uv_a: jnp.ndarray,  # (K, 2) paired keypoints
    uv_b: jnp.ndarray,  # (K, 2)
    pair_mask: jnp.ndarray,  # (K,)
    std_a: jnp.ndarray,  # (K,) keypoint stddev in A [px] (0.8·size/12)
    std_b: jnp.ndarray,  # (K,) paired keypoint stddev in B [px]
    sigma_t2: jnp.ndarray,  # scalar: relative-pose translation variance [m²]
):
    """Batched two-view triangulation of matched keypoint pairs with the
    reference ProbabilisticStereoTriangulator's gating semantics
    (/root/reference/okvis_frontend/src/ProbabilisticStereoTriangulator.cpp:59-394):

    - ray sigma = √√2 · max(stdA, stdB) / min(fuA, fuB) per pair (keypoint-
      size scaled, ref doSetup raySigmas + the max in verifyMatch) feeding
      triangulateFast's parallel/chi² decisions;
    - post-triangulation reprojection chi² ≤ 4 in BOTH frames (ref
      computeReprojectionError4 calls at :208-221), with the relative-pose
      prior translation covariance UOplus (ref doSetup :127-141) folded into
      frame B's gate covariance U_B = stdB²·I + σt²·J_B·J_Bᵀ — the batched
      equivalent of the reference's pose-prior Gauss-Newton machinery;
    - depth observability: move the point 80% toward the baseline midpoint
      and reproject (ref "evaluate again closer", :330-338); if the weighted
      residual stays < 4 the depth is unobservable → can_init=False.

    Returns (hp_W (K,4), valid (K,), parallel (K,), can_init (K,))."""
    K = uv_a.shape[0]
    rays_a = jax.vmap(lambda p: pinhole.back_project(spec_a, intr_a, p))(uv_a)
    rays_b = jax.vmap(lambda p: pinhole.back_project(spec_b, intr_b, p))(uv_b)
    e_a = kin.quat_rotate(T_WC_a.q[None], rays_a)
    e_a = e_a / jnp.linalg.norm(e_a, axis=-1, keepdims=True)
    e_b = kin.quat_rotate(T_WC_b.q[None], rays_b)
    e_b = e_b / jnp.linalg.norm(e_b, axis=-1, keepdims=True)
    sigma = (
        _SQRT_SQRT2
        * jnp.maximum(std_a, std_b)
        / jnp.minimum(intr_a[0], intr_b[0])
    ).astype(uv_a.dtype)
    out = triangulate_fast(
        jnp.tile(T_WC_a.r, (K, 1)), e_a, jnp.tile(T_WC_b.r, (K, 1)), e_b, sigma
    )

    # ---- reprojection gates in both frames (chi² ≤ 4) ----
    T_CW_a = kin.inverse(T_WC_a)
    T_CW_b = kin.inverse(T_WC_b)

    def reproject(T_CW, spec, intr, hp):
        hp_C = jax.vmap(lambda p: kin.transform_hpoint(T_CW, p))(hp)
        uv, flags = jax.vmap(
            lambda p: pinhole.project_homogeneous(spec, intr, p)
        )(hp_C)
        J = jax.vmap(
            lambda p: pinhole.project_homogeneous_jacobian(spec, intr, p)
        )(hp_C)[:, :, :3]
        return uv, flags == pinhole.STATUS_OK, J

    proj_a, ok_a, _ = reproject(T_CW_a, spec_a, intr_a, out.hp)
    proj_b, ok_b, J_b = reproject(T_CW_b, spec_b, intr_b, out.hp)
    err_a = proj_a - uv_a
    chi2_a = jnp.sum(err_a * err_a, axis=-1) / jnp.maximum(std_a * std_a, 1e-12)
    # U_B = stdB²·I + σt²·J·Jᵀ (2×2), closed-form inverse quadratic form
    err_b = proj_b - uv_b
    U = sigma_t2 * jnp.einsum("kia,kja->kij", J_b, J_b)
    u11 = U[:, 0, 0] + std_b * std_b
    u22 = U[:, 1, 1] + std_b * std_b
    u12 = U[:, 0, 1]
    det = jnp.maximum(u11 * u22 - u12 * u12, 1e-12)
    e0, e1 = err_b[..., 0], err_b[..., 1]
    chi2_b = (u22 * e0 * e0 - 2.0 * u12 * e0 * e1 + u11 * e1 * e1) / det
    valid = (
        out.valid & pair_mask & ok_a & ok_b & (chi2_a <= 4.0) & (chi2_b <= 4.0)
    )

    # ---- depth observability ("evaluate again closer") ----
    mid_W = 0.5 * (T_WC_a.r + T_WC_b.r)  # baseline midpoint
    w = out.hp[..., 3:4]
    closer = jnp.concatenate(
        [0.8 * (out.hp[..., :3] - mid_W * w) + mid_W * w, w], axis=-1
    )
    proj_c, ok_c, _ = reproject(T_CW_b, spec_b, intr_b, closer)
    err_c = proj_c - uv_b
    chi2_c = jnp.sum(err_c * err_c, axis=-1) / jnp.maximum(std_b * std_b, 1e-12)
    can_init = (~out.parallel) & (ok_c & (chi2_c >= 4.0))
    return out.hp, valid, out.parallel, can_init


@functools.partial(jax.jit, static_argnames=("spec",))
def back_project_batch(spec: CameraSpec, intrinsics: jnp.ndarray, uv: jnp.ndarray):
    """(K,2) pixels -> (K,3) unit bearings in camera frame."""
    rays = jax.vmap(lambda p: pinhole.back_project(spec, intrinsics, p))(uv)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# batched-pair variants: one launch for ALL (source-frame, camera) match
# tasks of a data-association round — host dispatch count is the full-
# pipeline bottleneck on accelerators (each call pays transfer latency)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec", "threshold"))
def gated_match_pairs(
    spec: CameraSpec,
    intrinsics: jnp.ndarray,
    desc_a: jnp.ndarray,  # (P, K, 16) source descriptors per pair
    mask_a: jnp.ndarray,  # (P, K)
    hp_rows: jnp.ndarray,  # (P, K, 4) landmark homogeneous points per A row
    T_CW: kin.SE3,  # batched (P,...) current-frame camera-from-world per pair
    desc_b: jnp.ndarray,  # (K, 16) current-frame descriptors (shared)
    mask_b: jnp.ndarray,  # (K,)
    uv_b: jnp.ndarray,  # (K, 2)
    std_b: jnp.ndarray,  # (K,) current keypoint stddev [px]
    sigma_pos2: jnp.ndarray,  # scalar position variance for the chi² gate
    gate_radius: jnp.ndarray,  # coarse pixel cap on top of chi² (<=0: off)
    threshold: int = 60,
):
    """3D-2D chi²-gated matching for P source frames against the current
    frame in ONE program (the conflict-loser recovery round).
    Returns (assign (P, K), pred_ok (P, K))."""

    def one(desc_a_p, mask_a_p, hp_p, T_CW_p):
        uv_pred, cov, ok = _project_hpoints_with_cov(
            spec, intrinsics, T_CW_p, hp_p, sigma_pos2
        )
        gate_ok = mask_a_p & ok
        chi2 = _chi2_gate(uv_pred, cov, uv_b, std_b, gate_ok)
        dist = masked_distance_matrix(desc_a_p, desc_b, gate_ok, mask_b)
        dist = jnp.where(chi2 >= 4.0, MAX_DIST, dist)
        pred = jnp.where(gate_ok[:, None], uv_pred, 1e9)
        d2 = jnp.sum((pred[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
        dist = jnp.where(
            (gate_radius > 0) & (d2 > gate_radius * gate_radius), MAX_DIST, dist
        )
        return mutual_best_assignment(dist, threshold), gate_ok

    return jax.vmap(one)(desc_a, mask_a, hp_rows, T_CW)


def _associate_onecam(
    spec: CameraSpec,
    threshold: int,
    intr: jnp.ndarray,  # (N,)
    desc_a: jnp.ndarray,  # (P, K, 16) source descriptors
    sel3d_a: jnp.ndarray,  # (P, K) source rows carrying an INITIALIZED landmark
    hp_rows: jnp.ndarray,  # (P, K, 4) landmark homogeneous points per row
    free2d_a: jnp.ndarray,  # (P, K) source rows free for 2D-2D
    uv_a: jnp.ndarray,  # (P, K, 2) source keypoints
    std_a: jnp.ndarray,  # (P, K) source keypoint stddev [px] (0.8·size/12)
    T_CW: kin.SE3,  # current camera-from-world
    T_WC_a: kin.SE3,  # batched (P,...) source camera poses
    T_WC_b: kin.SE3,  # current camera pose
    desc_b: jnp.ndarray,  # (K, 16)
    free_b: jnp.ndarray,  # (K,) free at round start
    uv_b: jnp.ndarray,  # (K, 2)
    std_b: jnp.ndarray,  # (K,) current keypoint stddev [px] (0.8·size/12)
    sel_prev: jnp.ndarray,  # (K,) current keypoints already carrying landmarks
    pts_prev: jnp.ndarray,  # (K, 3) their world positions (RANSAC candidates)
    sigma_pos2: jnp.ndarray,  # scalar position variance for the chi² gate
    gate_radius: jnp.ndarray,  # coarse pixel cap on top of chi² (<=0: off)
):
    """Single-camera body of the fused association round (see
    associate_multicam)."""
    K = free_b.shape[0]

    # ---- 3D-2D gated matching, every source in one vmap ----
    def one_src_3d(d_a, s_a, hp_p):
        uv_pred, cov, ok = _project_hpoints_with_cov(
            spec, intr, T_CW, hp_p, sigma_pos2
        )
        gate_ok = s_a & ok
        chi2 = _chi2_gate(uv_pred, cov, uv_b, std_b, gate_ok)
        dist = masked_distance_matrix(d_a, desc_b, gate_ok, free_b)
        dist = jnp.where(chi2 >= 4.0, MAX_DIST, dist)
        # optional coarse disc cap (reference has none; kept for configs
        # that want a hard pixel bound)
        pred = jnp.where(gate_ok[:, None], uv_pred, 1e9)
        d2 = jnp.sum((pred[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
        dist = jnp.where(
            (gate_radius > 0) & (d2 > gate_radius * gate_radius), MAX_DIST, dist
        )
        return mutual_best_assignment(dist, threshold)

    assign3 = jax.vmap(one_src_3d)(desc_a, sel3d_a, hp_rows)  # (P, K)

    # device-side post-3D-2D free mask: any source's claim removes the
    # keypoint from the 2D-2D pool (conservative vs the host resolution,
    # which may reject individual claims — those keypoints simply skip this
    # round's 2D-2D, matching the drop-on-conflict policy)
    hit3 = assign3 >= 0
    idx = jnp.where(hit3, assign3, K).reshape(-1)
    claimed = jnp.zeros((K,), bool).at[idx].set(True, mode="drop")
    free_b2 = free_b & ~claimed

    # ---- RANSAC candidate tables for the rig-level absolute-pose RANSAC
    # run after the camera vmap (ref FrameNoncentralAbsoluteAdapter collects
    # ALL current-frame landmark associations, FrameNoncentralAbsoluteAdapter
    # .cpp + runRansac3d2d Frontend.cpp:575-642): this round's candidates
    # (per claimed target keypoint the NEWEST source's landmark wins —
    # scatter oldest→newest reversed so the first source's write lands last)
    # merged with the keypoints that already carried landmarks.
    dtype = hp_rows.dtype
    hp_flat = hp_rows[::-1].reshape(-1, 4)
    w = hp_flat[:, 3]
    pts_flat = hp_flat[:, :3] / jnp.where(jnp.abs(w) < 1e-8, 1.0, w)[:, None]
    idx_rev = jnp.where(hit3, assign3, K)[::-1].reshape(-1)
    pts_b = jnp.zeros((K, 3), dtype).at[idx_rev].set(pts_flat, mode="drop")
    pts_b = jnp.where(sel_prev[:, None], pts_prev, pts_b)
    ransac_sel = claimed | sel_prev
    bear_b = back_project_batch(spec, intr, uv_b)

    # ---- 2D-2D matching among the remaining free keypoints ----
    assign2 = jax.vmap(
        lambda d_a, m_a: plain_match(d_a, desc_b, m_a, free_b2, threshold=threshold)
    )(desc_a, free2d_a)  # (P, K)

    # ---- triangulate every 2D-2D assignment in-launch; the relative-pose
    # prior translation variance (velocity-scaled σ², ref doSetup :131-141)
    # feeds the gate covariance ----
    pmask = assign2 >= 0
    ib = jnp.where(pmask, assign2, 0)
    uv_b_pair = uv_b[ib]  # (P, K, 2)
    std_b_pair = std_b[ib]  # (P, K)

    def tri_one(Ta, ua, ub, m, sa, sb):
        return triangulate_pairs(
            spec, spec, intr, intr, Ta, T_WC_b, ua, ub, m, sa, sb, sigma_pos2
        )

    hp, valid, par, can_init = jax.vmap(tri_one)(
        T_WC_a, uv_a, uv_b_pair, pmask, std_a, std_b_pair
    )

    # post-2D-2D free estimate (feeds the fused stereo matching): only
    # VALID triangulations claim their keypoint — a chi²-rejected match
    # creates no landmark on the host, so the keypoint stays available for
    # the wide-baseline stereo phase (matches the sequential-path behavior)
    idx2 = jnp.where(pmask & valid, assign2, K).reshape(-1)
    claimed2 = jnp.zeros((K,), bool).at[idx2].set(True, mode="drop")
    free_b3 = free_b2 & ~claimed2
    return (assign3, assign2, hp, valid, par, can_init, pts_b, ransac_sel,
            bear_b, free_b3)


def _prop_sigma_pos2(sb_b: jnp.ndarray) -> jnp.ndarray:
    """Velocity-scaled position variance for the chi² gate, computed on
    device from the PROPAGATED speed/bias (ref doSetup :131-141:
    σ² = max(1,|v|)²·1e-2 in the IMU window) — keeps the propagation result
    on device so addStates never blocks on its own."""
    v = jnp.linalg.norm(sb_b[:3])
    s = jnp.maximum(1.0, v)
    return s * s * 1e-2


@functools.partial(jax.jit, static_argnames=("spec", "threshold"))
def associate_onecam(
    spec, key, intr, desc_a, sel3d_a, hp_rows, free2d_a, uv_a, std_a,
    T_WS_b, sb_b, T_WC_a, desc_b, free_b, uv_b, std_b, sel_prev, pts_prev,
    T_SC, gate_radius, ransac_threshold_px2, threshold=60,
):
    """Fused association round for ONE camera (mixed-spec rigs fall back to
    one launch per camera; the folded RANSAC then pools only this camera's
    correspondences instead of the whole rig's). The current camera pose and
    gate variance are composed IN-KERNEL from the (possibly still
    device-resident) propagated body state."""
    from .ransac import ransac_absolute_rig

    T_WC_b = kin.compose(T_WS_b, T_SC)
    T_CW = kin.inverse(T_WC_b)
    sigma_pos2 = _prop_sigma_pos2(sb_b)
    out = _associate_onecam(
        spec, threshold, intr, desc_a, sel3d_a, hp_rows, free2d_a, uv_a,
        std_a, T_CW, T_WC_a, T_WC_b, desc_b, free_b, uv_b, std_b, sel_prev,
        pts_prev, sigma_pos2, gate_radius,
    )
    (assign3, assign2, hp, valid, par, can_init, pts_b, ransac_sel, bear_b,
     _f3) = out
    rr = ransac_absolute_rig(
        key, T_SC.r[None], T_SC.q[None], pts_b[None], bear_b[None],
        ransac_sel[None], intr[0][None], threshold_px2=ransac_threshold_px2,
    )
    return (assign3, assign2, hp, valid, par, can_init,
            rr.inliers[0], rr.num_inliers, rr.success)


@functools.partial(jax.jit, static_argnames=("spec", "threshold", "stereo_pairs"))
def associate_multicam(
    spec: CameraSpec,
    key,  # PRNG key for the folded rig-level RANSAC
    intrinsics: jnp.ndarray,  # (C, N)
    desc_a: jnp.ndarray,  # (P, C, K, 16)
    sel3d_a: jnp.ndarray,  # (P, C, K)
    hp_rows: jnp.ndarray,  # (P, C, K, 4)
    free2d_a: jnp.ndarray,  # (P, C, K)
    uv_a: jnp.ndarray,  # (P, C, K, 2)
    std_a: jnp.ndarray,  # (P, C, K) source keypoint stddev [px]
    T_WS_b: kin.SE3,  # current PROPAGATED body pose (may be device-resident)
    sb_b: jnp.ndarray,  # (9,) propagated speed/bias (gate variance source)
    T_WC_a: kin.SE3,  # batched (P, C, ...) source camera poses
    desc_b: jnp.ndarray,  # (C, K, 16)
    free_b: jnp.ndarray,  # (C, K)
    uv_b: jnp.ndarray,  # (C, K, 2)
    std_b: jnp.ndarray,  # (C, K) current keypoint stddev [px]
    sel_prev: jnp.ndarray,  # (C, K) keypoints already carrying landmarks
    pts_prev: jnp.ndarray,  # (C, K, 3) their world positions
    T_SC: kin.SE3,  # batched (C,...) camera extrinsics (pose compose + rig RANSAC)
    gate_radius: jnp.ndarray,
    ransac_threshold_px2: jnp.ndarray,
    threshold: int = 60,
    stereo_pairs: tuple = (),
):
    """ONE launch for a complete data-association round: 3D-2D chi²-gated
    matching, RIG-LEVEL absolute-pose RANSAC over all cameras' 3D-2D
    associations, 2D-2D matching of the leftovers, and triangulation of
    every 2D-2D match — over ALL source frames and ALL cameras of the rig.

    This is the fused form of the reference's matchToKeyframes +
    runRansac3d2d + matchToLastFrame sequence (Frontend.cpp:153-233,
    575-642; one DenseMatcher::match + triangulation per (source, camera,
    phase) on a thread pool, then a sequential OpenGV noncentral RANSAC):
    host dispatch latency dominates per-frame cost on accelerators, so the
    whole round is a single XLA program. Requires a uniform camera model
    across the rig (vmapped over the camera axis).

    When `stereo_pairs` names overlapping camera pairs, intra-frame stereo
    matching + triangulation (matchStereo, Frontend.cpp:521-572) rides the
    SAME launch, over the device-side post-association free estimates; the
    host resolves those results after the (separate) last-frame round,
    dropping any pair touching a keypoint claimed in between — the usual
    drop-on-conflict policy.

    Returns (assign3 (P,C,K), assign2 (P,C,K), hp_W (P,C,K,4),
    tri_valid (P,C,K), tri_parallel (P,C,K), tri_can_init (P,C,K),
    ransac_inliers (C,K), ransac_num_inliers (), ransac_success (),
    stereo (assign (S,K), hp (S,K,4), valid (S,K), parallel (S,K),
    can_init (S,K))).
    """
    from .ransac import ransac_absolute_rig

    # compose the current camera poses from the propagated body pose —
    # in-kernel so the host never has to fetch the propagation first
    T_WC_b = jax.vmap(lambda tc: kin.compose(T_WS_b, tc))(T_SC)
    T_CW = jax.vmap(kin.inverse)(T_WC_b)
    sigma_pos2 = _prop_sigma_pos2(sb_b)

    def per_cam(intr, d_a, s3, hp_r, f2a, ua, s_a, T_CW_c, T_WC_a_c,
                T_WC_b_c, d_b, f_b, u_b, s_b, sp, pp):
        return _associate_onecam(
            spec, threshold, intr, d_a, s3, hp_r, f2a, ua, s_a,
            T_CW_c, T_WC_a_c, T_WC_b_c, d_b, f_b, u_b, s_b, sp, pp,
            sigma_pos2, gate_radius,
        )

    (assign3, assign2, hp, valid, par, can_init, pts_b, ransac_sel, bear_b,
     free_b3) = jax.vmap(
        per_cam,
        in_axes=(0, 1, 1, 1, 1, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0),
        out_axes=(1, 1, 1, 1, 1, 1, 0, 0, 0, 0),
    )(
        intrinsics, desc_a, sel3d_a, hp_rows, free2d_a, uv_a, std_a,
        T_CW, T_WC_a, T_WC_b, desc_b, free_b, uv_b, std_b, sel_prev, pts_prev,
    )
    rr = ransac_absolute_rig(
        key, T_SC.r, T_SC.q, pts_b, bear_b, ransac_sel,
        intrinsics[:, 0], threshold_px2=ransac_threshold_px2,
    )

    stereo = []
    for ca, cb in stereo_pairs:
        s_out = stereo_match_triangulate(
            spec, spec, intrinsics[ca], intrinsics[cb],
            desc_b[ca], desc_b[cb], free_b3[ca], free_b3[cb],
            uv_b[ca], uv_b[cb],
            kin.SE3(r=T_WC_b.r[ca], q=T_WC_b.q[ca]),
            kin.SE3(r=T_WC_b.r[cb], q=T_WC_b.q[cb]),
            std_b[ca], std_b[cb],
            threshold=threshold,
        )
        stereo.append(s_out)
    if stereo:
        stereo_out = tuple(
            jnp.stack([s[i] for s in stereo]) for i in range(5)
        )
    else:
        K = free_b.shape[1]
        stereo_out = (
            jnp.full((0, K), -1, jnp.int32), jnp.zeros((0, K, 4)),
            jnp.zeros((0, K), bool), jnp.zeros((0, K), bool),
            jnp.zeros((0, K), bool),
        )
    return (assign3, assign2, hp, valid, par, can_init,
            rr.inliers, rr.num_inliers, rr.success, stereo_out)


@functools.partial(jax.jit, static_argnames=("spec_a", "spec_b", "threshold"))
def stereo_match_triangulate(
    spec_a: CameraSpec,
    spec_b: CameraSpec,
    intr_a: jnp.ndarray,
    intr_b: jnp.ndarray,
    desc_a: jnp.ndarray,  # (K, 16)
    desc_b: jnp.ndarray,  # (K, 16)
    free_a: jnp.ndarray,  # (K,)
    free_b: jnp.ndarray,  # (K,)
    uv_a: jnp.ndarray,  # (K, 2)
    uv_b: jnp.ndarray,  # (K, 2)
    T_WC_a: kin.SE3,
    T_WC_b: kin.SE3,
    std_a: jnp.ndarray,  # (K,) keypoint stddev [px]
    std_b: jnp.ndarray,  # (K,)
    threshold: int = 60,
):
    """Intra-multiframe stereo matching + triangulation in ONE launch
    (Frontend.cpp:521-572 matchStereo + setBestMatch triangulation).
    Same-frame pair: the relative extrinsics carry the reference's fixed
    4e-8 translation variance (doSetup :140).
    Returns (assign (K,), hp_W (K,4), valid (K,), parallel (K,),
    can_init (K,))."""
    assign = plain_match(desc_a, desc_b, free_a, free_b, threshold=threshold)
    pmask = assign >= 0
    ib = jnp.where(pmask, assign, 0)
    hp, valid, par, can_init = triangulate_pairs(
        spec_a, spec_b, intr_a, intr_b, T_WC_a, T_WC_b, uv_a, uv_b[ib], pmask,
        std_a, std_b[ib], jnp.asarray(4e-8, uv_a.dtype),
    )
    return assign, hp, valid, par, can_init


@functools.partial(jax.jit, static_argnames=("spec",))
def ransac_2d2d_px(
    key_rot,
    key_rel,
    spec: CameraSpec,
    intrinsics: jnp.ndarray,
    uv_a: jnp.ndarray,  # (K, 2)
    uv_b: jnp.ndarray,  # (K, 2)
    mask: jnp.ndarray,  # (K,)
    focal,
    threshold_px2,
):
    """back-project both frames + rotation-only AND relative-pose RANSAC in
    ONE launch (was four). Returns (rot_result, rel_result, bear_a, bear_b)
    — bearings feed the essential-matrix decomposition on init."""
    from .ransac import ransac_relative_pose, ransac_rotation_only

    bear_a = back_project_batch(spec, intrinsics, uv_a)
    bear_b = back_project_batch(spec, intrinsics, uv_b)
    rot = ransac_rotation_only(
        key_rot, bear_a, bear_b, mask, focal=focal, threshold_px2=threshold_px2
    )
    rel = ransac_relative_pose(
        key_rel, bear_a, bear_b, mask, focal=focal, threshold_px2=threshold_px2
    )
    return rot, rel, bear_a, bear_b

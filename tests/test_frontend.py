"""Frontend component tests: matching (testMatcher analog), detection,
description, triangulation, RANSAC, keyframe heuristic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import kinematics as kin
from okvis_tpu.frontend.detection import detect_keypoints
from okvis_tpu.frontend.brisk import describe_keypoints, detect_and_describe
from okvis_tpu.frontend.keyframe import convex_hull, need_new_keyframe, polygon_area
from okvis_tpu.frontend.ransac import (
    ransac_absolute_pose,
    ransac_relative_pose,
    ransac_rotation_only,
)
from okvis_tpu.frontend.triangulation import triangulate_fast
from okvis_tpu.ops.hamming import (
    hamming_matrix_mxu,
    hamming_matrix_xla,
    masked_distance_matrix,
    match_descriptors,
    mutual_best_assignment,
)


# ---------------------------------------------------------------- matching
def test_hamming_mxu_matches_popcount(rng):
    a = jnp.asarray(rng.integers(0, 2**32, (40, 16), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (50, 16), dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(hamming_matrix_mxu(a, b)), np.asarray(hamming_matrix_xla(a, b))
    )


def test_match_descriptors_identity(rng):
    """Analog of reference testMatcher.cpp: identical descriptors must match
    one-to-one."""
    d = jnp.asarray(rng.integers(0, 2**32, (30, 16), dtype=np.uint32))
    perm = rng.permutation(30)
    m = match_descriptors(
        d, d[jnp.asarray(perm)], jnp.ones(30, bool), jnp.ones(30, bool), threshold=60
    )
    expected = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_match_respects_threshold_and_mask(rng):
    d1 = jnp.asarray(rng.integers(0, 2**32, (10, 16), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (10, 16), dtype=np.uint32))
    # random descriptors differ by ~256 bits >> 60 threshold
    m = match_descriptors(d1, d2, jnp.ones(10, bool), jnp.ones(10, bool), threshold=60)
    assert np.all(np.asarray(m) == -1)
    # masked-out rows never match even against themselves
    m2 = match_descriptors(
        d1, d1, jnp.ones(10, bool), jnp.zeros(10, bool), threshold=60
    )
    assert np.all(np.asarray(m2) == -1)


def test_mutual_best_one_to_one(rng):
    # two A rows competing for the same B: closer one wins, other takes next best
    dist = jnp.asarray(
        [[5, 100, 100], [8, 9, 100], [100, 100, 7]], dtype=jnp.int32
    )
    m = mutual_best_assignment(dist, threshold=60)
    assert list(np.asarray(m)) == [0, 1, 2]


# ---------------------------------------------------------------- detection
def synth_corner_image(rng, H=120, W=160, n=12):
    """Isolated bright squares on a grid: true corners = the 4 square corners."""
    img = np.full((H, W), 128.0, np.float32)
    img += rng.normal(0, 1.0, (H, W)).astype(np.float32)
    pts = []
    cells = [(cy, cx) for cy in range(3) for cx in range(4)]
    rng.shuffle(cells)
    for cy, cx in cells[:n]:
        y0 = 20 + cy * 30 + int(rng.uniform(0, 6))
        x0 = 20 + cx * 34 + int(rng.uniform(0, 6))
        sz = 12
        img[y0 : y0 + sz, x0 : x0 + sz] += 70.0
        pts += [(x, y) for x in (x0 - 0.5, x0 + sz - 0.5) for y in (y0 - 0.5, y0 + sz - 0.5)]
    return img, np.asarray(pts, np.float32)


def test_detect_keypoints_finds_corners(rng):
    img, pts = synth_corner_image(rng)
    kps = detect_keypoints(jnp.asarray(img), threshold=10.0, max_keypoints=64, border=8)
    found = np.asarray(kps.uv)[np.asarray(kps.mask)]
    assert len(found) >= 10
    # most detections should be near a true corner (within 2 px)
    d = np.linalg.norm(found[:, None, :] - pts[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 2.0


def test_descriptors_stable_under_translation(rng):
    img, _ = synth_corner_image(rng, n=15)
    kps = detect_keypoints(jnp.asarray(img), threshold=10.0, max_keypoints=32, border=16)
    desc1 = describe_keypoints(jnp.asarray(img), kps)
    # integer-shifted image, shifted keypoints -> near-identical descriptors
    img2 = np.roll(img, (3, 5), axis=(0, 1))
    kps2 = kps._replace(uv=kps.uv + jnp.asarray([5.0, 3.0]))
    desc2 = describe_keypoints(jnp.asarray(img2), kps2)
    d = np.asarray(
        masked_distance_matrix(desc1, desc2, kps.mask, kps.mask)
    )
    diag = np.diag(d)[np.asarray(kps.mask)]
    assert np.median(diag) < 30, f"descriptor drift too large: {diag}"


def test_blur_pyramid_toeplitz_matches_conv(rng):
    """The production Toeplitz-matmul blur (MXU-shaped) must equal the conv
    formulation to float rounding — same taps, same edge-replicate
    clamping — so descriptor bits are preserved across the rewrite."""
    from okvis_tpu.frontend.brisk import _blur_pyramid_conv, blur_pyramid

    img = rng.random((2, 96, 130)).astype(np.float32) * 255.0
    a = np.asarray(blur_pyramid(jnp.asarray(img)))
    b = np.asarray(_blur_pyramid_conv(jnp.asarray(img)))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)


# ---------------------------------------------------------------- triangulation
def test_triangulate_exact(rng):
    p_true = jnp.asarray([0.4, -0.2, 5.0])
    p1 = jnp.zeros(3)
    p2 = jnp.asarray([0.11, 0.0, 0.0])
    e1 = p_true - p1
    e1 = e1 / jnp.linalg.norm(e1)
    e2 = p_true - p2
    e2 = e2 / jnp.linalg.norm(e2)
    out = triangulate_fast(p1, e1, p2, e2, jnp.asarray(1e-3))
    assert bool(out.valid) and not bool(out.parallel)
    hp = np.asarray(out.hp)
    np.testing.assert_allclose(hp[:3] / hp[3], np.asarray(p_true), atol=1e-8)


def test_triangulate_parallel_rays():
    e = jnp.asarray([0.0, 0.0, 1.0])
    out = triangulate_fast(jnp.zeros(3), e, jnp.asarray([0.11, 0, 0]), e, jnp.asarray(1e-2))
    assert bool(out.parallel)
    assert bool(out.valid)  # within 6 sigma
    assert float(out.hp[3]) < 0.01  # point at infinity encoding


def test_triangulate_batched(rng):
    n = 64
    pts = jnp.asarray(rng.uniform(-2, 2, (n, 3))) + jnp.asarray([0, 0, 6.0])
    p1 = jnp.zeros((n, 3))
    p2 = jnp.tile(jnp.asarray([0.2, 0.0, 0.0]), (n, 1))
    e1 = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    d2 = pts - p2
    e2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    out = triangulate_fast(p1, e1, p2, e2, jnp.full(n, 1e-3))
    assert np.all(np.asarray(out.valid))
    rec = np.asarray(out.hp[:, :3] / out.hp[:, 3:4])
    np.testing.assert_allclose(rec, np.asarray(pts), atol=1e-6)


# ---------------------------------------------------------------- RANSAC
def test_ransac_rotation_only(rng):
    n = 100
    f_b = rng.normal(size=(n, 3))
    f_b /= np.linalg.norm(f_b, axis=1, keepdims=True)
    q_true = kin.quat_normalize(jnp.asarray([0.1, -0.2, 0.15, 1.0]))
    f_a = np.array(kin.quat_rotate(q_true[None], jnp.asarray(f_b)))
    # corrupt 30% with outliers
    out_idx = rng.choice(n, 30, replace=False)
    f_a[out_idx] = rng.normal(size=(30, 3))
    f_a /= np.linalg.norm(f_a, axis=1, keepdims=True)
    res = ransac_rotation_only(
        jax.random.PRNGKey(0), jnp.asarray(f_a), jnp.asarray(f_b), jnp.ones(n, bool)
    )
    assert bool(res.success)
    assert int(res.num_inliers) >= 65
    dq = kin.quat_multiply(kin.quat_conjugate(res.model), q_true)
    assert abs(float(dq[3])) > 1 - 1e-4


def test_ransac_absolute_pose(rng):
    n = 120
    pts_W = rng.uniform(-3, 3, (n, 3)) + [0, 0, 8]
    q = kin.quat_normalize(jnp.asarray([0.05, 0.1, -0.05, 1.0]))
    t = jnp.asarray([0.3, -0.2, 0.5])
    p_C = np.array(kin.quat_rotate(q[None], jnp.asarray(pts_W))) + np.asarray(t)
    bear = p_C / np.linalg.norm(p_C, axis=1, keepdims=True)
    out_idx = rng.choice(n, 30, replace=False)
    bear[out_idx] = rng.normal(size=(30, 3))
    bear /= np.linalg.norm(bear, axis=1, keepdims=True)
    res = ransac_absolute_pose(
        jax.random.PRNGKey(1), jnp.asarray(pts_W), jnp.asarray(bear), jnp.ones(n, bool)
    )
    assert bool(res.success)
    assert int(res.num_inliers) >= 80
    M = np.asarray(res.model).reshape(3, 4)
    np.testing.assert_allclose(M[:, :3], np.asarray(kin.quat_to_matrix(q)), atol=1e-3)
    np.testing.assert_allclose(M[:, 3], np.asarray(t), atol=5e-3)


def test_ransac_relative_pose(rng):
    n = 150
    pts = rng.uniform(-2, 2, (n, 3)) + [0, 0, 6]
    # camera A at origin; camera B translated+rotated
    q = kin.quat_normalize(jnp.asarray([0.02, 0.08, -0.03, 1.0]))
    t = np.asarray([0.5, 0.1, -0.2])
    f_a = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    p_B = np.array(kin.quat_rotate(kin.quat_conjugate(q)[None], jnp.asarray(pts - t)))
    f_b = p_B / np.linalg.norm(p_B, axis=1, keepdims=True)
    out_idx = rng.choice(n, 35, replace=False)
    f_b2 = f_b.copy()
    f_b2[out_idx] = rng.normal(size=(35, 3))
    f_b2 /= np.linalg.norm(f_b2, axis=1, keepdims=True)
    res = ransac_relative_pose(
        jax.random.PRNGKey(2), jnp.asarray(f_a), jnp.asarray(f_b2), jnp.ones(n, bool)
    )
    assert bool(res.success)
    assert int(res.num_inliers) >= 90
    # true inliers should dominate
    true_inl = np.ones(n, bool)
    true_inl[out_idx] = False
    rec = np.asarray(res.inliers)
    assert (rec & true_inl).sum() / rec.sum() > 0.9


# ---------------------------------------------------------------- keyframe
def test_convex_hull_and_area():
    sq = np.asarray([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]], np.float64)
    hull = convex_hull(sq)
    assert len(hull) == 4
    assert abs(polygon_area(hull) - 4.0) < 1e-12


def test_need_new_keyframe_logic(rng):
    pts = rng.uniform(0, 100, (200, 2))
    all_matched = np.ones(200, bool)
    # everything matched everywhere -> good overlap -> no new keyframe
    assert not need_new_keyframe([pts], [all_matched])
    # nothing matched -> need keyframe
    assert need_new_keyframe([pts], [np.zeros(200, bool)])
    # matches confined to a small corner -> low overlap -> need keyframe
    corner = (pts[:, 0] < 20) & (pts[:, 1] < 20)
    assert need_new_keyframe([pts], [corner])
    # few frames -> always keyframe
    assert need_new_keyframe([pts], [all_matched], num_frames=1)
    # not initialized -> never
    assert not need_new_keyframe([pts], [np.zeros(200, bool)], is_initialized=False)


def test_hamming_pallas_interpret(rng):
    """Pallas XOR+popcount kernel (interpret mode) matches the XLA path."""
    from okvis_tpu.ops.hamming_pallas import hamming_matrix_pallas

    a = jnp.asarray(rng.integers(0, 2**32, (128, 16), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (256, 16), dtype=np.uint32))
    d1 = hamming_matrix_pallas(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(hamming_matrix_xla(a, b)))


def test_detection_mask(rng):
    """Image-mask support (ref CameraBase mask): no detections inside the
    suppressed region."""
    img, pts = synth_corner_image(rng)
    H, W = img.shape
    mask = np.ones((H, W), bool)
    mask[:, : W // 2] = False  # suppress the left half
    kps = detect_keypoints(
        jnp.asarray(img), threshold=10.0, max_keypoints=64, border=8,
        mask=jnp.asarray(mask),
    )
    found = np.asarray(kps.uv)[np.asarray(kps.mask)]
    assert len(found) > 0
    assert np.all(found[:, 0] >= W // 2 - 1)


def test_pyramid_detection(rng):
    """Multi-octave detection: finds large-scale structure a single octave
    misses, with per-keypoint sizes scaled by octave."""
    from okvis_tpu.frontend.detection import detect_keypoints_pyramid

    img, pts = synth_corner_image(rng)
    # add one large blurry blob only detectable at a coarser scale
    yy, xx = np.mgrid[0:120, 0:160]
    img2 = img + 50.0 * np.exp(-(((yy - 60) / 14.0) ** 2 + ((xx - 80) / 14.0) ** 2))
    kps, sizes = detect_keypoints_pyramid(
        jnp.asarray(img2.astype(np.float32)), threshold=10.0, max_keypoints=96,
        border=8, octaves=2,
    )
    m = np.asarray(kps.mask)
    assert m.sum() >= 10
    s = np.asarray(sizes)[m]
    assert set(np.unique(s)).issubset({8.0, 16.0, 32.0})
    # coordinates stay in base-image pixels
    uv = np.asarray(kps.uv)[m]
    assert uv[:, 0].max() < 160 and uv[:, 1].max() < 120


def test_refine_triangulation(rng):
    """GN landmark refinement (ProbabilisticStereoTriangulator analog)
    converges from a coarse initialization to the exact intersection."""
    from okvis_tpu.frontend.triangulation import refine_triangulation
    from okvis_tpu.cameras import pinhole as ph

    from okvis_tpu.cameras import CameraSpec

    spec = CameraSpec(752, 480, "radtan")
    intr = jnp.asarray(
        [458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739, 2e-4, 1.76e-5]
    )
    T_a = kin.SE3(r=jnp.zeros(3), q=kin.quat_identity())
    T_b = kin.SE3(r=jnp.asarray([0.2, 0.05, 0.0]), q=kin.quat_identity())
    p_true = jnp.asarray([0.5, -0.3, 5.0])
    uv_a, _ = ph.project(spec, intr, kin.transform_point(kin.inverse(T_a), p_true))
    uv_b, _ = ph.project(spec, intr, kin.transform_point(kin.inverse(T_b), p_true))

    def res(hp):
        rs = []
        for T, uv in ((T_a, uv_a), (T_b, uv_b)):
            hp_C = kin.transform_hpoint(kin.inverse(T), hp)
            u, _ = ph.project_homogeneous(spec, intr, hp_C)
            rs.append(uv - u)
        return jnp.concatenate(rs)

    out = refine_triangulation(res, jnp.asarray([0.3, -0.1, 3.5, 1.0]))
    rec = np.asarray(out.hp[:3] / out.hp[3])
    np.testing.assert_allclose(rec, np.asarray(p_true), atol=1e-8)
    assert bool(out.valid)
    # inconsistent observations -> invalid
    out_bad = refine_triangulation(
        lambda hp: res(hp) + jnp.asarray([30.0, 0, -30.0, 0]), jnp.asarray([0.3, -0.1, 3.5, 1.0])
    )
    assert not bool(out_bad.valid)


def test_no_nan_keypoints_at_border(rng):
    """Regression: a detection exactly on the border-mask edge must not get
    NaN subpixel coordinates (refinement reads the raw response)."""
    img = np.full((100, 140), 100.0, np.float32)
    img[40:, 20:] += 80.0  # strong corner exactly at x=20 == border
    kps = detect_keypoints(jnp.asarray(img), threshold=5.0, max_keypoints=16, border=20)
    uv = np.asarray(kps.uv)[np.asarray(kps.mask)]
    assert len(uv) > 0
    assert np.isfinite(uv).all(), uv


def test_pallas_harris_matches_xla(rng):
    """Fused Pallas Harris+NMS (interpret mode) vs the XLA conv path."""
    from okvis_tpu.frontend.detection import harris_response, nms
    from okvis_tpu.ops.detection_pallas import harris_suppressed_pallas

    H, W = 96, 128
    border = 20
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)

    raw_p, sup_p = harris_suppressed_pallas(
        img, inb.astype(jnp.float32), interpret=True
    )
    raw_x = harris_response(img)
    sup_x = nms(jnp.where(inb, raw_x, -jnp.inf), radius=4)

    # interior response matches to accumulation-order tolerance
    sl = (slice(border, H - border), slice(border, W - border))
    np.testing.assert_allclose(
        np.asarray(raw_p)[sl], np.asarray(raw_x)[sl], rtol=1e-4, atol=1e-3
    )
    # suppression pattern: same surviving maxima
    fin_p = np.isfinite(np.asarray(sup_p))
    fin_x = np.isfinite(np.asarray(sup_x))
    assert (fin_p == fin_x).all()
    # outside the border everything is suppressed
    assert not fin_p[:border].any() and not fin_p[:, :border].any()


def test_pallas_detection_end_to_end(rng):
    """detect_keypoints(use_pallas=True, interpret kernel) selects the same
    keypoints as the XLA path."""
    import okvis_tpu.ops.detection_pallas as dp
    from okvis_tpu.frontend import detection

    H, W = 96, 128
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    kps_x = detect_keypoints(img, threshold=1.0, max_keypoints=64, use_pallas=False)

    orig = dp.harris_suppressed_pallas

    def interp(img, inb, **kw):
        kw["interpret"] = True
        return orig(img, inb, **kw)

    dp.harris_suppressed_pallas = interp
    try:
        kps_p = detection.detect_keypoints.__wrapped__(
            img, threshold=1.0, max_keypoints=64, nms_radius=4, border=20,
            mask=None, use_pallas=True,
        )
    finally:
        dp.harris_suppressed_pallas = orig
    m_x = np.asarray(kps_x.mask)
    m_p = np.asarray(kps_p.mask)
    assert (m_x == m_p).all()
    np.testing.assert_allclose(
        np.asarray(kps_p.uv)[m_p], np.asarray(kps_x.uv)[m_x], atol=1e-3
    )


def test_scale_aware_description_cross_octave(rng):
    """A keypoint described at size 8 in the base image matches (small
    Hamming distance) the same feature described at size 16 in the 2x
    upscaled image — the BRISK pattern-scaling semantics for multi-octave
    detection."""
    import jax
    import jax.numpy as jnp

    from okvis_tpu.frontend.brisk import describe_keypoints
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.ops.hamming import hamming_matrix_xla

    # smooth textured image so resampling noise stays small
    base = rng.uniform(0, 255, (40, 40))
    img = jax.image.resize(jnp.asarray(base, jnp.float32), (160, 160), "cubic")
    img2 = jax.image.resize(jnp.asarray(base, jnp.float32), (320, 320), "cubic")

    K = 4
    uv = jnp.asarray(np.tile([[80.0, 80.0]], (K, 1)))
    kp1 = Keypoints(uv=uv, score=jnp.ones(K), mask=jnp.ones(K, bool))
    kp2 = Keypoints(uv=2.0 * uv + 0.5, score=jnp.ones(K), mask=jnp.ones(K, bool))
    d1 = describe_keypoints(img, kp1, jnp.asarray(0.0), sizes=jnp.full((K,), 8.0))
    d2 = describe_keypoints(img2, kp2, jnp.asarray(0.0), sizes=jnp.full((K,), 16.0))
    dist = np.asarray(hamming_matrix_xla(d1, d2))[0, 0]
    # unscaled description of the upscaled image must be clearly worse
    d2_unscaled = describe_keypoints(img2, kp2, jnp.asarray(0.0))
    dist_unscaled = np.asarray(hamming_matrix_xla(d1, d2_unscaled))[0, 0]
    assert dist < 60, f"cross-scale Hamming {dist}"
    assert dist < dist_unscaled, (dist, dist_unscaled)


def test_conflict_loser_rematches_in_second_round(rng):
    """Two keyframe sources whose landmarks both best-match the SAME current
    keypoint: the newer source wins the conflict, and the second batched
    round re-matches the loser to the remaining in-gate keypoint (the
    reference's sequential per-source matching gets this for free)."""
    import jax.numpy as jnp

    from okvis_tpu.cameras import NCameraSystem, pinhole as ph
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, simulate_trajectory
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    cfg = WindowConfig(
        num_states=9, num_cameras=2, max_landmarks=64, max_observations=256,
        imu_samples=32, max_imu_links=8, camera_specs=tuple(rig.specs),
    )
    est = Estimator(rig, ImuParams.euroc(), cfg=cfg)
    traj = simulate_trajectory(duration=1.0, seed=3, motion_scale=0.0)
    sids = []
    for fi in range(3):
        idx = fi * 20
        lo, hi = max(0, idx - 24), idx + 5
        sids.append(est.add_states(
            fi * 0.1, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=True,
        ))

    # two world points ~6 px apart in camera 0 of the current pose
    T_WS = est.get_T_WS(sids[2])
    T_WC = kin.compose(T_WS, rig.camera_T_SC(0))
    p1_C = np.asarray([0.10, 0.05, 4.0])
    p2_C = np.asarray([0.15, 0.05, 4.0])
    p1 = np.asarray(kin.transform_point(T_WC, jnp.asarray(p1_C)))
    p2 = np.asarray(kin.transform_point(T_WC, jnp.asarray(p2_C)))
    uv1 = np.asarray(ph.project(rig.specs[0], est.intrinsics[0], jnp.asarray(p1_C))[0])
    uv2 = np.asarray(ph.project(rig.specs[0], est.intrinsics[0], jnp.asarray(p2_C))[0])
    assert 3.0 < np.linalg.norm(uv1 - uv2) < 40.0
    L1, L2 = 501, 502
    est.add_landmark(L1, p1)
    est.add_landmark(L2, p2)
    # 3D-2D matching requires initialized landmarks with >=2 observations
    # (ref doSetup, VioKeyframeWindowMatchingAlgorithm.cpp:195-199)
    for lm, kp in ((L1, 0), (L2, 0)):
        est.add_observation(lm, sids[0], 0, np.asarray(uv1), keypoint_idx=kp)
        est.add_observation(lm, sids[1], 0, np.asarray(uv1), keypoint_idx=kp)

    K = 16
    fe = Frontend(rig, FrontendConfig(max_keypoints=K, gate_radius_px=40.0))
    d0 = rng.integers(0, 2**32, (16,), dtype=np.uint32)
    d1 = d0.copy()
    d1[0] ^= np.uint32(0b11)  # 2 bits off: farther than d0, still a match

    def make_frame(mf_id, kp_uvs, descs, lm_ids):
        frames = []
        for c in range(2):
            uv = np.zeros((K, 2))
            mask = np.zeros(K, bool)
            dsc = np.zeros((K, 16), np.uint32)
            lids = np.zeros(K, np.int64)
            if c == 0:
                for j, (u, d, l) in enumerate(zip(kp_uvs, descs, lm_ids)):
                    uv[j], dsc[j], lids[j], mask[j] = u, d, l, True
            frames.append(FrameData(
                keypoints=Keypoints(uv=jnp.asarray(uv), score=jnp.ones(K),
                                    mask=jnp.asarray(mask)),
                descriptors=jnp.asarray(dsc),
                landmark_ids=lids,
            ))
        return MultiFrame(id=mf_id, timestamp=0.0, frames=frames)

    # both sources carry descriptor d0 on their (only) keypoint
    src_new = make_frame(sids[1], [uv1], [d0], [L1])   # newer keyframe: L1
    src_old = make_frame(sids[0], [uv1], [d0], [L2])   # older keyframe: L2
    cur = make_frame(sids[2], [uv1, uv2], [d0, d1], [0, 0])
    est.multiframes[sids[0]] = src_old
    est.multiframes[sids[1]] = src_new
    est.multiframes[sids[2]] = cur

    n3d, _ = fe._associate_batched(est, [src_new, src_old], cur, T_WS)
    assert n3d == 2, f"expected both observations, got {n3d}"
    assert int(cur.frames[0].landmark_ids[0]) == L1  # newest source won kp 0
    assert int(cur.frames[0].landmark_ids[1]) == L2  # loser recovered kp 1


def test_batched_pyramid_multi_matches_per_camera(rng):
    """detect_and_describe_multi's batched scale-space path equals the
    per-camera detect_and_describe fallback (same keypoints, sizes,
    descriptors) for a 2-camera multiframe with octaves=2."""
    import jax.numpy as jnp

    from okvis_tpu.cameras import NCameraSystem
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    fe = Frontend(rig, FrontendConfig(
        detection_threshold=8.0, detection_octaves=2, max_keypoints=64,
    ))
    imgs = [rng.uniform(0, 255, (120, 160)).astype(np.float32) for _ in range(2)]

    batched = fe.detect_and_describe_multi(imgs, T_WS=None)
    for c in range(2):
        single = fe.detect_and_describe(c, jnp.asarray(imgs[c]), None)
        np.testing.assert_allclose(
            np.asarray(batched[c].keypoints.uv), np.asarray(single.keypoints.uv),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(batched[c].keypoints.mask), np.asarray(single.keypoints.mask)
        )
        np.testing.assert_allclose(batched[c].sizes, np.asarray(single.sizes))
        m = np.asarray(single.keypoints.mask)
        assert (
            np.asarray(batched[c].descriptors)[m] == np.asarray(single.descriptors)[m]
        ).all()


# ------------------------------------------------- fused association kernels
def _random_assoc_inputs(rng, P=2, C=2, K=24):
    """Random-but-consistent inputs for the fused association kernel."""
    from okvis_tpu.cameras.pinhole import CameraSpec

    spec = CameraSpec(width=640, height=480, dist_type="radtan")
    intr = np.tile(
        np.asarray([460.0, 455.0, 320.0, 240.0, -0.28, 0.07, 1e-4, -2e-5]),
        (C, 1),
    )
    desc_a = rng.integers(0, 2**32, (P, C, K, 16), dtype=np.uint32)
    desc_b = rng.integers(0, 2**32, (C, K, 16), dtype=np.uint32)
    sel3d = rng.random((P, C, K)) < 0.4
    free2 = ~sel3d & (rng.random((P, C, K)) < 0.6)
    free_b = rng.random((C, K)) < 0.8
    hp = np.concatenate(
        [rng.normal(0, 2, (P, C, K, 3)) + [0, 0, 6.0], np.ones((P, C, K, 1))],
        axis=-1,
    )
    uv_a = rng.uniform(100, 500, (P, C, K, 2))
    uv_b = rng.uniform(100, 500, (C, K, 2))

    def rand_pose(shape):
        r = rng.normal(0, 0.5, shape + (3,))
        q = rng.normal(0, 1, shape + (4,))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return kin.SE3(r=jnp.asarray(r), q=jnp.asarray(q))

    T_WS_b = rand_pose(())  # body pose; camera poses composed in-kernel
    T_WC_a = rand_pose((P, C))
    T_SC = kin.SE3(
        r=jnp.asarray(np.zeros((C, 3))),
        q=jnp.asarray(np.tile([0.0, 0, 0, 1.0], (C, 1))),
    )
    sb_b = jnp.zeros(9)
    std_b = np.full((C, K), 0.8 * 8.0 / 12.0)
    std_a = np.full((P, C, K), 0.8 * 8.0 / 12.0)
    sel_prev = np.zeros((C, K), bool)
    pts_prev = np.zeros((C, K, 3))
    return (
        spec, jnp.asarray(intr), jnp.asarray(desc_a), jnp.asarray(sel3d),
        jnp.asarray(hp), jnp.asarray(free2), jnp.asarray(uv_a),
        jnp.asarray(std_a), T_WS_b, sb_b,
        T_WC_a, jnp.asarray(desc_b), jnp.asarray(free_b),
        jnp.asarray(uv_b), jnp.asarray(std_b), jnp.asarray(sel_prev),
        jnp.asarray(pts_prev), T_SC,
    )


def test_associate_multicam_equals_per_camera(rng):
    """The camera-vmapped fused kernel must agree with the single-camera
    fused kernel (the mixed-spec fallback path) slice by slice — on the
    matching/triangulation outputs (the folded RANSAC differs by design:
    rig-pooled vs per-camera)."""
    from okvis_tpu.frontend import kernels

    args = _random_assoc_inputs(rng)
    (spec, intr, desc_a, sel3d, hp, free2, uv_a, std_a, T_WS_b, sb_b, T_WC_a,
     desc_b, free_b, uv_b, std_b, sel_prev, pts_prev, T_SC) = args
    gate = jnp.asarray(40.0)
    thr2 = jnp.asarray(9.0)
    key = jax.random.PRNGKey(3)
    multi = kernels.associate_multicam(
        spec, key, intr, desc_a, sel3d, hp, free2, uv_a, std_a, T_WS_b, sb_b,
        T_WC_a, desc_b, free_b, uv_b, std_b, sel_prev, pts_prev, T_SC,
        gate, thr2, threshold=200,
    )
    C = 2
    for c in range(C):
        one = kernels.associate_onecam(
            spec, key, intr[c], desc_a[:, c], sel3d[:, c], hp[:, c],
            free2[:, c], uv_a[:, c], std_a[:, c],
            T_WS_b, sb_b,
            kin.SE3(r=T_WC_a.r[:, c], q=T_WC_a.q[:, c]),
            desc_b[c], free_b[c], uv_b[c], std_b[c], sel_prev[c],
            pts_prev[c],
            kin.SE3(r=T_SC.r[c], q=T_SC.q[c]),
            gate, thr2, threshold=200,
        )
        for m, o in list(zip(multi, one))[:6]:
            np.testing.assert_allclose(
                np.asarray(m[:, c]), np.asarray(o), rtol=1e-6, atol=1e-8
            )


def test_associate_onecam_3d2d_respects_device_claims(rng):
    """2D-2D assignments never target a keypoint already claimed by ANY
    source's 3D-2D assignment in the same launch."""
    from okvis_tpu.frontend import kernels

    args = _random_assoc_inputs(rng, P=3, C=1, K=32)
    (spec, intr, desc_a, sel3d, hp, free2, uv_a, std_a, T_WS_b, _sb_b, T_WC_a,
     desc_b, free_b, uv_b, std_b, sel_prev, pts_prev, T_SC) = args
    # huge speed -> huge gate variance (the old 1e6 sigma_pos2 equivalent)
    sb_huge = jnp.zeros(9).at[0].set(1e4)
    out = kernels.associate_multicam(
        spec, jax.random.PRNGKey(4), intr, desc_a,
        sel3d, hp, free2, uv_a, std_a, T_WS_b, sb_huge, T_WC_a,
        desc_b, free_b, uv_b, std_b, sel_prev, pts_prev, T_SC,
        jnp.asarray(1e6), jnp.asarray(9.0), threshold=512,
    )
    assign3, assign2 = np.asarray(out[0]), np.asarray(out[1])
    claimed = set(assign3[assign3 >= 0].tolist())
    hit2 = set(assign2[assign2 >= 0].tolist())
    assert not (claimed & hit2), "2D-2D must avoid 3D-2D-claimed keypoints"


def test_stereo_match_triangulate_matches_composition(rng):
    """The fused stereo kernel equals plain_match + triangulate_pairs run
    separately."""
    from okvis_tpu.frontend import kernels
    from okvis_tpu.cameras.pinhole import CameraSpec

    spec = CameraSpec(width=640, height=480, dist_type="none")
    K = 16
    intr = jnp.asarray([460.0, 460.0, 320.0, 240.0])
    desc_a = jnp.asarray(rng.integers(0, 2**32, (K, 16), dtype=np.uint32))
    desc_b = jnp.asarray(rng.integers(0, 2**32, (K, 16), dtype=np.uint32))
    free_a = jnp.asarray(rng.random(K) < 0.8)
    free_b = jnp.asarray(rng.random(K) < 0.8)
    uv_a = jnp.asarray(rng.uniform(100, 500, (K, 2)))
    uv_b = jnp.asarray(rng.uniform(100, 500, (K, 2)))
    T_WC_a = kin.SE3(r=jnp.zeros(3), q=jnp.asarray([0.0, 0, 0, 1]))
    T_WC_b = kin.SE3(r=jnp.asarray([0.2, 0.0, 0.0]), q=jnp.asarray([0.0, 0, 0, 1]))

    std = jnp.full(K, 0.8 * 8.0 / 12.0)
    assign, hp, valid, par, can_init = kernels.stereo_match_triangulate(
        spec, spec, intr, intr, desc_a, desc_b, free_a, free_b, uv_a, uv_b,
        T_WC_a, T_WC_b, std, std, threshold=512,
    )
    assign_ref = kernels.plain_match(desc_a, desc_b, free_a, free_b, threshold=512)
    np.testing.assert_array_equal(np.asarray(assign), np.asarray(assign_ref))
    pmask = assign_ref >= 0
    ib = jnp.where(pmask, assign_ref, 0)
    hp_ref, valid_ref, par_ref, ci_ref = kernels.triangulate_pairs(
        spec, spec, intr, intr, T_WC_a, T_WC_b, uv_a, uv_b[ib], pmask,
        std, std[ib], jnp.asarray(4e-8),
    )
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hp_ref), rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(par), np.asarray(par_ref))
    np.testing.assert_array_equal(np.asarray(can_init), np.asarray(ci_ref))


def test_triangulation_gate_pose_uncertainty(rng):
    """The relative-pose translation covariance must relax the triangulation
    reprojection gate (ref ProbabilisticStereoTriangulator pose-prior
    machinery, ProbabilisticStereoTriangulator.cpp:59-394): a match that a
    near-certain pose rejects is admitted when the pose is uncertain
    (velocity-scaled UOplus, doSetup :131-141), and vice versa."""
    from okvis_tpu.frontend import kernels
    from okvis_tpu.cameras import pinhole as ph
    from okvis_tpu.cameras.pinhole import CameraSpec

    spec = CameraSpec(width=640, height=480, dist_type="none")
    intr = jnp.asarray([460.0, 460.0, 320.0, 240.0])
    T_WC_a = kin.SE3(r=jnp.zeros(3), q=jnp.asarray([0.0, 0, 0, 1]))
    T_WC_b = kin.SE3(r=jnp.asarray([0.2, 0.0, 0.0]), q=jnp.asarray([0.0, 0, 0, 1]))
    p_W = jnp.asarray([0.3, -0.2, 6.0])
    uv_a, fa = ph.project(spec, intr, p_W)
    uv_b, fb = ph.project(spec, intr, p_W - T_WC_b.r)
    assert int(fa) == 0 and int(fb) == 0
    # perturb B's keypoint 4 px perpendicular to the epipolar plane: the
    # midpoint splits ~2 px of reprojection error into each frame
    uv_b = uv_b + jnp.asarray([0.0, 4.0])
    K = 1
    args = (
        spec, spec, intr, intr, T_WC_a, T_WC_b,
        uv_a[None], uv_b[None], jnp.ones(K, bool),
        # a LARGE keypoint in A (size 24 -> std 1.6 px: 2 px passes) and a
        # small one in B (size 8 -> std 0.53 px: 2 px fails on its own)
        jnp.asarray([0.8 * 24.0 / 12.0]), jnp.asarray([0.8 * 8.0 / 12.0]),
    )
    # near-certain relative pose (ref 4e-8): the B-side chi² rejects
    _, valid_tight, _, _ = kernels.triangulate_pairs(*args, jnp.asarray(4e-8))
    # fast motion (|v|=3 m/s -> scale² · 1e-2 = 0.09 m²): admitted
    _, valid_loose, _, _ = kernels.triangulate_pairs(*args, jnp.asarray(0.09))
    assert not bool(valid_tight[0]), "near-certain pose must reject the 4 px match"
    assert bool(valid_loose[0]), "uncertain pose must admit the 4 px match"


def test_triangulation_depth_observability(rng):
    """A short-baseline pair (depth barely observable) must come back
    can_init=False while a wide-baseline pair initializes (ref 'evaluate
    again closer' test, ProbabilisticStereoTriangulator.cpp:330-338)."""
    from okvis_tpu.frontend import kernels
    from okvis_tpu.cameras import pinhole as ph
    from okvis_tpu.cameras.pinhole import CameraSpec

    spec = CameraSpec(width=640, height=480, dist_type="none")
    intr = jnp.asarray([460.0, 460.0, 320.0, 240.0])
    std = jnp.asarray([0.8 * 8.0 / 12.0])
    p_W = jnp.asarray([0.1, -0.1, 8.0])
    T_WC_a = kin.SE3(r=jnp.zeros(3), q=jnp.asarray([0.0, 0, 0, 1]))
    uv_a, _ = ph.project(spec, intr, p_W)
    for baseline, expect_init in ((0.002, False), (0.5, True)):
        T_WC_b = kin.SE3(
            r=jnp.asarray([baseline, 0.0, 0.0]), q=jnp.asarray([0.0, 0, 0, 1])
        )
        uv_b, _ = ph.project(spec, intr, p_W - T_WC_b.r)
        hp, valid, par, can_init = kernels.triangulate_pairs(
            spec, spec, intr, intr, T_WC_a, T_WC_b,
            uv_a[None], uv_b[None], jnp.ones(1, bool), std, std,
            jnp.asarray(4e-8),
        )
        if bool(par[0]):
            assert not expect_init  # parallel rays can never initialize
            continue
        assert bool(can_init[0]) == expect_init, (
            f"baseline {baseline}: can_init={bool(can_init[0])}"
        )


def test_associate_batched_single_fused_launch(rng, monkeypatch):
    """A stereo association round issues exactly ONE fused device launch
    (plus zero per-camera fallback calls)."""
    from okvis_tpu.frontend import kernels as k

    calls = {"multi": 0, "one": 0}
    orig = k.associate_multicam

    def counting_multi(*a, **kw):
        calls["multi"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(k, "associate_multicam", counting_multi)
    monkeypatch.setattr(
        k, "associate_onecam",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("fallback used")),
    )

    from okvis_tpu.cameras import NCameraSystem
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, simulate_trajectory
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    cfg = WindowConfig(
        num_states=9, num_cameras=2, max_landmarks=64, max_observations=256,
        imu_samples=32, max_imu_links=8, camera_specs=tuple(rig.specs),
    )
    est = Estimator(rig, ImuParams.euroc(), cfg=cfg)
    traj = simulate_trajectory(duration=1.0, seed=3, motion_scale=0.0)
    sids = []
    for fi in range(2):
        idx = fi * 20
        lo, hi = max(0, idx - 24), idx + 5
        sids.append(est.add_states(
            fi * 0.1, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=True,
        ))
    K = 8
    fe = Frontend(rig, FrontendConfig(max_keypoints=K))

    def make_frame(mf_id):
        frames = []
        for c in range(2):
            frames.append(FrameData(
                keypoints=Keypoints(
                    uv=jnp.asarray(rng.uniform(100, 500, (K, 2))),
                    score=jnp.ones(K), mask=jnp.ones(K, bool)),
                descriptors=jnp.asarray(
                    rng.integers(0, 2**32, (K, 16), dtype=np.uint32)),
                landmark_ids=np.zeros(K, np.int64),
            ))
        return MultiFrame(id=mf_id, timestamp=0.0, frames=frames)

    src = make_frame(sids[0])
    cur = make_frame(sids[1])
    est.multiframes[sids[0]] = src
    est.multiframes[sids[1]] = cur
    fe._associate_batched(est, [src], cur, est.get_T_WS(sids[1]))
    assert calls["multi"] == 1


def test_uninitialized_landmark_upgraded_via_2d2d(rng):
    """A source keyframe carrying an UNinitialized landmark must route that
    keypoint through the 2D-2D pool; on a parallax match the landmark is
    re-triangulated, upgraded to initialized, and gains the current-frame
    observation (ref setBestMatch 2D-2D reuse path,
    VioKeyframeWindowMatchingAlgorithm.cpp:398-441)."""
    import jax.numpy as jnp

    from okvis_tpu.cameras import NCameraSystem, pinhole as ph
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, simulate_trajectory
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    cfg = WindowConfig(
        num_states=9, num_cameras=2, max_landmarks=64, max_observations=256,
        imu_samples=32, max_imu_links=8, camera_specs=tuple(rig.specs),
    )
    est = Estimator(rig, ImuParams.euroc(), cfg=cfg)
    traj = simulate_trajectory(duration=1.0, seed=5, motion_scale=0.0)
    sids = []
    for fi in range(2):
        idx = fi * 20
        lo, hi = max(0, idx - 24), idx + 5
        sids.append(est.add_states(
            fi * 0.1, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=True,
        ))
    # give the frames a 20 cm baseline so the pair triangulates with parallax
    T0 = est.get_T_WS(sids[0])
    est.set_T_WS(sids[1], kin.SE3(r=T0.r + jnp.asarray([0.2, 0.0, 0.0]), q=T0.q))

    # a true world point, projected into camera 0 of both frames
    T_WC0 = kin.compose(est.get_T_WS(sids[0]), rig.camera_T_SC(0))
    p_W = np.asarray(kin.transform_point(T_WC0, jnp.asarray([0.0, 0.0, 4.0])))
    uvs = []
    for sid in sids:
        T_WC = kin.compose(est.get_T_WS(sid), rig.camera_T_SC(0))
        p_C = np.asarray(kin.transform_point(kin.inverse(T_WC), jnp.asarray(p_W)))
        uv, flag = ph.project(rig.specs[0], est.intrinsics[0], jnp.asarray(p_C))
        assert int(flag) == 0
        uvs.append(np.asarray(uv))

    # landmark exists but UNinitialized (e.g. created from parallel rays),
    # carried by the source keyframe's keypoint
    L = 901
    ray_W = p_W / np.linalg.norm(p_W)
    est.add_landmark(L, np.concatenate([ray_W, [1e-3]]), initialized=False)
    est.add_observation(L, sids[0], 0, uvs[0], keypoint_idx=0)

    K = 16
    fe = Frontend(rig, FrontendConfig(max_keypoints=K))
    d0 = rng.integers(0, 2**32, (16,), dtype=np.uint32)

    def make_frame(mf_id, uv, lm):
        frames = []
        for c in range(2):
            kuv = np.zeros((K, 2))
            mask = np.zeros(K, bool)
            dsc = np.zeros((K, 16), np.uint32)
            lids = np.zeros(K, np.int64)
            if c == 0:
                kuv[0], dsc[0], lids[0], mask[0] = uv, d0, lm, True
            frames.append(FrameData(
                keypoints=Keypoints(uv=jnp.asarray(kuv), score=jnp.ones(K),
                                    mask=jnp.asarray(mask)),
                descriptors=jnp.asarray(dsc),
                landmark_ids=lids,
            ))
        return MultiFrame(id=mf_id, timestamp=0.0, frames=frames)

    src = make_frame(sids[0], uvs[0], L)
    cur = make_frame(sids[1], uvs[1], 0)
    est.multiframes[sids[0]] = src
    est.multiframes[sids[1]] = cur

    n3d, _ = fe._associate_batched(est, [src], cur, est.get_T_WS(sids[1]))
    assert n3d == 0, "uninitialized landmark must not 3D-2D match"
    assert int(cur.frames[0].landmark_ids[0]) == L, "2D-2D reuse failed"
    assert est.landmarks[L].initialized, "landmark not upgraded"
    hp = est.get_landmark(L)
    p_est = hp[:3] / hp[3]
    assert np.linalg.norm(p_est - p_W) < 0.2, f"bad re-triangulation {p_est} vs {p_W}"
    assert sum(1 for o in est.observations if o.lm_id == L) == 2


def test_folded_ransac_removes_outlier_association(rng):
    """The absolute-pose RANSAC folded into the association launch must
    strip a gross geometric outlier that still passes the chi² descriptor
    gate (ref runRansac3d2d removeOutliers, Frontend.cpp:615-640)."""
    import jax.numpy as jnp

    from okvis_tpu.cameras import NCameraSystem, pinhole as ph
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, simulate_trajectory
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    cfg = WindowConfig(
        num_states=9, num_cameras=2, max_landmarks=64, max_observations=256,
        imu_samples=32, max_imu_links=8, camera_specs=tuple(rig.specs),
    )
    est = Estimator(rig, ImuParams.euroc(), cfg=cfg)
    traj = simulate_trajectory(duration=1.0, seed=9, motion_scale=0.0)
    sids = []
    for fi in range(2):
        idx = fi * 20
        lo, hi = max(0, idx - 24), idx + 5
        sids.append(est.add_states(
            fi * 0.1, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=True,
        ))

    # 12 well-spread NON-coplanar world points visible in camera 0 of the
    # current pose (the 6-pt DLT absolute-pose solver is degenerate on
    # planar scenes)
    T_WC = kin.compose(est.get_T_WS(sids[1]), rig.camera_T_SC(0))
    depth_jitter = rng.uniform(-0.8, 0.8, 12)
    pts_C = np.stack([
        np.asarray([x, y, 4.0 + 0.3 * i + depth_jitter[i]])
        for i, (x, y) in enumerate(
            [(dx * 0.5, dy * 0.4) for dx in (-2, -1, 0, 1) for dy in (-1, 0, 1)]
        )
    ])
    n = len(pts_C)
    lm_ids = list(range(700, 700 + n))
    uvs = np.zeros((n, 2))
    for i in range(n):
        p_W = np.asarray(kin.transform_point(T_WC, jnp.asarray(pts_C[i])))
        uv, flag = ph.project(rig.specs[0], est.intrinsics[0], jnp.asarray(pts_C[i]))
        assert int(flag) == 0, f"point {i} projects outside"
        uvs[i] = np.asarray(uv)
        est.add_landmark(lm_ids[i], p_W)
        # >=2 observations on the SOURCE frame only (cam 0 + cam 1) so the
        # current frame starts clean
        est.add_observation(lm_ids[i], sids[0], 0, uvs[i], keypoint_idx=i)
        est.add_observation(lm_ids[i], sids[0], 1, uvs[i], keypoint_idx=i)

    # current-frame keypoints at the true projections, except one corrupted
    # by 8 px — inside the chi² gate, far outside the 9 px² RANSAC threshold
    bad = 5
    kp_uv = uvs.copy()
    kp_uv[bad] += np.asarray([8.0, 0.0])

    K = 16
    fe = Frontend(rig, FrontendConfig(max_keypoints=K))
    descs = rng.integers(0, 2**32, (n, 16), dtype=np.uint32)

    def make_frame(mf_id, uv_rows, lids_rows):
        frames = []
        for c in range(2):
            uv = np.zeros((K, 2))
            mask = np.zeros(K, bool)
            dsc = np.zeros((K, 16), np.uint32)
            lids = np.zeros(K, np.int64)
            if c == 0:
                uv[:n], dsc[:n], mask[:n] = uv_rows, descs, True
                lids[:n] = lids_rows
            frames.append(FrameData(
                keypoints=Keypoints(uv=jnp.asarray(uv), score=jnp.ones(K),
                                    mask=jnp.asarray(mask)),
                descriptors=jnp.asarray(dsc),
                landmark_ids=lids,
            ))
        return MultiFrame(id=mf_id, timestamp=0.0, frames=frames)

    src = make_frame(sids[0], uvs, lm_ids)
    cur = make_frame(sids[1], kp_uv, np.zeros(n, np.int64))
    est.multiframes[sids[0]] = src
    est.multiframes[sids[1]] = cur

    n3d, _ = fe._associate_batched(
        est, [src], cur, est.get_T_WS(sids[1]), apply_ransac=True
    )
    assert n3d == n, f"expected all {n} 3D-2D matches, got {n3d}"
    # the outlier's association must have been stripped again
    assert int(cur.frames[0].landmark_ids[bad]) == 0, "outlier not removed"
    kept = sum(1 for i in range(n) if int(cur.frames[0].landmark_ids[i]) != 0)
    assert kept == n - 1, f"inliers wrongly removed: kept {kept}"
    assert not any(
        o.lm_id == lm_ids[bad] and o.pose_id == sids[1]
        for o in est.observations
    ), "outlier observation still in the table"


def test_rig_ransac_pools_cameras(rng):
    """Rig-level RANSAC parity (ref FrameNoncentralAbsoluteAdapter): an
    outlier in a camera with too few correspondences for a standalone
    per-camera RANSAC (5 < 6-pt minimal sample) is still caught because
    hypotheses from the other camera score ALL cameras' correspondences."""
    import jax.numpy as jnp

    from okvis_tpu.frontend.ransac import ransac_absolute_rig
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig
    from okvis_tpu.cameras import pinhole as ph

    specs, T_SC, intrinsics = euroc_stereo_rig()
    C, K = 2, 16
    # body pose = identity; world points in front of the rig
    r_SC = np.asarray(T_SC.r)
    q_SC = np.asarray(T_SC.q)
    counts = [8, 5]  # cam1 alone cannot form a 6-point hypothesis
    pts = np.zeros((C, K, 3))
    bear = np.zeros((C, K, 3))
    sel = np.zeros((C, K), bool)
    depth_jitter = rng.uniform(-0.7, 0.7, (C, K))
    from okvis_tpu import kinematics as kin

    for c in range(C):
        for i in range(counts[c]):
            p_C = np.asarray([
                ((i % 4) - 1.5) * 0.5, ((i // 4) - 1.0) * 0.45,
                4.0 + 0.35 * i + depth_jitter[c, i],
            ])
            T = kin.SE3(r=jnp.asarray(r_SC[c]), q=jnp.asarray(q_SC[c]))
            p_W = np.asarray(kin.transform_point(T, jnp.asarray(p_C)))
            pts[c, i] = p_W
            bear[c, i] = p_C / np.linalg.norm(p_C)
            sel[c, i] = True
    # corrupt ONE cam1 bearing: rotate it ~1 deg (≈8 px at f=460)
    bad = 2
    v = bear[1, bad]
    perp = np.cross(v, [0.0, 0.0, 1.0])
    perp /= np.linalg.norm(perp)
    bear[1, bad] = v * np.cos(0.018) + perp * np.sin(0.018)

    res = ransac_absolute_rig(
        jax.random.PRNGKey(11), jnp.asarray(r_SC), jnp.asarray(q_SC),
        jnp.asarray(pts), jnp.asarray(bear), jnp.asarray(sel),
        jnp.asarray([float(intrinsics[c][0]) for c in range(C)]),
        threshold_px2=jnp.asarray(9.0),
    )
    assert bool(res.success)
    assert int(res.num_inliers) == sum(counts) - 1
    inl = np.asarray(res.inliers)
    assert not inl[1, bad], "pooled RANSAC missed the cam1 outlier"
    assert inl[0, :8].all() and inl[1, :5].sum() == 4


def test_ransac_absolute_pose_planar_scene(rng):
    """All landmarks on ONE plane (a wall-filling view): the Kneip P3P
    hypothesis generator has no coplanarity degeneracy, so outlier
    rejection still fires — matching the reference's GP3P robustness
    (Frontend.cpp:599-642; the earlier 6-pt DLT was degenerate here)."""
    n = 120
    # strictly coplanar: z = 5 exactly
    pts_W = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), np.full((n, 1), 5.0)], axis=1
    )
    q = kin.quat_normalize(jnp.asarray([0.05, 0.1, -0.05, 1.0]))
    t = jnp.asarray([0.3, -0.2, 0.5])
    p_C = np.array(kin.quat_rotate(q[None], jnp.asarray(pts_W))) + np.asarray(t)
    bear = p_C / np.linalg.norm(p_C, axis=1, keepdims=True)
    out_idx = rng.choice(n, 30, replace=False)
    bear[out_idx] = np.abs(rng.normal(size=(30, 3)))
    bear /= np.linalg.norm(bear, axis=1, keepdims=True)
    res = ransac_absolute_pose(
        jax.random.PRNGKey(5), jnp.asarray(pts_W), jnp.asarray(bear),
        jnp.ones(n, bool),
    )
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    true_inl = np.ones(n, bool)
    true_inl[out_idx] = False
    assert int(res.num_inliers) >= 85
    assert (~inl[out_idx]).sum() >= 28, "planar scene: outliers kept"
    M = np.asarray(res.model).reshape(3, 4)
    np.testing.assert_allclose(M[:, :3], np.asarray(kin.quat_to_matrix(q)), atol=1e-3)
    np.testing.assert_allclose(M[:, 3], np.asarray(t), atol=5e-3)


def test_rig_ransac_planar_scene(rng):
    """Rig-level pooled RANSAC on an exactly coplanar landmark set — the
    planar wall case that silently lost outlier rejection with the DLT."""
    from okvis_tpu.frontend.ransac import ransac_absolute_rig
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig

    specs, T_SC, intrinsics = euroc_stereo_rig()
    C, K = 2, 64
    r_SC = np.asarray(T_SC.r)
    q_SC = np.asarray(T_SC.q)
    pts = np.zeros((C, K, 3))
    bear = np.zeros((C, K, 3))
    sel = np.zeros((C, K), bool)
    n_per = 40
    for c in range(C):
        # wall at z=4 in each camera frame, mapped to world via extrinsics
        for i in range(n_per):
            p_C = np.asarray([
                ((i % 8) - 3.5) * 0.4, ((i // 8) - 2.0) * 0.35, 4.0,
            ])
            T = kin.SE3(r=jnp.asarray(r_SC[c]), q=jnp.asarray(q_SC[c]))
            pts[c, i] = np.asarray(kin.transform_point(T, jnp.asarray(p_C)))
            bear[c, i] = p_C / np.linalg.norm(p_C)
            sel[c, i] = True
    bad = 7
    v = bear[1, bad]
    perp = np.cross(v, [0.0, 0.0, 1.0])
    perp /= np.linalg.norm(perp)
    bear[1, bad] = v * np.cos(0.02) + perp * np.sin(0.02)

    res = ransac_absolute_rig(
        jax.random.PRNGKey(13), jnp.asarray(r_SC), jnp.asarray(q_SC),
        jnp.asarray(pts), jnp.asarray(bear), jnp.asarray(sel),
        jnp.asarray([float(intrinsics[c][0]) for c in range(C)]),
        threshold_px2=jnp.asarray(9.0),
    )
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    assert not inl[1, bad], "planar rig: outlier missed"
    assert int(res.num_inliers) == 2 * n_per - 1


def test_mixed_spec_rig_fallback_path(rng):
    """A rig whose cameras use DIFFERENT distortion models must route the
    association round through the per-camera fused fallback
    (kernels.associate_onecam) and still produce correct 3D-2D matches."""
    import jax.numpy as jnp

    from okvis_tpu.cameras import NCameraSystem, pinhole as ph
    from okvis_tpu.cameras.pinhole import CameraSpec
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, simulate_trajectory
    from okvis_tpu.estimator import Estimator
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.frontend.frontend import Frontend, FrontendConfig
    from okvis_tpu.frontend import kernels as k
    from okvis_tpu.imu import ImuParams
    from okvis_tpu.solver import WindowConfig

    _, T_SC, _ = euroc_stereo_rig()
    specs = (
        CameraSpec(752, 480, "radtan"),
        CameraSpec(752, 480, "none"),  # second camera: plain pinhole
    )
    intrinsics = [
        jnp.asarray([461.4, 460.2, 363.0, 248.1, -0.28, 0.07, 2.0e-4, 1.8e-5]),
        jnp.asarray([458.0, 457.0, 370.0, 250.0]),
    ]
    rig = NCameraSystem(specs=specs, T_SC=T_SC, intrinsics=intrinsics)
    cfg = WindowConfig(
        num_states=9, num_cameras=2, max_landmarks=64, max_observations=256,
        imu_samples=32, max_imu_links=8, camera_specs=specs,
    )
    est = Estimator(rig, ImuParams.euroc(), cfg=cfg)
    traj = simulate_trajectory(duration=1.0, seed=3, motion_scale=0.0)
    sids = []
    for fi in range(2):
        idx = fi * 20
        lo, hi = max(0, idx - 24), idx + 5
        sids.append(est.add_states(
            fi * 0.1, traj.ts[lo:hi], traj.gyro[lo:hi], traj.acc[lo:hi],
            as_keyframe=True,
        ))

    # one landmark per camera, observed (>=2) from the source frame
    K = 8
    lm_of_cam, uv_of_cam = {}, {}
    for c in range(2):
        T_WC = kin.compose(est.get_T_WS(sids[1]), rig.camera_T_SC(c))
        p_C = np.asarray([0.1 * (c + 1), 0.05, 4.0])
        p_W = np.asarray(kin.transform_point(T_WC, jnp.asarray(p_C)))
        uv, flag = ph.project(rig.specs[c], est.intrinsics[c], jnp.asarray(p_C))
        assert int(flag) == 0
        lm = 800 + c
        est.add_landmark(lm, p_W)
        est.add_observation(lm, sids[0], c, np.asarray(uv), keypoint_idx=0)
        est.add_observation(lm, sids[0], 1 - c, np.asarray(uv), keypoint_idx=1)
        lm_of_cam[c], uv_of_cam[c] = lm, np.asarray(uv)

    fe = Frontend(rig, FrontendConfig(max_keypoints=K))
    d = rng.integers(0, 2**32, (2, 16), dtype=np.uint32)

    def make_frame(mf_id, with_ids):
        frames = []
        for c in range(2):
            uv = np.zeros((K, 2))
            mask = np.zeros(K, bool)
            dsc = np.zeros((K, 16), np.uint32)
            lids = np.zeros(K, np.int64)
            uv[0], dsc[0], mask[0] = uv_of_cam[c], d[c], True
            if with_ids:
                lids[0] = lm_of_cam[c]
            frames.append(FrameData(
                keypoints=Keypoints(uv=jnp.asarray(uv), score=jnp.ones(K),
                                    mask=jnp.asarray(mask)),
                descriptors=jnp.asarray(dsc),
                landmark_ids=lids,
            ))
        return MultiFrame(id=mf_id, timestamp=0.0, frames=frames)

    src = make_frame(sids[0], with_ids=True)
    cur = make_frame(sids[1], with_ids=False)
    est.multiframes[sids[0]] = src
    est.multiframes[sids[1]] = cur

    calls = {"multi": 0}
    orig_multi = k.associate_multicam

    def spy_multi(*a, **kw):
        calls["multi"] += 1
        return orig_multi(*a, **kw)

    import pytest as _pytest
    mp = _pytest.MonkeyPatch()
    mp.setattr(k, "associate_multicam", spy_multi)
    try:
        n3d, _ = fe._associate_batched(est, [src], cur, est.get_T_WS(sids[1]))
    finally:
        mp.undo()
    assert calls["multi"] == 0, "mixed-spec rig must use the fallback"
    assert n3d == 2, f"expected a 3D-2D match in each camera, got {n3d}"
    assert int(cur.frames[0].landmark_ids[0]) == lm_of_cam[0]
    assert int(cur.frames[1].landmark_ids[0]) == lm_of_cam[1]


def test_pooled_topk_matches_flat_selection():
    """detect_keypoints' cell-pooled top-k (16x smaller top_k input) is an
    EXACT selection: NMS survivors are > nms_radius apart, so no 4x4 cell
    holds two, and every survivor reaches the pooled map."""
    rng2 = np.random.default_rng(5)
    H, W = 241, 317  # non-multiples of 4 exercise the -inf padding
    sup = np.full((H, W), -np.inf, np.float32)
    pts = []
    for _ in range(300):
        y, x = rng2.integers(1, H - 1), rng2.integers(1, W - 1)
        if all(max(abs(y - py), abs(x - px)) > 4 for py, px in pts):
            pts.append((y, x))
    vals_in = rng2.uniform(10, 1e6, len(pts)).astype(np.float32)
    vals_in[:10] = 777.0  # cross-cell ties
    for (y, x), v in zip(pts, vals_in):
        sup[y, x] = v
    sup_j = jnp.asarray(sup)

    K = 64
    fv, fi = jax.lax.top_k(sup_j.ravel(), K)
    fy, fx = np.asarray(fi) // W, np.asarray(fi) % W

    cell = 4
    Hp, Wp = -(-H // cell) * cell, -(-W // cell) * cell
    sp = jnp.pad(sup_j, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf)
    cells = sp.reshape(Hp // cell, cell, Wp // cell, cell)
    cm = cells.max(axis=(1, 3))
    Wc = Wp // cell
    pv, ci = jax.lax.top_k(cm.ravel(), K)
    cy, cx = ci // Wc, ci % Wc
    patch = cells[cy, :, cx, :].reshape(K, cell * cell)
    sub = jnp.argmax(patch, axis=1)
    py, px = np.asarray(cy * cell + sub // cell), np.asarray(cx * cell + sub % cell)

    np.testing.assert_array_equal(np.asarray(fv), np.asarray(pv))
    assert set(zip(fy.tolist(), fx.tolist())) == set(zip(py.tolist(), px.tolist()))

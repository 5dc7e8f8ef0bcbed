"""Geometric verification of loop candidates -> relative-pose constraints.

Given a retrieval hit (place_recognition.py), verify it geometrically the
same way the reference frontend verifies 3D-2D associations
(/root/reference/okvis_frontend/src/Frontend.cpp:575-642 runRansac3d2d):
match the query frame's descriptors against the candidate keyframe's
landmark-bearing descriptors (one MXU matmul + auction assignment), then run
hypothesis-parallel absolute-pose RANSAC (frontend/ransac.py) on the
candidate's landmark positions vs the query's bearings.

The resulting measurement is the relative transform
``T_cand_query = T_WS_cand^-1 * T_WS_query^meas`` — locally drift-free
because the candidate's landmarks are consistent with its own pose estimate.
Information is scaled with the inlier count (more inliers -> stiffer edge).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import ransac
from ..kinematics import np_se3
from ..ops import hamming


class LoopVerification(NamedTuple):
    success: jnp.ndarray  # () bool
    num_inliers: jnp.ndarray  # () int32
    num_matches: jnp.ndarray  # () int32
    R_CW: jnp.ndarray  # (3, 3) rotation world->query camera
    t_C: jnp.ndarray  # (3,) translation (query camera frame)


@functools.partial(jax.jit,
                   static_argnames=("match_threshold", "min_inliers", "n_hyp"))
def verify_loop_candidate(
    key,
    desc_c: jnp.ndarray,  # (Kc, 64) candidate keyframe descriptors
    lm_mask_c: jnp.ndarray,  # (Kc,) candidate keypoint has a 3D landmark
    landmarks_W: jnp.ndarray,  # (Kc, 3) landmark positions (world)
    desc_q: jnp.ndarray,  # (Kq, 64) query descriptors
    mask_q: jnp.ndarray,  # (Kq,)
    bearings_q: jnp.ndarray,  # (Kq, 3) unit bearings in query camera frame
    focal: float = 460.0,
    match_threshold: int = 60,
    min_inliers: int = 20,
    n_hyp: int = 128,
    threshold_px2: float = 9.0,
) -> LoopVerification:
    """One XLA program: gated matching + absolute-pose RANSAC."""
    match = hamming.match_descriptors(desc_c, desc_q, lm_mask_c, mask_q,
                                      threshold=match_threshold)  # (Kc,)
    matched = match >= 0
    qidx = jnp.where(matched, match, 0)
    pts_W = landmarks_W  # (Kc, 3) aligned with candidate rows
    brg_q = bearings_q[qidx]  # (Kc, 3)
    pair_mask = matched & lm_mask_c
    n_matches = jnp.sum(pair_mask)

    res = ransac.ransac_absolute_pose(
        key, pts_W, brg_q, pair_mask, focal=focal,
        threshold_px2=threshold_px2, n_hyp=n_hyp)
    M = res.model.reshape(3, 4)
    ok = res.success & (res.num_inliers >= min_inliers)
    return LoopVerification(success=ok, num_inliers=res.num_inliers,
                            num_matches=n_matches,
                            R_CW=M[:, :3], t_C=M[:, 3])


def relative_pose_from_verification(
    ver: LoopVerification,
    T_WS_cand: Tuple[np.ndarray, np.ndarray],
    T_SC: Tuple[np.ndarray, np.ndarray],
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Host epilogue: turn (R_CW, t_C) into the edge measurement T_cand_query.

    p_C = R_CW p_W + t  =>  T_CW = (t, R_CW); T_WC = T_CW^-1;
    T_WS_query = T_WC * T_SC^-1; edge = T_WS_cand^-1 * T_WS_query.
    """
    if not bool(ver.success):
        return None
    R_CW = np.asarray(ver.R_CW, np.float64)
    t_C = np.asarray(ver.t_C, np.float64)
    q_CW = np_se3.matrix_to_quat(R_CW)
    r_WC, q_WC = np_se3.inverse(t_C, q_CW)
    r_CS, q_CS = np_se3.inverse(*T_SC)
    r_WSq, q_WSq = np_se3.compose(r_WC, q_WC, r_CS, q_CS)
    r_SWc, q_SWc = np_se3.inverse(*T_WS_cand)
    return np_se3.compose(r_SWc, q_SWc, r_WSq, q_WSq)


def loop_edge_sqrt_info(num_inliers: int, sigma_t: float = 0.03,
                        sigma_r: float = 0.01,
                        ref_inliers: int = 30) -> np.ndarray:
    """6x6 sqrt-information for a loop edge, stiffer with more inliers.

    Defaults reflect RANSAC-verified geometry: at ~30 inliers with sub-pixel
    reprojection consistency at EuRoC scale (depth ~5 m, f~460 px) the
    relative pose is good to a few centimetres / ~0.5 deg.
    """
    s = np.sqrt(max(num_inliers, 1) / ref_inliers)
    w = np.concatenate([np.full(3, s / sigma_t), np.full(3, s / sigma_r)])
    return np.diag(w)

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
def gated_match(
    desc_a: jnp.ndarray,  # (K, 16) uint32
    desc_b: jnp.ndarray,
    mask_a: jnp.ndarray,  # (K,)
    mask_b: jnp.ndarray,
    pred_uv: jnp.ndarray,  # (K, 2) predicted projection per A row (1e9 = no gate hit)
    uv_b: jnp.ndarray,  # (K, 2)
    gate_radius: jnp.ndarray,  # scalar px
    threshold: int = 60,
) -> jnp.ndarray:
    """3D-2D matching: Hamming distances + image-space gate + 1:1 assignment.
    Returns (K,) matched B index per A or -1."""
    dist = masked_distance_matrix(desc_a, desc_b, mask_a, mask_b)
    d2 = jnp.sum((pred_uv[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    dist = jnp.where(d2 > gate_radius * gate_radius, MAX_DIST, dist)
    return mutual_best_assignment(dist, threshold)


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


@functools.partial(jax.jit, static_argnames=("spec",))
def project_points(
    spec: CameraSpec, intrinsics: jnp.ndarray, T_CW: kin.SE3, p_W: jnp.ndarray
):
    """Project (K, 3) world points -> ((K,2) uv, (K,) ok)."""
    p_C = jax.vmap(lambda p: kin.transform_point(T_CW, p))(p_W)
    uv, flags = jax.vmap(lambda p: pinhole.project(spec, intrinsics, p))(p_C)
    return uv, flags == pinhole.STATUS_OK


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
):
    """Batched two-view triangulation of matched keypoint pairs.
    Returns (hp_W (K,4), valid (K,), parallel (K,))."""
    K = uv_a.shape[0]
    rays_a = jax.vmap(lambda p: pinhole.back_project(spec_a, intr_a, p))(uv_a)
    rays_b = jax.vmap(lambda p: pinhole.back_project(spec_b, intr_b, p))(uv_b)
    e_a = kin.quat_rotate(T_WC_a.q[None], rays_a)
    e_a = e_a / jnp.linalg.norm(e_a, axis=-1, keepdims=True)
    e_b = kin.quat_rotate(T_WC_b.q[None], rays_b)
    e_b = e_b / jnp.linalg.norm(e_b, axis=-1, keepdims=True)
    sigma = jnp.full((K,), 2.0 / intr_a[0], dtype=uv_a.dtype)
    out = triangulate_fast(
        jnp.tile(T_WC_a.r, (K, 1)), e_a, jnp.tile(T_WC_b.r, (K, 1)), e_b, sigma
    )
    return out.hp, out.valid & pair_mask, out.parallel


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
    gate_radius: jnp.ndarray,
    threshold: int = 60,
):
    """3D-2D gated matching for P source frames against the current frame in
    ONE program. Returns (assign (P, K), pred_ok (P, K))."""

    def one(desc_a_p, mask_a_p, hp_p, T_CW_p):
        uv_pred, ok = project_hpoints(spec, intrinsics, T_CW_p, hp_p)
        gate_ok = mask_a_p & ok
        pred = jnp.where(gate_ok[:, None], uv_pred, 1e9)
        assign = gated_match(
            desc_a_p, desc_b, gate_ok, mask_b, pred, uv_b, gate_radius,
            threshold=threshold,
        )
        return assign, gate_ok

    return jax.vmap(one)(desc_a, mask_a, hp_rows, T_CW)


@functools.partial(jax.jit, static_argnames=("threshold",))
def plain_match_pairs(
    desc_a: jnp.ndarray,  # (P, K, 16)
    mask_a: jnp.ndarray,  # (P, K)
    desc_b: jnp.ndarray,  # (K, 16)
    mask_b: jnp.ndarray,  # (K,) free-at-round-start mask (host resolves
    # conflicts with 3D-2D winners afterwards)
    threshold: int = 60,
):
    """2D-2D matching for P source frames against the current frame in one
    program. Returns (P, K) assignments."""
    return jax.vmap(
        lambda da, ma: plain_match(da, desc_b, ma, mask_b, threshold=threshold)
    )(desc_a, mask_a)


@functools.partial(jax.jit, static_argnames=("spec_a", "spec_b"))
def triangulate_pair_batches(
    spec_a: CameraSpec,
    spec_b: CameraSpec,
    intr_a: jnp.ndarray,
    intr_b: jnp.ndarray,
    T_WC_a: kin.SE3,  # batched (P,...)
    T_WC_b: kin.SE3,  # batched (P,...)
    uv_a: jnp.ndarray,  # (P, K, 2)
    uv_b: jnp.ndarray,  # (P, K, 2)
    pair_mask: jnp.ndarray,  # (P, K)
):
    """Batched triangulation for P frame pairs in one program."""

    def one(Ta, Tb, ua, ub, m):
        return triangulate_pairs(
            spec_a, spec_b, intr_a, intr_b, Ta, Tb, ua, ub, m
        )

    return jax.vmap(one)(T_WC_a, T_WC_b, uv_a, uv_b, pair_mask)


@functools.partial(jax.jit, static_argnames=("spec",))
def ransac_3d2d_px(
    key,
    spec: CameraSpec,
    intrinsics: jnp.ndarray,
    points_W: jnp.ndarray,  # (K, 3)
    uv: jnp.ndarray,  # (K, 2) pixels
    sel: jnp.ndarray,  # (K,) bool
    focal,
    threshold_px2,
):
    """back-project + absolute-pose RANSAC in ONE launch (was two per
    camera per frame on the hot path)."""
    from .ransac import ransac_absolute_pose

    bear = back_project_batch(spec, intrinsics, uv)
    return ransac_absolute_pose(
        key, points_W, bear, sel, focal=focal, threshold_px2=threshold_px2
    )


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

"""Frontend orchestration: detection, data association, initialization.

TPU-native re-design of the reference okvis::Frontend
(/root/reference/okvis_frontend/src/Frontend.cpp:69-845). Host code
orchestrates; all heavy work (detection, description, Hamming matching,
gating, triangulation, RANSAC) runs as jitted batched kernels:

- detect_and_describe        (Frontend.cpp:92-114; gravity-aligned extraction)
- data_association_and_initialization (Frontend.cpp:117-271):
    match to the last ≤3 keyframes (3D-2D then 2D-2D), RANSAC outlier
    rejection, keyframe decision, match to last frame, stereo matching with
    triangulation — creating landmarks/observations in the estimator.

Matching semantics follow VioKeyframeWindowMatchingAlgorithm
(okvis_frontend/src/VioKeyframeWindowMatchingAlgorithm.cpp): 3D-2D candidates
are image-space gated around the predicted projection; matched keypoints
inherit the landmark id and add an observation; 2D-2D matches triangulate a
new landmark (midpoint + chi² gate) observed in both frames.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import kinematics as kin
from ..cameras import pinhole
from ..cameras.ncamera import NCameraSystem
from ..estimator.estimator import Estimator
from ..imu.preintegration import ImuParams, propagate
from ..ops.hamming import MAX_DIST, masked_distance_matrix, mutual_best_assignment
from ..utils.ids import IdProvider
from .brisk import describe_keypoints, gravity_extraction_angle
from .detection import detect_keypoints
from .frame import FrameData, MultiFrame
from .keyframe import need_new_keyframe
from .ransac import ransac_absolute_pose, ransac_rotation_only
from .triangulation import triangulate_fast


@dataclasses.dataclass
class FrontendConfig:
    detection_threshold: float = 30.0
    max_keypoints: int = 400
    matching_threshold: int = 60  # BRISK Hamming (Frontend.cpp:78)
    gate_radius_px: float = 40.0  # image-space gate for 3D-2D candidates
    keyframe_overlap: float = 0.6  # Frontend.cpp:81
    keyframe_ratio: float = 0.2  # Frontend.cpp:82
    num_matching_keyframes: int = 3  # match against last 3 KFs (Frontend.cpp:153)
    ransac_threshold_px2: float = 9.0
    min_3d2d_matches: int = 5  # tracking-failure warning level (Frontend.cpp:191)


class Frontend:
    """Host-side frontend (VioFrontendInterface equivalent,
    /root/reference/okvis_common/include/okvis/VioFrontendInterface.hpp:69)."""

    def __init__(self, rig: NCameraSystem, cfg: FrontendConfig = None):
        self.rig = rig
        self.cfg = cfg or FrontendConfig()
        self.is_initialized = False
        self._rng_key = jax.random.PRNGKey(7)

    def _next_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    # ------------------------------------------------------------------
    def detect_and_describe(
        self, cam_idx: int, image: jnp.ndarray, T_WC: Optional[kin.SE3] = None
    ) -> FrameData:
        """Detection + gravity-aligned description (Frontend.cpp:92-114)."""
        kps = detect_keypoints(
            image,
            threshold=self.cfg.detection_threshold,
            max_keypoints=self.cfg.max_keypoints,
        )
        angle = None
        if T_WC is not None:
            # gravity direction in camera frame: C_CW @ -e_z
            g_C = kin.quat_rotate(
                kin.quat_conjugate(T_WC.q), jnp.asarray([0.0, 0.0, -1.0])
            )
            angle = gravity_extraction_angle(g_C)
        desc = describe_keypoints(image, kps, angle)
        return FrameData(
            keypoints=kps,
            descriptors=desc,
            landmark_ids=np.zeros(self.cfg.max_keypoints, np.int64),
            image=image,
        )

    # ------------------------------------------------------------------
    def propagation(self, imu_params, T_WS, sb, ts, gyro, acc, t0, t1):
        """Real-time state prediction (delegates to the preintegration scan;
        ref Frontend::propagation -> ImuError::propagation)."""
        return propagate(
            imu_params, T_WS, jnp.asarray(sb), jnp.asarray(ts), jnp.asarray(gyro),
            jnp.asarray(acc), jnp.asarray(t0), jnp.asarray(t1)
        )

    # ------------------------------------------------------------------
    def data_association_and_initialization(
        self,
        estimator: Estimator,
        T_WS_prop: kin.SE3,
        multiframe: MultiFrame,
    ) -> bool:
        """Match current multiframe against keyframes/last frame/stereo and
        feed the estimator. Returns as_keyframe decision."""
        cfg = self.cfg
        kf_ids = [
            s.id
            for s in estimator._states_by_time()
            if s.is_keyframe and s.id != multiframe.id
        ][-cfg.num_matching_keyframes:]
        num_3d2d = 0

        # --- 3D-2D + 2D-2D against recent keyframes (Frontend.cpp:153-183) ---
        for kf_id in reversed(kf_ids):
            kf_mf = estimator.multiframes.get(kf_id)
            if kf_mf is None:
                continue
            num_3d2d += self._match_to_frame(
                estimator, kf_mf, multiframe, T_WS_prop, do_triangulate=True
            )

        # RANSAC 3D-2D outlier rejection (Frontend.cpp:575-642)
        self._ransac_3d2d(estimator, multiframe, T_WS_prop)

        if not self.is_initialized and num_3d2d > 0:
            # initialization flips on the first successful (non-rotation-only)
            # association (Frontend.cpp:184-189)
            self.is_initialized = True

        # --- keyframe decision (Frontend.cpp:196) ---
        kps, matched = [], []
        for f in multiframe.frames:
            m = np.asarray(f.keypoints.mask)
            kps.append(np.asarray(f.keypoints.uv)[m])
            matched.append((f.landmark_ids[: len(m)][m] != 0))
        as_keyframe = need_new_keyframe(
            kps,
            matched,
            overlap_threshold=cfg.keyframe_overlap,
            ratio_threshold=cfg.keyframe_ratio,
            num_frames=estimator.num_frames(),
            is_initialized=self.is_initialized,
        )

        # --- match to last frame (Frontend.cpp:199-233) ---
        by_time = estimator._states_by_time()
        if len(by_time) >= 2:
            last_id = by_time[-2].id
            if last_id not in kf_ids:
                last_mf = estimator.multiframes.get(last_id)
                if last_mf is not None:
                    self._match_to_frame(
                        estimator, last_mf, multiframe, T_WS_prop, do_triangulate=True
                    )

        # --- stereo matching within the multiframe (Frontend.cpp:238-268) ---
        self._match_stereo(estimator, multiframe, T_WS_prop)

        return as_keyframe

    # ------------------------------------------------------------------
    def _frame_T_WC(self, estimator, state_or_T, cam: int) -> kin.SE3:
        T_SC = estimator.get_extrinsics(cam)
        if isinstance(state_or_T, kin.SE3):
            return kin.compose(state_or_T, T_SC)
        return kin.compose(estimator.get_T_WS(state_or_T), T_SC)

    def _match_to_frame(
        self,
        estimator: Estimator,
        frame_a: MultiFrame,
        frame_b: MultiFrame,
        T_WS_b: kin.SE3,
        do_triangulate: bool,
    ) -> int:
        """Match frame A (older, in estimator) to frame B (current): 3D-2D for
        A-keypoints with landmarks, 2D-2D (+triangulation) for the rest.
        Returns #3D-2D matches accepted."""
        cfg = self.cfg
        n3d = 0
        for cam in range(frame_b.num_cameras):
            fa, fb = frame_a.frames[cam], frame_b.frames[cam]
            mask_a = np.asarray(fa.keypoints.mask).copy()
            mask_b = np.asarray(fb.keypoints.mask).copy()
            has_lm = fa.landmark_ids != 0
            # only keep landmarks that still exist & are initialized
            for i in np.nonzero(has_lm)[0]:
                lm_id = int(fa.landmark_ids[i])
                if not estimator.is_landmark_added(lm_id):
                    fa.landmark_ids[i] = 0
                    has_lm[i] = False

            # B keypoints without landmark yet
            free_b = mask_b & (fb.landmark_ids == 0)

            # ---- 3D-2D: project landmarks into B, gate, match ----
            a_sel = mask_a & has_lm
            if a_sel.any():
                lm_slots = np.asarray(
                    [estimator.landmarks[int(l)].slot for l in fa.landmark_ids[a_sel]]
                )
                hp = estimator.hp_W[lm_slots]
                T_CW = kin.inverse(self._frame_T_WC(estimator, T_WS_b, cam))
                hp_C = np.asarray(
                    jax.vmap(lambda p: kin.transform_hpoint(T_CW, p))(jnp.asarray(hp))
                )
                uv_pred, flags = jax.vmap(
                    lambda p: pinhole.project_homogeneous(
                        self.rig.specs[cam], estimator.intrinsics[cam], p
                    )
                )(jnp.asarray(hp_C))
                uv_pred = np.asarray(uv_pred)
                proj_ok = np.asarray(flags) == pinhole.STATUS_OK
                idx_a = np.nonzero(a_sel)[0][proj_ok]
                if len(idx_a):
                    gate = self._gated_match(
                        fa.descriptors, fb.descriptors,
                        idx_a, np.nonzero(free_b)[0],
                        uv_pred[proj_ok], np.asarray(fb.keypoints.uv),
                        cfg.gate_radius_px,
                    )
                    for ia, ib in gate:
                        lm_id = int(fa.landmark_ids[ia])
                        frame_b.set_landmark_id(cam, ib, lm_id)
                        estimator.add_observation(
                            lm_id, frame_b.id, cam,
                            np.asarray(fb.keypoints.uv[ib]), keypoint_idx=int(ib),
                            size=8.0,
                        )
                        free_b[ib] = False
                        n3d += 1

            # ---- 2D-2D: un-landmarked A keypoints vs free B keypoints ----
            free_a = mask_a & (fa.landmark_ids == 0)
            ia_list = np.nonzero(free_a)[0]
            ib_list = np.nonzero(free_b)[0]
            if len(ia_list) and len(ib_list) and do_triangulate:
                matches = self._plain_match(fa.descriptors, fb.descriptors, ia_list, ib_list)
                if matches:
                    self._triangulate_and_add(
                        estimator, frame_a, frame_b, cam, matches, T_WS_b
                    )
        return n3d

    def _plain_match(self, desc_a, desc_b, idx_a, idx_b) -> List[Tuple[int, int]]:
        K = desc_a.shape[0]
        ma = np.zeros(K, bool)
        ma[idx_a] = True
        mb = np.zeros(K, bool)
        mb[idx_b] = True
        dist = masked_distance_matrix(
            desc_a, desc_b, jnp.asarray(ma), jnp.asarray(mb)
        )
        assign = np.asarray(
            mutual_best_assignment(dist, self.cfg.matching_threshold)
        )
        return [(ia, int(assign[ia])) for ia in idx_a if assign[ia] >= 0]

    def _gated_match(
        self, desc_a, desc_b, idx_a, idx_b, uv_pred, uv_b, gate_radius
    ) -> List[Tuple[int, int]]:
        """3D-2D matching with an image-space gate around the predicted
        projection (ref doSetup image-space uncertainty gating,
        VioKeyframeWindowMatchingAlgorithm.cpp:122-276)."""
        K = desc_a.shape[0]
        ma = np.zeros(K, bool)
        ma[idx_a] = True
        mb = np.zeros(K, bool)
        mb[idx_b] = True
        dist = np.array(
            masked_distance_matrix(desc_a, desc_b, jnp.asarray(ma), jnp.asarray(mb))
        )
        # gate: distance from predicted projection
        pred_full = np.full((K, 2), 1e9)
        pred_full[idx_a] = uv_pred
        d2 = ((pred_full[:, None, :] - np.asarray(uv_b)[None, :, :]) ** 2).sum(-1)
        dist[d2 > gate_radius * gate_radius] = int(MAX_DIST)
        assign = np.asarray(
            mutual_best_assignment(jnp.asarray(dist), self.cfg.matching_threshold)
        )
        return [(ia, int(assign[ia])) for ia in idx_a if assign[ia] >= 0]

    def _triangulate_and_add(
        self, estimator, frame_a, frame_b, cam, matches, T_WS_b
    ) -> int:
        """Triangulate 2D-2D matches between frame A and B (same camera) and
        create landmarks (ref setBestMatch 2D-2D path)."""
        fa, fb = frame_a.frames[cam], frame_b.frames[cam]
        T_WC_a = self._frame_T_WC(estimator, frame_a.id, cam)
        T_WC_b = self._frame_T_WC(estimator, T_WS_b, cam)
        ia = jnp.asarray([m[0] for m in matches])
        ib = jnp.asarray([m[1] for m in matches])
        spec = self.rig.specs[cam]
        intr = estimator.intrinsics[cam]
        rays_a = jax.vmap(lambda p: pinhole.back_project(spec, intr, p))(fa.keypoints.uv[ia])
        rays_b = jax.vmap(lambda p: pinhole.back_project(spec, intr, p))(fb.keypoints.uv[ib])
        e_a = kin.quat_rotate(T_WC_a.q[None], rays_a)
        e_a = e_a / jnp.linalg.norm(e_a, axis=-1, keepdims=True)
        e_b = kin.quat_rotate(T_WC_b.q[None], rays_b)
        e_b = e_b / jnp.linalg.norm(e_b, axis=-1, keepdims=True)
        n = len(matches)
        sigma = jnp.full((n,), 2.0 / float(intr[0]))  # ~2 px ray uncertainty
        out = triangulate_fast(
            jnp.tile(T_WC_a.r, (n, 1)), e_a, jnp.tile(T_WC_b.r, (n, 1)), e_b, sigma
        )
        valid = np.asarray(out.valid) & ~np.asarray(out.parallel)
        hp = np.asarray(out.hp)
        added = 0
        for k in np.nonzero(valid)[0]:
            w = hp[k, 3]
            if abs(w) < 1e-8:
                continue
            lm_id = IdProvider.new_id()
            p_W = hp[k, :3] / w
            try:
                estimator.add_landmark(lm_id, p_W)
            except RuntimeError:
                break  # landmark table full
            ia_k, ib_k = matches[k]
            frame_a.set_landmark_id(cam, ia_k, lm_id)
            frame_b.set_landmark_id(cam, ib_k, lm_id)
            estimator.add_observation(
                lm_id, frame_a.id, cam, np.asarray(fa.keypoints.uv[ia_k]),
                keypoint_idx=int(ia_k), size=8.0,
            )
            estimator.add_observation(
                lm_id, frame_b.id, cam, np.asarray(fb.keypoints.uv[ib_k]),
                keypoint_idx=int(ib_k), size=8.0,
            )
            added += 1
        return added

    def _match_stereo(self, estimator, multiframe, T_WS):
        """Intra-multiframe matching across overlapping camera pairs
        (Frontend.cpp:521-572)."""
        C = multiframe.num_cameras
        for ca in range(C):
            for cb in range(ca + 1, C):
                if not (self.rig.has_overlap(ca, cb) or self.rig.overlaps is None):
                    continue
                fa, fb = multiframe.frames[ca], multiframe.frames[cb]
                free_a = np.asarray(fa.keypoints.mask) & (fa.landmark_ids == 0)
                free_b = np.asarray(fb.keypoints.mask) & (fb.landmark_ids == 0)
                ia_list, ib_list = np.nonzero(free_a)[0], np.nonzero(free_b)[0]
                if not len(ia_list) or not len(ib_list):
                    continue
                matches = self._plain_match(fa.descriptors, fb.descriptors, ia_list, ib_list)
                if not matches:
                    continue
                self._triangulate_stereo(estimator, multiframe, ca, cb, matches, T_WS)

    def _triangulate_stereo(self, estimator, multiframe, ca, cb, matches, T_WS):
        fa, fb = multiframe.frames[ca], multiframe.frames[cb]
        T_WC_a = kin.compose(T_WS, estimator.get_extrinsics(ca))
        T_WC_b = kin.compose(T_WS, estimator.get_extrinsics(cb))
        ia = jnp.asarray([m[0] for m in matches])
        ib = jnp.asarray([m[1] for m in matches])
        rays_a = jax.vmap(
            lambda p: pinhole.back_project(self.rig.specs[ca], estimator.intrinsics[ca], p)
        )(fa.keypoints.uv[ia])
        rays_b = jax.vmap(
            lambda p: pinhole.back_project(self.rig.specs[cb], estimator.intrinsics[cb], p)
        )(fb.keypoints.uv[ib])
        e_a = kin.quat_rotate(T_WC_a.q[None], rays_a)
        e_a = e_a / jnp.linalg.norm(e_a, axis=-1, keepdims=True)
        e_b = kin.quat_rotate(T_WC_b.q[None], rays_b)
        e_b = e_b / jnp.linalg.norm(e_b, axis=-1, keepdims=True)
        n = len(matches)
        sigma = jnp.full((n,), 2.0 / float(estimator.intrinsics[ca][0]))
        out = triangulate_fast(
            jnp.tile(T_WC_a.r, (n, 1)), e_a, jnp.tile(T_WC_b.r, (n, 1)), e_b, sigma
        )
        valid = np.asarray(out.valid) & ~np.asarray(out.parallel)
        hp = np.asarray(out.hp)
        for k in np.nonzero(valid)[0]:
            w = hp[k, 3]
            if abs(w) < 1e-8:
                continue
            lm_id = IdProvider.new_id()
            try:
                estimator.add_landmark(lm_id, hp[k, :3] / w)
            except RuntimeError:
                break
            ia_k, ib_k = matches[k]
            multiframe.set_landmark_id(ca, ia_k, lm_id)
            multiframe.set_landmark_id(cb, ib_k, lm_id)
            estimator.add_observation(
                lm_id, multiframe.id, ca, np.asarray(fa.keypoints.uv[ia_k]),
                keypoint_idx=int(ia_k), size=8.0,
            )
            estimator.add_observation(
                lm_id, multiframe.id, cb, np.asarray(fb.keypoints.uv[ib_k]),
                keypoint_idx=int(ib_k), size=8.0,
            )

    # ------------------------------------------------------------------
    def _ransac_3d2d(self, estimator, multiframe, T_WS):
        """Absolute-pose RANSAC over the frame's 3D-2D associations; outlier
        observations are removed (ref runRansac3d2d, Frontend.cpp:575-642)."""
        rows = []  # (cam, kp_idx, lm_id, point_W, bearing_C)
        for cam in range(multiframe.num_cameras):
            f = multiframe.frames[cam]
            T_CW = kin.inverse(self._frame_T_WC(estimator, T_WS, cam))
            for k in np.nonzero(f.landmark_ids != 0)[0]:
                lm_id = int(f.landmark_ids[k])
                if not estimator.is_landmark_added(lm_id):
                    continue
                hp = estimator.get_landmark(lm_id)
                if abs(hp[3]) < 1e-8:
                    continue
                p_W = hp[:3] / hp[3]
                ray = pinhole.back_project(
                    self.rig.specs[cam], estimator.intrinsics[cam], f.keypoints.uv[k]
                )
                # bearing expressed in the sensor frame S would need the
                # noncentral solver; approximate with cam-0-centric frame
                ray_C = np.asarray(ray) / np.linalg.norm(np.asarray(ray))
                rows.append((cam, int(k), lm_id, p_W, ray_C))
        if len(rows) < 8:
            return
        pts = jnp.asarray(np.stack([r[3] for r in rows]))
        bear = jnp.asarray(np.stack([r[4] for r in rows]))
        # express points in the predicted camera frame of each obs' camera:
        # run RANSAC per camera (central solver per camera, like the ref's
        # noncentral GP3P restricted to one camera at a time)
        for cam in range(multiframe.num_cameras):
            sel = np.asarray([r[0] == cam for r in rows])
            if sel.sum() < 8:
                continue
            res = ransac_absolute_pose(
                self._next_key(),
                pts,
                bear,
                jnp.asarray(sel),
                focal=float(estimator.intrinsics[cam][0]),
                threshold_px2=self.cfg.ransac_threshold_px2,
            )
            if not bool(res.success):
                continue
            outliers = sel & ~np.asarray(res.inliers)
            for i in np.nonzero(outliers)[0]:
                cam_i, k_i, lm_id, _, _ = rows[i]
                estimator.remove_observation(lm_id, multiframe.id, cam_i, k_i)
                multiframe.set_landmark_id(cam_i, k_i, 0)

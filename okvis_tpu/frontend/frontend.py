"""Frontend orchestration: detection, data association, initialization.

TPU-native re-design of the reference okvis::Frontend
(/root/reference/okvis_frontend/src/Frontend.cpp:69-845). Host code
orchestrates; ALL heavy work (detection, description, Hamming matching,
gating, triangulation, RANSAC) runs through the fixed-shape jitted kernels in
frontend.kernels — compiled once per keypoint capacity, retrace-free for the
whole sequence:

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
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import kinematics as kin
from ..cameras.ncamera import NCameraSystem
from ..estimator.estimator import Estimator
from ..imu.preintegration import propagate
from ..utils import capture
from ..utils.ids import IdProvider
from ..utils.timing import Timing
from .brisk import describe_keypoints, gravity_extraction_angle
from .detection import detect_keypoints
from .frame import FrameData, MultiFrame
from .keyframe import need_new_keyframe
from . import kernels


@dataclasses.dataclass
class FrontendConfig:
    detection_threshold: float = 30.0
    detection_octaves: int = 0  # >0 enables scale-space detection
    max_keypoints: int = 400
    matching_threshold: int = 60  # BRISK Hamming (Frontend.cpp:78)
    gate_radius_px: float = 40.0  # image-space gate for 3D-2D candidates
    keyframe_overlap: float = 0.6  # Frontend.cpp:81
    keyframe_ratio: float = 0.2  # Frontend.cpp:82
    num_matching_keyframes: int = 3  # match against last 3 KFs (Frontend.cpp:153)
    ransac_threshold_px2: float = 9.0
    min_3d2d_matches: int = 5  # tracking-failure warning level (Frontend.cpp:191)
    detection_masks: tuple = None  # optional per-camera (H, W) bool masks
    # below this correspondence count the 2D-2D relative model also runs the
    # host Stewenius 5-point (reference minimal solver, Frontend.cpp:645-810)
    # and the higher-inlier model wins — 8-point hypotheses are correlated
    # and weak when N barely exceeds the sample size (frontend/fivepoint.py)
    fivepoint_max_corr: int = 24
    # added in quadrature to every keypoint gate stddev: the image-space
    # error budget of an UNCALIBRATED rig during online extrinsics
    # estimation (~focal·sigma_absolute_orientation px). 0 when extrinsics
    # are fixed/calibrated.
    gate_extra_px: float = 0.0


class Frontend:
    """Host-side frontend (VioFrontendInterface equivalent,
    /root/reference/okvis_common/include/okvis/VioFrontendInterface.hpp:69)."""

    def __init__(self, rig: NCameraSystem, cfg: FrontendConfig = None):
        self.rig = rig
        self.cfg = cfg or FrontendConfig()
        self.is_initialized = False
        self._rng_key = jax.random.PRNGKey(7)
        self._pending_stereo = None  # fused stereo results awaiting resolution
        # frames where the absolute-pose RANSAC found <10 inliers despite
        # >=10 candidates, so outlier removal was skipped (surfaced so a
        # degenerate-RANSAC-heavy sequence is visible; VERDICT r1)
        self.ransac_degenerate_frames = 0

    def _next_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    # ------------------------------------------------------------------
    def detect_and_describe(
        self, cam_idx: int, image: jnp.ndarray, T_WC: Optional[kin.SE3] = None
    ) -> FrameData:
        """Detection + gravity-aligned description (Frontend.cpp:92-114)."""
        sizes = None
        cam_mask = (
            self.cfg.detection_masks[cam_idx]
            if self.cfg.detection_masks is not None
            else None
        )
        if self.cfg.detection_octaves > 0:
            from .detection import detect_keypoints_pyramid

            kps, sizes_j = detect_keypoints_pyramid(
                image,
                threshold=self.cfg.detection_threshold,
                max_keypoints=self.cfg.max_keypoints,
                octaves=self.cfg.detection_octaves,
                mask=cam_mask,
            )
            sizes = np.asarray(sizes_j)
        else:
            kps = detect_keypoints(
                image,
                threshold=self.cfg.detection_threshold,
                max_keypoints=self.cfg.max_keypoints,
                mask=cam_mask,
            )
        angle = None
        if T_WC is not None:
            g_C = kin.quat_rotate(
                kin.quat_conjugate(T_WC.q), jnp.asarray([0.0, 0.0, -1.0])
            )
            angle = gravity_extraction_angle(g_C)
        desc = describe_keypoints(
            image, kps, angle, sizes=None if sizes is None else sizes_j
        )
        return FrameData(
            keypoints=kps,
            descriptors=desc,
            landmark_ids=np.zeros(self.cfg.max_keypoints, np.int64),
            image=image,
            sizes=sizes,
        )

    def detect_and_describe_multi(
        self, images, T_WS: Optional[kin.SE3] = None
    ) -> List[FrameData]:
        """All cameras of a multiframe in one jitted launch (gravity-aligned
        per-camera extraction angles)."""
        from .brisk import detect_and_describe_batch

        C = len(images)
        angles = np.zeros(C, np.float32)
        if T_WS is not None:
            for c in range(C):
                T_WC = kin.compose(T_WS, kin.SE3(r=self.rig.T_SC.r[c], q=self.rig.T_SC.q[c]))
                g_C = kin.quat_rotate(
                    kin.quat_conjugate(T_WC.q), jnp.asarray([0.0, 0.0, -1.0])
                )
                angles[c] = float(gravity_extraction_angle(g_C))
        stack = jnp.stack([jnp.asarray(im, jnp.float32) for im in images])
        if self.cfg.detection_octaves > 0 or self.cfg.detection_masks is not None:
            # scale-space / masked path, batched over cameras in one program
            from .brisk import detect_and_describe_batch_pyramid

            has_masks = self.cfg.detection_masks is not None
            masks = (
                jnp.stack([jnp.asarray(m, bool) for m in self.cfg.detection_masks])
                if has_masks
                else None
            )
            kps_b, sizes_b, desc_b = detect_and_describe_batch_pyramid(
                stack,
                jnp.asarray(angles),
                masks,
                threshold=self.cfg.detection_threshold,
                max_keypoints=self.cfg.max_keypoints,
                octaves=self.cfg.detection_octaves,
                has_masks=has_masks,
            )
            if capture.enabled:
                capture.record(
                    "detect", detect_and_describe_batch_pyramid, stack,
                    jnp.asarray(angles), masks,
                    threshold=self.cfg.detection_threshold,
                    max_keypoints=self.cfg.max_keypoints,
                    octaves=self.cfg.detection_octaves,
                    has_masks=has_masks,
                )
            sizes_np = np.asarray(sizes_b) if self.cfg.detection_octaves > 0 else None
        else:
            kps_b, desc_b = detect_and_describe_batch(
                stack,
                jnp.asarray(angles),
                threshold=self.cfg.detection_threshold,
                max_keypoints=self.cfg.max_keypoints,
            )
            if capture.enabled:
                capture.record(
                    "detect", detect_and_describe_batch, stack, jnp.asarray(angles),
                    threshold=self.cfg.detection_threshold,
                    max_keypoints=self.cfg.max_keypoints,
                )
            sizes_np = None
        # one joint host fetch for all cameras' uv/mask mirrors — the
        # association path reads them many times; done HERE so the transfer
        # overlaps the processing thread (detection runs in its own stage)
        from ..utils import syncstats

        syncstats.bump("detect_fetch")
        uv_h, mask_h = jax.device_get((kps_b.uv, kps_b.mask))
        out = []
        for c in range(C):
            fd = FrameData(
                keypoints=jax.tree_util.tree_map(lambda x: x[c], kps_b),
                descriptors=desc_b[c],
                landmark_ids=np.zeros(self.cfg.max_keypoints, np.int64),
                image=stack[c],
                sizes=None if sizes_np is None else sizes_np[c],
            )
            fd.set_host_mirrors(uv_h[c], mask_h[c])
            out.append(fd)
        return out

    # ------------------------------------------------------------------
    def propagation(self, imu_params, T_WS, sb, ts, gyro, acc, t0, t1):
        """Real-time state prediction (ref Frontend::propagation)."""
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
        sb_prop: Optional[np.ndarray] = None,
    ) -> bool:
        """Match current multiframe against keyframes/last frame/stereo and
        feed the estimator. Returns as_keyframe decision."""
        cfg = self.cfg
        kf_ids = [
            s.id
            for s in estimator._states_by_time()
            if s.is_keyframe and s.id != multiframe.id
        ][-cfg.num_matching_keyframes:]
        # keyframe sources (newest first), matched in batched kernel
        # launches — one gated-match / plain-match / triangulation program
        # per camera instead of one per (source, camera) pair. The last
        # frame is matched AFTER the keyframe decision (below), and only
        # keyframe matches feed num3dMatches — reference ordering,
        # Frontend.cpp:153-233.
        sources: List[MultiFrame] = []
        for kf_id in reversed(kf_ids):
            kf_mf = estimator.multiframes.get(kf_id)
            if kf_mf is not None:
                sources.append(kf_mf)
        n_primary = len(sources)

        # the LAST FRAME rides the SAME fused launch as the lowest-priority
        # source (matchToLastFrame, Frontend.cpp:199-233): the reference
        # matches it sequentially AFTER the keyframe decision, which only
        # matters for claim priority and the decision's inputs — both
        # reproduced on the host by resolving keyframe sources first, taking
        # the decision, then resolving the last-frame source. Folding it
        # removes one blocking device round trip per frame. During bootstrap
        # (not initialized) the decision must see the 2D-2D-RANSAC
        # initialization flip first (ref ordering, Frontend.cpp:184-196), so
        # the fold only engages once tracking is initialized.
        by_time = estimator._states_by_time()
        last_mf = None
        if len(by_time) >= 2 and by_time[-2].id not in kf_ids:
            last_mf = estimator.multiframes.get(by_time[-2].id)
        fold_last = self.is_initialized and last_mf is not None
        if fold_last:
            sources.append(last_mf)

        # uniform-model rigs carry the intra-frame stereo matching inside the
        # association launch (stereo=True); its results are resolved after
        # the last-frame phase via _pending_stereo
        self._pending_stereo = None

        def keyframe_decision():
            # --- keyframe decision (Frontend.cpp:196), taken after the
            # keyframe sources resolved and before the last-frame phase ---
            kps, matched = [], []
            for f in multiframe.frames:
                m = f.mask_np
                kps.append(f.uv_np[m])
                matched.append((f.landmark_ids[: len(m)][m] != 0))
            return need_new_keyframe(
                kps,
                matched,
                overlap_threshold=cfg.keyframe_overlap,
                ratio_threshold=cfg.keyframe_ratio,
                num_frames=estimator.num_frames(),
                is_initialized=self.is_initialized,
            )

        # RANSAC outlier removal is gated on isInitialized_ for the keyframe
        # round (ref Frontend.cpp:434-436) — bootstrap-phase stereo
        # associations must not be stripped before initialization
        as_keyframe = None
        if sources:
            num_3d2d, as_keyframe = self._associate_batched(
                estimator, sources, multiframe, T_WS_prop,
                apply_ransac=self.is_initialized,
                stereo=True,
                n_primary=n_primary,
                phase_callback=keyframe_decision if fold_last else None,
                sb_b=sb_prop,
            )
        else:
            num_3d2d = 0
            estimator.resolve_pending_prop()
        if n_primary and self.is_initialized and num_3d2d <= cfg.min_3d2d_matches:
            # ref "Tracking failure" warning (Frontend.cpp:191-193)
            import logging

            logging.getLogger("okvis_tpu").warning(
                "Tracking failure. Number of 3d2d-matches: %d", num_3d2d
            )

        # initialization: 2D-2D RANSAC decides rotation-only vs translation
        # (ref runRansac2d2d, Frontend.cpp:645-810; init flips at :184-189)
        if not self.is_initialized and kf_ids:
            kf_mf = estimator.multiframes.get(kf_ids[-1])
            if kf_mf is not None:
                rotation_only = self._ransac_2d2d(
                    estimator, kf_mf, multiframe, initialize_pose=True,
                    remove_outliers=False,
                )
                if not rotation_only:
                    self.is_initialized = True
        if not self.is_initialized and num_3d2d > 0:
            # stereo shortcut: metric landmarks already exist
            self.is_initialized = True

        if as_keyframe is None:
            as_keyframe = keyframe_decision()

        # bootstrap fallback: last frame matched in its own (sequential)
        # round after the decision, exactly the reference ordering
        if not fold_last and last_mf is not None:
            self._associate_batched(
                estimator, [last_mf], multiframe, T_WS_prop, apply_ransac=True,
            )
            # the reference also runs the 2D-2D RANSAC against the LAST
            # frame while uninitialized (Frontend.cpp:513-516); when the
            # translational model decisively wins there, flip tracking to
            # initialized — the keyframe-round signal alone starves once
            # the single bootstrap keyframe leaves the field of view
            # (measured mono-loop bootstrap, BENCH_NOTES round 5). The pose
            # itself stays IMU-predicted (initialize_pose=False).
            if not self.is_initialized:
                rotation_only = self._ransac_2d2d(
                    estimator, last_mf, multiframe,
                    initialize_pose=False, remove_outliers=False,
                )
                if not rotation_only:
                    self.is_initialized = True

        # --- stereo matching within the multiframe (Frontend.cpp:238-268):
        # resolved from the fused launch's precomputed results when present,
        # otherwise its own launch (first frame, mixed-spec rigs) ---
        if (
            self._pending_stereo is not None
            and self._pending_stereo[0] == multiframe.id
        ):
            (_fid, prs,
             (s_assign, s_hp, s_valid, s_par, s_ci)) = self._pending_stereo
            self._pending_stereo = None
            for i, (ca, cb) in enumerate(prs):
                self._resolve_stereo_pair(
                    estimator, multiframe, ca, cb,
                    s_assign[i], s_hp[i], s_valid[i], s_par[i], s_ci[i],
                )
        else:
            self._match_stereo(estimator, multiframe, T_WS_prop)

        return as_keyframe

    # ------------------------------------------------------------------
    def _associate_batched(
        self,
        estimator: Estimator,
        sources: List[MultiFrame],
        frame_b: MultiFrame,
        T_WS_b: kin.SE3,
        apply_ransac: bool = False,
        stereo: bool = False,
        n_primary: Optional[int] = None,
        phase_callback=None,
        sb_b: Optional[np.ndarray] = None,
    ):
        """3D-2D + 2D-2D association of all source frames against the current
        frame in ONE fused kernel launch for the whole rig (the batched form
        of matchToKeyframes + matchToLastFrame, Frontend.cpp:153-233): gated
        3D-2D assignment, 2D-2D assignment of the leftovers, and
        triangulation of every 2D-2D match all run in a single XLA program
        (kernels.associate_multicam), fetched with one device_get. Mixed
        camera models fall back to one fused launch per camera.

        Sources [0, n_primary) are the keyframe round; any remaining sources
        form the folded last-frame round, resolved after `phase_callback`
        (the keyframe decision) runs. Returns (num 3D-2D keyframe matches,
        phase_callback result or None).

        Conflicts (two sources matching the same current keypoint) are
        resolved on the host in source order — newest keyframe wins; losers
        re-match against the remaining free keypoints in a rare second
        batched round (the reference's sequential per-source matching gets
        this for free)."""
        t_host0 = time.perf_counter()
        t_host0_cpu = time.thread_time()
        cfg = self.cfg
        K = cfg.max_keypoints
        P = len(sources)
        C = frame_b.num_cameras

        # ---------- build (P, C, ...) inputs for the fused launch ----------
        mask_b_np = [frame_b.frames[c].mask_np for c in range(C)]
        uv_b_all = [frame_b.frames[c].uv_np for c in range(C)]
        free_b_np = [
            mask_b_np[c] & (frame_b.frames[c].landmark_ids == 0) for c in range(C)
        ]
        # 3D-2D uses only INITIALIZED landmarks with ≥2 observations; carried
        # UNinitialized landmarks go through the 2D-2D pool and are
        # re-triangulated/upgraded on match (ref doSetup skip lists,
        # VioKeyframeWindowMatchingAlgorithm.cpp:170-200,225-233)
        # sorted landmark lookup tables, built once per call in O(L) — all
        # per-keypoint dict probes below become vectorized searchsorted
        # lookups (VERDICT r1 "vectorize host resolution"; obs_count is
        # maintained incrementally by the estimator)
        obs_count = estimator.obs_count
        n_lm = len(estimator.landmarks)
        tbl_ids = np.fromiter(estimator.landmarks.keys(), np.int64, n_lm)
        _order = np.argsort(tbl_ids)
        tbl_ids = tbl_ids[_order]
        _recs = list(estimator.landmarks.values())
        tbl_slot = np.fromiter((r.slot for r in _recs), np.int64, n_lm)[_order]
        tbl_init = np.fromiter((r.initialized for r in _recs), bool, n_lm)[_order]
        tbl_obs2 = np.fromiter(
            (obs_count.get(int(i), 0) >= 2 for i in tbl_ids), bool, n_lm
        )

        def _lm_lookup(lids):
            """(row, found) in the tables per id; id 0 is never found."""
            if n_lm == 0:
                return np.zeros(lids.shape, np.int64), np.zeros(lids.shape, bool)
            idx = np.clip(np.searchsorted(tbl_ids, lids), 0, n_lm - 1)
            return idx, (lids != 0) & (tbl_ids[idx] == lids)

        sel_a = np.zeros((P, C, K), bool)
        hp_rows = np.tile(np.asarray([0.0, 0, 0, 1.0]), (P, C, K, 1))
        free2_a = np.zeros((P, C, K), bool)
        # snapshot of the landmark id each 3D-2D source row carries at launch
        # time — host conflict resolution can rebind keypoints, and the
        # folded RANSAC's inlier verdicts only apply to the landmark the
        # device actually scored (see outlier removal below)
        lm_a_ids = np.zeros((P, C, K), np.int64)
        for p, src in enumerate(sources):
            for c in range(C):
                fa = src.frames[c]
                m_a = fa.mask_np
                lids = fa.landmark_ids
                idx, found = _lm_lookup(lids)
                stale = (lids != 0) & ~found
                if stale.any():
                    fa.landmark_ids[stale] = 0
                carried = found & m_a
                init = carried & tbl_init[idx] if n_lm else carried
                # single-observation initialized landmarks: depth not
                # observable — demote (ref doSetup :195-199); the decision
                # depends only on the global obs count, so batching it over
                # occurrences matches the reference's per-row demotion
                demote = init & ~tbl_obs2[idx] if n_lm else init
                if demote.any():
                    for lm_id in np.unique(lids[demote]):
                        estimator.landmarks[int(lm_id)].initialized = False
                    # keep the snapshot table consistent: later (p, c)
                    # occurrences of the same landmark see it demoted and
                    # skip the host work above
                    tbl_init[idx[demote]] = False
                    init &= ~demote
                sel_a[p, c] = init
                if init.any():
                    hp_rows[p, c][init] = estimator.hp_W[tbl_slot[idx[init]]]
                    lm_a_ids[p, c][init] = lids[init]
                # demoted/uninitialized carried landmarks fall through to the
                # 2D-2D pool (upgraded on match), as do unassociated keypoints
                free2_a[p, c] = (carried & ~init) | (m_a & (fa.landmark_ids == 0))

        # pure-numpy input tables done; the rest of the build is device
        # upload/dispatch (jnp.asarray/stack), timed separately (thread CPU
        # time excludes GIL waits on concurrent device threads)
        Timing.add("host: assoc tables (np)", time.thread_time() - t_host0_cpu)
        desc_a_j = jnp.stack(
            [jnp.stack([src.frames[c].descriptors for c in range(C)]) for src in sources]
        )  # (P, C, K, 16)
        uv_a_j = jnp.stack(
            [jnp.stack([src.frames[c].keypoints.uv for c in range(C)]) for src in sources]
        )  # (P, C, K, 2)
        desc_b_j = jnp.stack([frame_b.frames[c].descriptors for c in range(C)])
        uv_b_j = jnp.stack([frame_b.frames[c].keypoints.uv for c in range(C)])
        # keypoint stddevs (0.8·size/12, ref doSetup :211-214) for the
        # current frame and every source frame (ray sigmas are size-scaled)
        std_b = np.empty((C, K))
        for c in range(C):
            sizes = frame_b.frames[c].sizes
            std_b[c] = 0.8 / 12.0 * (
                np.asarray(sizes)[:K] if sizes is not None else 8.0
            )
        std_a = np.empty((P, C, K))
        for p, src in enumerate(sources):
            for c in range(C):
                sizes = src.frames[c].sizes
                std_a[p, c] = 0.8 / 12.0 * (
                    np.asarray(sizes)[:K] if sizes is not None else 8.0
                )
        if cfg.gate_extra_px > 0.0:
            # uncalibrated-rig error budget (online extrinsics estimation)
            std_b = np.sqrt(std_b**2 + cfg.gate_extra_px**2)
            std_a = np.sqrt(std_a**2 + cfg.gate_extra_px**2)
        # keypoints that already carry landmarks: RANSAC candidates too (the
        # reference's noncentral adapter collects all current associations
        # whose landmark has ≥2 observations, FrameNoncentralAbsoluteAdapter
        # .cpp:83-84 — single-observation depths are unconstrained)
        lids0 = np.stack(
            [frame_b.frames[c].landmark_ids.copy() for c in range(C)]
        )  # pre-round bindings (device RANSAC scored these where sel_prev)
        idx0, found0 = _lm_lookup(lids0)
        if n_lm:
            sel_prev = found0 & tbl_obs2[idx0]
            hp0 = estimator.hp_W[tbl_slot[idx0]]
            # points at infinity carry no metric position
            sel_prev &= np.abs(hp0[..., 3]) >= 1e-8
            w0 = np.where(sel_prev, hp0[..., 3], 1.0)[..., None]
            pts_prev = np.where(sel_prev[..., None], hp0[..., :3] / w0, 0.0)
        else:
            sel_prev = found0
            pts_prev = np.zeros((C, K, 3))
        # source camera poses built on host (SOURCE pose state lives in
        # numpy — committed by earlier frames); the CURRENT frame's camera
        # poses and the velocity-scaled gate variance are composed IN-KERNEL
        # from (T_WS_b, sb_b), so a deferred (still device-resident)
        # propagation never forces its own blocking fetch.
        from ..kinematics import np_se3

        src_slots = [estimator.states[src.id].slot for src in sources]
        T_WC_a_list = [
            [
                np_se3.compose(
                    estimator.r_WS[s], estimator.q_WS[s],
                    estimator.r_SC[c], estimator.q_SC[c],
                )
                for c in range(C)
            ]
            for s in src_slots
        ]
        T_WC_a_stk = kin.SE3(
            r=jnp.asarray(np.stack([[t[0] for t in row] for row in T_WC_a_list])),
            q=jnp.asarray(np.stack([[t[1] for t in row] for row in T_WC_a_list])),
        )

        T_SC_stk = kin.SE3(
            r=jnp.asarray(estimator.r_SC[:C]), q=jnp.asarray(estimator.q_SC[:C])
        )
        T_WS_b_j = kin.SE3(r=jnp.asarray(T_WS_b.r), q=jnp.asarray(T_WS_b.q))
        if sb_b is None:
            try:
                sb_b = estimator.get_speed_and_bias(frame_b.id)
            except KeyError:
                sb_b = np.zeros(9)
        sb_b_j = jnp.asarray(sb_b)
        uniform = len(set(self.rig.specs[:C])) == 1
        # intra-frame stereo rides the fused launch only on uniform rigs;
        # mixed rigs fall back to the standalone _match_stereo launch
        stereo_pairs = self._stereo_pairs(C) if (stereo and uniform) else ()
        if uniform:
            assoc_args = (
                self.rig.specs[0],
                self._next_key(),
                jnp.stack(estimator.intrinsics[:C]),
                desc_a_j,
                jnp.asarray(sel_a),
                jnp.asarray(hp_rows),
                jnp.asarray(free2_a),
                uv_a_j,
                jnp.asarray(std_a),
                T_WS_b_j,
                sb_b_j,
                T_WC_a_stk,
                desc_b_j,
                jnp.asarray(np.stack(free_b_np)),
                uv_b_j,
                jnp.asarray(std_b),
                jnp.asarray(sel_prev),
                jnp.asarray(pts_prev),
                T_SC_stk,
                jnp.asarray(cfg.gate_radius_px),
                jnp.asarray(cfg.ransac_threshold_px2),
            )
            out = kernels.associate_multicam(
                *assoc_args,
                threshold=cfg.matching_threshold,
                stereo_pairs=stereo_pairs,
            )
            if capture.enabled:
                capture.record(
                    "associate", kernels.associate_multicam, *assoc_args,
                    threshold=cfg.matching_threshold, stereo_pairs=stereo_pairs,
                )
            # ONE blocking sync: the association results, the propagated
            # body state (host copy for the rare recovery round), AND any
            # deferred addStates propagation in the same device_get
            Timing.add("host: assoc build", time.perf_counter() - t_host0)
            out_f, T_b_f, sb_f = estimator.fetch_with_pending(
                (out, T_WS_b_j, sb_b_j)
            )
            (assign3_all, assign2_all, hp_all, val_all, par_all, ci_all,
             rs_inliers, rs_num, _rs_success, stereo_out) = out_f
            rs_num = np.full(C, int(rs_num))  # rig-pooled count
            if stereo_pairs:
                # stash the fused stereo results: resolved by the caller
                # AFTER the last-frame round (drop-on-conflict, late claims)
                self._pending_stereo = (frame_b.id, stereo_pairs, stereo_out)
        else:
            # mixed camera models: one fused launch per camera (the folded
            # RANSAC then pools per camera rather than rig-wide)
            parts = []
            for c in range(C):
                parts.append(
                    kernels.associate_onecam(
                        self.rig.specs[c],
                        self._next_key(),
                        estimator.intrinsics[c],
                        desc_a_j[:, c],
                        jnp.asarray(sel_a[:, c]),
                        jnp.asarray(hp_rows[:, c]),
                        jnp.asarray(free2_a[:, c]),
                        uv_a_j[:, c],
                        jnp.asarray(std_a[:, c]),
                        T_WS_b_j,
                        sb_b_j,
                        kin.SE3(r=T_WC_a_stk.r[:, c], q=T_WC_a_stk.q[:, c]),
                        desc_b_j[c],
                        jnp.asarray(free_b_np[c]),
                        uv_b_j[c],
                        jnp.asarray(std_b[c]),
                        jnp.asarray(sel_prev[c]),
                        jnp.asarray(pts_prev[c]),
                        kin.SE3(r=T_SC_stk.r[c], q=T_SC_stk.q[c]),
                        jnp.asarray(cfg.gate_radius_px),
                        jnp.asarray(cfg.ransac_threshold_px2),
                        threshold=cfg.matching_threshold,
                    )
                )
            Timing.add("host: assoc build", time.perf_counter() - t_host0)
            fetched, T_b_f, sb_f = estimator.fetch_with_pending(
                (parts, T_WS_b_j, sb_b_j)
            )
            assign3_all = np.stack([f[0] for f in fetched], axis=1)
            assign2_all = np.stack([f[1] for f in fetched], axis=1)
            hp_all = np.stack([f[2] for f in fetched], axis=1)
            val_all = np.stack([f[3] for f in fetched], axis=1)
            par_all = np.stack([f[4] for f in fetched], axis=1)
            ci_all = np.stack([f[5] for f in fetched], axis=1)
            rs_inliers = np.stack([f[6] for f in fetched])
            # per-camera pools: each camera applies under its own count
            rs_num = np.asarray([int(f[7]) for f in fetched])

        # ---------- RANSAC degeneracy counter ----------
        # candidates the device RANSAC saw = this round's claims + keypoints
        # already carrying >=2-obs landmarks (ransac_sel device-side)
        if apply_ransac:
            n_cand = int(np.count_nonzero(sel_prev))
            claimed_dev = np.zeros((C, K), bool)
            for p in range(P):
                for c in range(C):
                    hit = assign3_all[p, c] >= 0
                    claimed_dev[c, assign3_all[p, c][hit]] = True
            n_cand += int(np.count_nonzero(claimed_dev & ~sel_prev))
            if n_cand >= 10 and int(np.max(rs_num)) < 10:
                self.ransac_degenerate_frames += 1
                import logging

                logging.getLogger("okvis_tpu").warning(
                    "absolute-pose RANSAC found <10 inliers from %d "
                    "candidates on frame %d; outlier removal skipped "
                    "(%d such frames so far)",
                    n_cand, frame_b.id, self.ransac_degenerate_frames,
                )

        # ---------- device-scored landmark per target keypoint ----------
        # The folded RANSAC scored, for every current keypoint, either its
        # pre-existing landmark (sel_prev) or the NEWEST source's candidate
        # landmark (device scatter order). Host conflict resolution below may
        # bind a DIFFERENT landmark; inlier/outlier verdicts only transfer
        # when the binding matches what the device scored.
        dev_lm = np.zeros((C, K), np.int64)
        for p in range(P - 1, -1, -1):  # oldest first; newest overwrites
            for c in range(C):
                hit = assign3_all[p, c] >= 0
                dev_lm[c, assign3_all[p, c][hit]] = lm_a_ids[p, c][hit]
        dev_lm = np.where(sel_prev, lids0, dev_lm)

        # host copies of the propagated state (fetched with the main sync)
        # feed the rare loser-recovery round without another device wait
        r_b_np = np.asarray(T_b_f.r, np.float64)
        q_b_np = np.asarray(T_b_f.q, np.float64)
        scale = max(1.0, float(np.linalg.norm(np.asarray(sb_f)[:3])))
        sigma_pos2 = jnp.asarray(scale * scale * 1e-2)
        T_CW_host = [
            np_se3.inverse(
                *np_se3.compose(
                    r_b_np, q_b_np, estimator.r_SC[c], estimator.q_SC[c]
                )
            )
            for c in range(C)
        ]
        # current-frame camera centers (world) — the 2D-2D creation branch
        # compares triangulated depth against the pair baseline
        cam_centers_b = [
            np_se3.compose(
                r_b_np, q_b_np, estimator.r_SC[c], estimator.q_SC[c]
            )[0]
            for c in range(C)
        ]

        # ---------- host resolution, in phases ----------
        # phase 1 = primary (keyframe) sources, phase 2 = the folded
        # last-frame source; the keyframe decision (phase_callback) runs in
        # between, preserving the reference's sequential ordering
        # (Frontend.cpp:153-233) with ONE device launch.
        n_primary = P if n_primary is None else n_primary
        # per-camera state persisting across phases: a landmark may be
        # carried by several sources — once it claims a current keypoint,
        # later sources carrying the SAME landmark must not add a second
        # observation of it in this frame/camera
        claimed_by_cam = [
            {int(l) for l in frame_b.frames[c].landmark_ids if l != 0}
            for c in range(C)
        ]
        n3d_primary = 0
        nonlocal_t = {"recovery": 0.0, "recovery_cpu": 0.0}

        def resolve_phase(p_lo, p_hi, apply_rs):
            nonlocal n3d_primary
            for cam in range(C):
                fb = frame_b.frames[cam]
                uv_b_np = uv_b_all[cam]
                free_b = free_b_np[cam]
                claimed = claimed_by_cam[cam]

                def resolve_3d2d(assign_np, collect_losers):
                    nonlocal n3d_primary
                    losers = np.zeros((P, K), bool)
                    for p in range(p_lo, p_hi):
                        fa = sources[p].frames[cam]
                        for ia in np.nonzero(assign_np[p] >= 0)[0]:
                            lm_id = int(fa.landmark_ids[ia])
                            if lm_id == 0 or not estimator.is_landmark_added(lm_id):
                                continue
                            if lm_id in claimed:
                                continue  # already observed in this frame/camera
                            ib = int(assign_np[p, ia])
                            if not free_b[ib]:
                                # keypoint taken by an earlier (newer) source
                                if collect_losers:
                                    losers[p, ia] = True
                                continue
                            if not estimator.add_observation(
                                lm_id, frame_b.id, cam, uv_b_np[ib],
                                keypoint_idx=ib, size=fb.keypoint_size(ib),
                            ):
                                continue  # observation table full
                            frame_b.set_landmark_id(cam, ib, lm_id)
                            claimed.add(lm_id)
                            free_b[ib] = False
                            if p < n_primary:
                                # only keyframe matches feed num3dMatches
                                # (ref Frontend.cpp:153-193)
                                n3d_primary += 1
                    return losers

                losers = resolve_3d2d(assign3_all[:, cam], collect_losers=True)
                # ---- second round: conflict losers re-match against the
                # remaining free keypoints (the reference's sequential
                # per-source matching gets this for free; one extra batched
                # launch restores it, only on frames that had conflicts) ----
                if losers.any() and free_b.any():
                    t_rec0 = time.perf_counter()
                    t_rec0_cpu = time.thread_time()
                    T_CW_b = kin.SE3(
                        r=jnp.tile(jnp.asarray(T_CW_host[cam][0])[None], (P, 1)),
                        q=jnp.tile(jnp.asarray(T_CW_host[cam][1])[None], (P, 1)),
                    )
                    assign_r, _ = kernels.gated_match_pairs(
                        self.rig.specs[cam],
                        estimator.intrinsics[cam],
                        desc_a_j[:, cam],
                        jnp.asarray(losers),
                        jnp.asarray(hp_rows[:, cam]),
                        T_CW_b,
                        fb.descriptors,
                        jnp.asarray(free_b),
                        fb.keypoints.uv,
                        jnp.asarray(std_b[cam]),
                        sigma_pos2,
                        jnp.asarray(cfg.gate_radius_px),
                        threshold=cfg.matching_threshold,
                    )
                    nonlocal_t["recovery"] += time.perf_counter() - t_rec0
                    nonlocal_t["recovery_cpu"] += time.thread_time() - t_rec0_cpu
                    resolve_3d2d(np.asarray(assign_r), collect_losers=False)

                # ---- 2D-2D: assignments + triangulations precomputed in the
                # fused launch; resolve conflicts, create landmarks, and
                # upgrade carried uninitialized landmarks (ref setBestMatch
                # 2D-2D path, VioKeyframeWindowMatchingAlgorithm.cpp:398-441) ----
                assign2 = assign2_all[:, cam]
                taken_b = ~free_b | (fb.landmark_ids[:K] != 0)
                for p in range(p_lo, p_hi):
                    src = sources[p]
                    fa = src.frames[cam]
                    uva = fa.uv_np
                    for ia in np.nonzero(assign2[p] >= 0)[0]:
                        ib = int(assign2[p, ia])
                        if taken_b[ib]:
                            continue
                        taken_b[ib] = True  # one landmark per current keypoint
                        if not val_all[p, cam, ia]:
                            continue
                        if fb.landmark_ids[ib] != 0:
                            continue
                        hp = hp_all[p, cam, ia]
                        w = hp[3]
                        lm_a = int(fa.landmark_ids[ia])
                        if lm_a != 0:
                            # source row carries an UNinitialized landmark:
                            # reuse it — update the estimate if this match
                            # triangulates with parallax, add the
                            # current-frame observation (ref :436-441)
                            if not estimator.is_landmark_added(lm_a):
                                fa.landmark_ids[ia] = 0
                            elif lm_a not in claimed:
                                # device can_init folds parallel + depth
                                # observability (ref setBestMatch :398-441)
                                can_init = (
                                    bool(ci_all[p, cam, ia]) and abs(w) >= 1e-6
                                )
                                if can_init:
                                    estimator.set_landmark(lm_a, hp[:3] / w)
                                    estimator.landmarks[lm_a].initialized = True
                                if estimator.add_observation(
                                    lm_a, frame_b.id, cam, uv_b_np[ib],
                                    keypoint_idx=ib, size=fb.keypoint_size(ib),
                                ):
                                    frame_b.set_landmark_id(cam, ib, lm_a)
                                    claimed.add(lm_a)
                            continue
                        lm_id = IdProvider.new_id()
                        par_flag = bool(par_all[p, cam, ia]) or abs(w) < 1e-6
                        ci = bool(ci_all[p, cam, ia])
                        try:
                            if par_flag:
                                estimator.add_landmark(lm_id, hp, initialized=False)
                            elif not ci:
                                # depth-unobservable finite triangulation
                                # (ref canBeInitialized, setBestMatch
                                # :398-441). Distinguish two regimes by
                                # depth/baseline ratio:
                                # - parallax below the noise floor (ratio >
                                #   500 ≈ <0.4 px at EuRoC focal): a finite
                                #   midpoint is pure junk depth whose
                                #   reprojection factors outvote the IMU and
                                #   pin the trajectory static (measured
                                #   mono-bootstrap failure, BENCH_NOTES
                                #   round 5) — keep only the BEARING (point
                                #   at infinity along the ray);
                                # - measurable-but-subthreshold parallax:
                                #   keep the midpoint (an infinity placement
                                #   would inject wrong zero-parallax
                                #   translation info — measured to stall the
                                #   online-extrinsics convergence test).
                                c_a = T_WC_a_list[p][cam][0]
                                pt = hp[:3] / w
                                depth = float(np.linalg.norm(pt - c_a))
                                bl = float(
                                    np.linalg.norm(cam_centers_b[cam] - c_a)
                                )
                                # bl < 3 cm: at mm-scale baselines the noisy
                                # midpoint depth scatters 2..50 m, so SOME
                                # draws beat the ratio test and the pin
                                # re-engages stochastically (bimodal mono
                                # bootstrap) — below a real stereo-scale
                                # baseline no finite depth is trustworthy
                                if depth > 500.0 * max(bl, 1e-9) or bl < 0.03:
                                    d = pt - c_a
                                    nd = float(np.linalg.norm(d))
                                    if nd < 1e-9:
                                        continue
                                    hp_inf = np.concatenate([d / nd, [1e-3]])
                                    estimator.add_landmark(
                                        lm_id,
                                        hp_inf / np.linalg.norm(hp_inf),
                                        initialized=False,
                                    )
                                else:
                                    estimator.add_landmark(
                                        lm_id, pt, initialized=False
                                    )
                            else:
                                estimator.add_landmark(
                                    lm_id, hp[:3] / w, initialized=True
                                )
                        except RuntimeError:
                            break  # landmark table full
                        ok1 = estimator.add_observation(
                            lm_id, src.id, cam, uva[ia], keypoint_idx=int(ia),
                            size=fa.keypoint_size(int(ia)),
                        )
                        ok2 = ok1 and estimator.add_observation(
                            lm_id, frame_b.id, cam, uv_b_np[ib], keypoint_idx=ib,
                            size=fb.keypoint_size(ib),
                        )
                        if not ok2:
                            # observation table full: roll back the half-added
                            # landmark so bookkeeping matches the factor graph
                            estimator._remove_landmark(lm_id)
                            break
                        fa.landmark_ids[ia] = lm_id
                        frame_b.set_landmark_id(cam, ib, lm_id)

                # ---- apply the folded 3D-2D RANSAC's outlier removals over
                # this round's candidates AND pre-existing associations,
                # gated on >=10 rig inliers (ref runRansac3d2d removeOutliers,
                # Frontend.cpp:613-640). Idempotent: re-running after phase 2
                # only touches newly bound keypoints. ----
                if apply_rs and int(rs_num[cam]) >= 10:
                    cand = assign3_all[:, cam]
                    targets = set(np.unique(cand[cand >= 0]).tolist())
                    targets.update(np.nonzero(sel_prev[cam])[0].tolist())
                    outl = ~rs_inliers[cam]
                    for ib in sorted(targets):
                        ib = int(ib)
                        if not outl[ib]:
                            continue
                        lm_id = int(fb.landmark_ids[ib])
                        if lm_id == 0:
                            continue  # host never resolved this candidate
                        if lm_id != int(dev_lm[cam, ib]):
                            # host resolution bound a different landmark than
                            # the one the device RANSAC scored — the verdict
                            # does not apply; keep the association (ADVICE r1)
                            continue
                        if estimator.is_landmark_added(lm_id):
                            estimator.remove_observation(
                                lm_id, frame_b.id, cam, ib
                            )
                        frame_b.set_landmark_id(cam, ib, 0)

        t_res0 = time.perf_counter()
        t_res0_cpu = time.thread_time()
        resolve_phase(0, n_primary, apply_ransac)
        decision = None
        t_cb = t_cb_cpu = 0.0
        if phase_callback is not None:
            t_cb0 = time.perf_counter()
            t_cb0_cpu = time.thread_time()
            decision = phase_callback()
            t_cb = time.perf_counter() - t_cb0
            t_cb_cpu = time.thread_time() - t_cb0_cpu
        if n_primary < P:
            resolve_phase(n_primary, P, apply_ransac)
        # pure-host resolution cost: exclude the (rare) loser-recovery device
        # launch and the keyframe-decision callback, reported on their own
        Timing.add(
            "host: assoc resolve",
            time.perf_counter() - t_res0 - nonlocal_t["recovery"] - t_cb,
        )
        # thread CPU time isolates our work from GIL/scheduler contention with
        # concurrent device threads (recovery launch + callback subtracted)
        Timing.add(
            "host: assoc resolve (cpu)",
            time.thread_time() - t_res0_cpu
            - nonlocal_t["recovery_cpu"] - t_cb_cpu,
        )
        if nonlocal_t["recovery"]:
            Timing.add("assoc recovery launch", nonlocal_t["recovery"])
        return n3d_primary, decision

    # ------------------------------------------------------------------
    def _frame_T_WC(self, estimator, state_or_T, cam: int) -> kin.SE3:
        T_SC = estimator.get_extrinsics(cam)
        if isinstance(state_or_T, kin.SE3):
            return kin.compose(state_or_T, T_SC)
        return kin.compose(estimator.get_T_WS(state_or_T), T_SC)

    def _stereo_pairs(self, C: int):
        return tuple(
            (ca, cb)
            for ca in range(C)
            for cb in range(ca + 1, C)
            if self.rig.overlaps is None or self.rig.has_overlap(ca, cb)
        )

    def _match_stereo(self, estimator, multiframe, T_WS):
        """Intra-multiframe matching across overlapping camera pairs
        (Frontend.cpp:521-572). Matching AND triangulation of every match
        run in one launch per pair (kernels.stereo_match_triangulate); the
        host only resolves conflicts and creates landmarks. Used when no
        keyframe-association launch carried the fused stereo phase (first
        frame, mixed-spec rigs)."""
        for ca, cb in self._stereo_pairs(multiframe.num_cameras):
            fa, fb = multiframe.frames[ca], multiframe.frames[cb]
            free_a = fa.mask_np & (fa.landmark_ids == 0)
            free_b = fb.mask_np & (fb.landmark_ids == 0)
            if not free_a.any() or not free_b.any():
                continue
            T_WC_a = kin.compose(T_WS, estimator.get_extrinsics(ca))
            T_WC_b = kin.compose(T_WS, estimator.get_extrinsics(cb))
            K = self.cfg.max_keypoints

            def kp_std(f):
                s = 0.8 / 12.0 * (
                    np.asarray(f.sizes)[:K] if f.sizes is not None
                    else np.full(K, 8.0)
                )
                if self.cfg.gate_extra_px > 0.0:
                    s = np.sqrt(s**2 + self.cfg.gate_extra_px**2)
                return s

            from ..utils import syncstats

            syncstats.bump("stereo_standalone")
            assign, hp, valid, par, can_init = jax.device_get(
                kernels.stereo_match_triangulate(
                    self.rig.specs[ca],
                    self.rig.specs[cb],
                    estimator.intrinsics[ca],
                    estimator.intrinsics[cb],
                    fa.descriptors,
                    fb.descriptors,
                    jnp.asarray(free_a),
                    jnp.asarray(free_b),
                    fa.keypoints.uv,
                    fb.keypoints.uv,
                    T_WC_a,
                    T_WC_b,
                    jnp.asarray(kp_std(fa)),
                    jnp.asarray(kp_std(fb)),
                    threshold=self.cfg.matching_threshold,
                )
            )
            self._resolve_stereo_pair(
                estimator, multiframe, ca, cb, assign, hp, valid, par, can_init
            )

    def _resolve_stereo_pair(
        self, estimator, multiframe, ca, cb, assign, hp_arr, valid, par,
        can_init,
    ):
        """Create landmarks from a stereo match+triangulation result,
        dropping pairs whose keypoints were claimed since (ref setBestMatch
        2D-2D path semantics)."""
        fa, fb = multiframe.frames[ca], multiframe.frames[cb]
        uva_np = fa.uv_np
        uvb_np = fb.uv_np
        for ia in np.nonzero((assign >= 0) & valid)[0]:
            ib = int(assign[ia])
            ia = int(ia)
            if fa.landmark_ids[ia] != 0 or fb.landmark_ids[ib] != 0:
                continue
            w = hp_arr[ia, 3]
            lm_id = IdProvider.new_id()
            try:
                if par[ia] or abs(w) < 1e-6:
                    # parallel rays: point at infinity (w≈1e-3), kept as an
                    # uninitialized landmark constraining rotation only
                    # (ref triangulateFast parallel path)
                    estimator.add_landmark(lm_id, hp_arr[ia], initialized=False)
                else:
                    estimator.add_landmark(
                        lm_id, hp_arr[ia, :3] / w,
                        initialized=bool(can_init[ia]),
                    )
            except RuntimeError:
                break  # landmark table full
            ok1 = estimator.add_observation(
                lm_id, multiframe.id, ca, uva_np[ia], keypoint_idx=ia,
                size=fa.keypoint_size(ia),
            )
            ok2 = ok1 and estimator.add_observation(
                lm_id, multiframe.id, cb, uvb_np[ib], keypoint_idx=ib,
                size=fb.keypoint_size(ib),
            )
            if not ok2:
                estimator._remove_landmark(lm_id)
                break
            multiframe.set_landmark_id(ca, ia, lm_id)
            multiframe.set_landmark_id(cb, ib, lm_id)

    # ------------------------------------------------------------------
    def _ransac_2d2d(
        self,
        estimator,
        frame_a: MultiFrame,
        frame_b: MultiFrame,
        initialize_pose: bool,
        remove_outliers: bool,
    ) -> bool:
        """Rotation-only vs relative-pose RANSAC over shared-landmark
        correspondences between an older frame A and the current frame B
        (ref runRansac2d2d, Frontend.cpp:645-810). Returns rotationOnly."""
        from .ransac import decompose_essential

        rotation_only_out = True
        for cam in range(frame_b.num_cameras):
            fa, fb = frame_a.frames[cam], frame_b.frames[cam]
            # correspondences: keypoints sharing a landmark id
            lm_to_a = {
                int(l): i for i, l in enumerate(fa.landmark_ids) if l != 0
            }
            pairs = [
                (lm_to_a[int(l)], i)
                for i, l in enumerate(fb.landmark_ids)
                if l != 0 and int(l) in lm_to_a
            ]
            if len(pairs) < 10:
                continue
            K = self.cfg.max_keypoints
            uv_a = np.zeros((K, 2))
            uv_b = np.zeros((K, 2))
            mask = np.zeros(K, bool)
            for j, (ia, ib) in enumerate(pairs[:K]):
                uv_a[j] = fa.uv_np[ia]
                uv_b[j] = fb.uv_np[ib]
                mask[j] = True
            spec = self.rig.specs[cam]
            intr = estimator.intrinsics[cam]
            focal = float(intr[0])
            n_corr = len(pairs[:K])

            # one launch: back-project both frames + rotation-only AND
            # relative-pose RANSAC (same key order as the sequential calls)
            from ..utils import syncstats

            syncstats.bump("ransac2d2d")
            rot, rel, bear_a, bear_b = kernels.ransac_2d2d_px(
                self._next_key(), self._next_key(), spec, intr,
                jnp.asarray(uv_a), jnp.asarray(uv_b), jnp.asarray(mask),
                focal, self.cfg.ransac_threshold_px2,
            )
            if n_corr <= self.cfg.fivepoint_max_corr:
                # low overlap: the reference's Stewenius 5-point minimal
                # solver (host — init-time cold path) competes with the
                # batched 8-point model; more inliers wins
                from .fivepoint import ransac_relative_pose_5pt
                from .ransac import RansacResult

                inl5, n5, E5, ok5 = ransac_relative_pose_5pt(
                    np.asarray(bear_a), np.asarray(bear_b), mask,
                    focal=focal,
                    threshold_px2=self.cfg.ransac_threshold_px2,
                    n_iters=50,
                    seed=int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1)),
                )
                if n5 > int(rel.num_inliers):
                    rel = RansacResult(
                        inliers=inl5, num_inliers=n5,
                        model=jnp.asarray(E5.ravel()), success=ok5,
                    )

            rot_ratio = int(rot.num_inliers) / n_corr
            rel_ratio = int(rel.num_inliers) / n_corr

            # decision (Frontend.cpp:712-731)
            if rot_ratio > rel_ratio or rot_ratio > 0.8:
                rotation_only_cam = True
                inliers = np.asarray(rot.inliers)
                success = int(rot.num_inliers) > 10
            else:
                rotation_only_cam = False
                inliers = np.asarray(rel.inliers)
                success = int(rel.num_inliers) > 10
            if not success:
                continue
            rotation_only_out = rotation_only_out and rotation_only_cam

            if remove_outliers:
                for j, (ia, ib) in enumerate(pairs[:K]):
                    if not inliers[j]:
                        lm_id = int(fb.landmark_ids[ib])
                        frame_b.set_landmark_id(cam, ib, 0)
                        if lm_id and estimator.is_landmark_added(lm_id):
                            estimator.remove_observation(
                                lm_id, frame_b.id, cam, ib
                            )

            # pose initialization from the relative model (Frontend.cpp:756-807)
            if initialize_pose and not self.is_initialized and not rotation_only_cam:
                E = jnp.asarray(rel.model).reshape(3, 3)
                R_ab, t_ab = decompose_essential(E, bear_a, bear_b, rel.inliers)
                T_SC = estimator.get_extrinsics(cam)
                T_WS_a = estimator.get_T_WS(frame_a.id)
                T_WS_b = estimator.get_T_WS(frame_b.id)
                # scale the unit translation by projecting the IMU-predicted
                # relative translation onto it (Frontend.cpp:783-797)
                T_CaCb_pred = kin.compose(
                    kin.inverse(kin.compose(T_WS_a, T_SC)),
                    kin.compose(T_WS_b, T_SC),
                )
                scale = max(0.0, float(jnp.dot(t_ab, T_CaCb_pred.r)))
                T_CaCb = kin.SE3(r=t_ab * scale, q=kin.matrix_to_quat(R_ab))
                T_WS_new = kin.compose(
                    kin.compose(kin.compose(T_WS_a, T_SC), T_CaCb),
                    kin.inverse(T_SC),
                )
                estimator.set_T_WS(frame_b.id, T_WS_new)
        return rotation_only_out

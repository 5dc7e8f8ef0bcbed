"""Pose-graph manager: odometry edges, loop detection, correction, culling.

Orchestrates the pose-graph layer (BASELINE.json new capability — the
reference release has none, SURVEY.md §6). Flow per keyframe:

1. add a node at the drift-corrected VIO pose and an odometry edge carrying
   the VIO relative transform (locally drift-free),
2. retrieve loop candidates (place_recognition.py: one MXU matmul),
3. geometrically verify (loop_closure.py: matching + 3D-2D RANSAC in one
   XLA program),
4. on a confirmed loop: add the loop edge, run the jitted pose-graph solver
   (optimize.py), and update the world correction
   ``T_corr = T_opt_latest * T_vio_latest^-1`` that maps live VIO output
   into the loop-consistent frame,
5. optional redundant-keyframe culling keeps the graph bounded (edge
   composition through removed nodes, graph.py).

All device work is fixed-shape; the manager is host bookkeeping only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..kinematics import np_se3
from . import loop_closure as lc
from .graph import PoseGraph
from .place_recognition import KeyframeDatabase

Pose = Tuple[np.ndarray, np.ndarray]


@dataclass
class PoseGraphConfig:
    # retrieval
    score_threshold: float = 0.22
    vote_threshold: int = 60
    min_gap: int = 10  # exclude this many most-recent keyframes
    # verification
    match_threshold: int = 60
    min_inliers: int = 20
    focal: float = 460.0
    # odometry edge noise (per meter-ish step; VIO relative poses are stiff)
    odom_sigma_t: float = 0.01
    odom_sigma_r: float = 0.003
    # solver
    max_iterations: int = 10
    # pcg_iters/pcg_tol apply only when the resolved solver is "pcg" — with
    # solver="auto" and node_capacity <= 341 the dense path ignores them
    pcg_iters: int = 60
    solver: str = "auto"  # "dense" | "pcg" | "auto" (dense when 6N <= 2048)
    # culling
    cull_min_translation: float = 0.05
    cull_min_rotation: float = 0.05
    # capacities
    node_capacity: int = 256
    edge_capacity: int = 512
    db_kp_capacity: int = 512
    desc_words: int = 64  # descriptor packing (16 x uint32 in the pipeline)
    desc_dtype: type = None  # defaults to uint8; pipeline passes uint32
    seed: int = 7


@dataclass
class LoopEvent:
    query_id: int
    candidate_id: int
    score: float
    num_inliers: int
    accepted: bool


class PoseGraphManager:
    def __init__(self, config: Optional[PoseGraphConfig] = None,
                 T_SC: Optional[Pose] = None):
        self.cfg = config or PoseGraphConfig()
        self.graph = PoseGraph(self.cfg.node_capacity, self.cfg.edge_capacity)
        self.db = KeyframeDatabase(self.cfg.node_capacity,
                                   self.cfg.db_kp_capacity,
                                   desc_words=self.cfg.desc_words,
                                   desc_dtype=self.cfg.desc_dtype or np.uint8)
        self.T_SC: Pose = T_SC if T_SC is not None else (
            np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
        self.prev_kf_id: Optional[int] = None
        self.prev_vio_pose: Optional[Pose] = None
        self.vio_pose_of: Dict[int, Pose] = {}
        self.timestamps: Dict[int, int] = {}
        self.insert_order: List[int] = []
        # accumulated world correction T_Wcorr <- T_Wvio
        self.corr_r = np.zeros(3)
        self.corr_q = np.array([0.0, 0.0, 0.0, 1.0])
        self.loop_events: List[LoopEvent] = []
        self._key = jax.random.PRNGKey(self.cfg.seed)

    # ------------------------------------------------------------------ api
    def correction(self) -> Pose:
        """Current T_corr: corrected = T_corr * vio."""
        return self.corr_r.copy(), self.corr_q.copy()

    def apply_correction(self, r_vio: np.ndarray, q_vio: np.ndarray) -> Pose:
        return np_se3.compose(self.corr_r, self.corr_q, r_vio, q_vio)

    def add_keyframe(
        self,
        kf_id: int,
        timestamp_ns: int,
        r_WS_vio: np.ndarray,
        q_WS_vio: np.ndarray,
        descriptors: np.ndarray,  # (K, 64) uint8
        desc_mask: np.ndarray,  # (K,) bool
        bearings_C: np.ndarray,  # (K, 3) unit bearings, camera frame
        landmarks_W: np.ndarray,  # (K, 3) landmark positions (VIO world)
        lm_valid: np.ndarray,  # (K,) bool
    ) -> Optional[LoopEvent]:
        """Insert a keyframe; returns a LoopEvent when a loop was closed."""
        cfg = self.cfg
        r_vio = np.asarray(r_WS_vio, np.float64)
        q_vio = np.asarray(q_WS_vio, np.float64)
        self.vio_pose_of[kf_id] = (r_vio.copy(), q_vio.copy())
        self.timestamps[kf_id] = timestamp_ns

        # node at corrected pose; first node fixed (gauge)
        r0, q0 = self.apply_correction(r_vio, q_vio)
        first = self.graph.n_nodes == 0
        self.graph.add_node(kf_id, r0, q0, fixed=first)

        # odometry edge from VIO relative pose
        if self.prev_kf_id is not None:
            rp, qp = self.prev_vio_pose
            t_ij, q_ij = np_se3.relative(rp, qp, r_vio, q_vio)
            w = np.concatenate([np.full(3, 1.0 / cfg.odom_sigma_t),
                                np.full(3, 1.0 / cfg.odom_sigma_r)])
            self.graph.add_edge(self.prev_kf_id, kf_id, t_ij, q_ij,
                                np.diag(w), kind=0)

        event = self._detect_and_close_loop(
            kf_id, descriptors, desc_mask, bearings_C)

        # insert into retrieval database (geometry kept in VIO world so
        # RANSAC stays consistent with stored landmark coordinates)
        self.db.insert(kf_id, descriptors, desc_mask, bearings_C,
                       landmarks_W, lm_valid)
        self.insert_order.append(kf_id)
        self.prev_kf_id = kf_id
        self.prev_vio_pose = (r_vio.copy(), q_vio.copy())
        return event

    # ------------------------------------------------------- loop pipeline
    def _detect_and_close_loop(self, kf_id: int, desc: np.ndarray,
                               mask: np.ndarray,
                               bearings_C: np.ndarray) -> Optional[LoopEvent]:
        cfg = self.cfg
        exclude = set(self.insert_order[-cfg.min_gap:])
        cand_id, score, _ = self.db.query(desc, mask, exclude,
                                          vote_threshold=cfg.vote_threshold)
        if cand_id is None or score < cfg.score_threshold:
            return None

        desc_c, _, _, lms_W, lm_valid = self.db.geometry_of(cand_id)
        import jax.numpy as jnp
        self._key, sub = jax.random.split(self._key)
        # pad the query side to the db keypoint capacity: one fixed-shape
        # XLA program for every verification call
        kp_cap = self.db.kp_cap
        kq = min(len(desc), bearings_C.shape[0], kp_cap)
        dq = np.zeros((kp_cap, desc.shape[1]), desc.dtype)
        mq = np.zeros(kp_cap, bool)
        bq = np.zeros((kp_cap, 3), np.float64)
        dq[:kq] = desc[:kq]
        mq[:kq] = mask[:kq]
        bq[:kq] = bearings_C[:kq]
        ver = lc.verify_loop_candidate(
            sub,
            jnp.asarray(desc_c), jnp.asarray(lm_valid),
            jnp.asarray(np.asarray(lms_W, np.float64)),
            jnp.asarray(dq), jnp.asarray(mq), jnp.asarray(bq),
            focal=cfg.focal, match_threshold=cfg.match_threshold,
            min_inliers=cfg.min_inliers)
        event = LoopEvent(query_id=kf_id, candidate_id=cand_id, score=score,
                          num_inliers=int(ver.num_inliers),
                          accepted=bool(ver.success))
        self.loop_events.append(event)
        if not event.accepted:
            return event

        rel = lc.relative_pose_from_verification(
            ver, self.vio_pose_of[cand_id], self.T_SC)
        sq = lc.loop_edge_sqrt_info(event.num_inliers)
        self.graph.add_edge(cand_id, kf_id, rel[0], rel[1], sq, kind=1)
        self._optimize_and_update_correction(kf_id)
        return event

    def _optimize_and_update_correction(self, latest_id: int) -> None:
        self.graph.optimize(max_iterations=self.cfg.max_iterations,
                            pcg_iters=self.cfg.pcg_iters,
                            solver=self.cfg.solver)
        r_opt, q_opt = self.graph.get_pose(latest_id)
        r_vio, q_vio = self.vio_pose_of[latest_id]
        r_inv, q_inv = np_se3.inverse(r_vio, q_vio)
        self.corr_r, self.corr_q = np_se3.compose(r_opt, q_opt, r_inv, q_inv)

    # ------------------------------------------------------------- culling
    def cull_redundant(self) -> List[int]:
        """Remove keyframes whose odometry step is below the motion floor.

        A node is redundant when it has exactly two odometry links, no loop
        edge, and both relative motions are tiny — the classic stationary /
        slow-motion case. Composed edges keep the chain connected.
        """
        cfg = self.cfg
        culled = []
        for kf_id in list(self.graph.slot_of.keys()):
            s = self.graph.slot_of[kf_id]
            if self.graph.fixed[s]:
                continue
            edges = self.graph.edges_of(kf_id)
            if len(edges) != 2:
                continue
            if any(self.graph.edge_kind[e] == 1 for e in edges):
                continue
            small = True
            for e in edges:
                t = np.linalg.norm(self.graph.meas_r[e])
                ang = 2.0 * np.arccos(
                    np.clip(abs(self.graph.meas_q[e][3]), -1.0, 1.0))
                if t > cfg.cull_min_translation or ang > cfg.cull_min_rotation:
                    small = False
                    break
            if not small:
                continue
            self.graph.remove_node(kf_id)
            self.db.remove(kf_id)
            if kf_id in self.insert_order:
                self.insert_order.remove(kf_id)
            culled.append(kf_id)
        return culled

    # ---------------------------------------------------------- trajectory
    def trajectory(self) -> List[Tuple[int, int, np.ndarray, np.ndarray]]:
        """(kf_id, timestamp_ns, r, q) for all live nodes, in insert order."""
        out = []
        for kf_id in self.insert_order:
            if self.graph.has_node(kf_id):
                r, q = self.graph.get_pose(kf_id)
                out.append((kf_id, self.timestamps[kf_id], r, q))
        return out

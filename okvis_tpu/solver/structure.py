"""Fixed-shape problem structure for the sliding-window bundle adjustment.

This replaces the reference's ceres::Problem + okvis::ceres::Map mutable graph
(/root/reference/okvis_ceres/include/okvis/ceres/Map.hpp:63) with a static,
masked SoA layout: the whole window is one pytree of fixed-capacity arrays, so
every optimize step is a single retrace-free jitted XLA program. Dynamic
bookkeeping (which slot belongs to which frame/landmark id) lives on the host
in the estimator, mirroring ceres::Map's id↔block maps.

Minimal-coordinate layout of the dense parameter vector (dimension D):
    state i   : [δp δα]      at i*15 .. i*15+6
                [δv δbg δba] at i*15+6 .. (i+1)*15
    camera c  : [δp δα]_SC   at S*15 + c*6      (online extrinsics calib,
                                                 one block shared by all states)
    per-state extrinsics (temporal calibration, extrinsics_per_state=True —
    ref per-state T_SCi blocks, Estimator.cpp:199-218):
    (i, c)    : [δp δα]_SC   at S*15 + C*6 + (i*C + c)*6
    D = S*15 + C*6 (+ S*C*6 when per-state)

Landmarks are L slots of 3 minimal dims (Euclidean perturbation of the
homogeneous point's first three components, matching the reference
HomogeneousPointLocalParameterization).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..cameras.pinhole import CameraSpec
from ..imu.preintegration import PreintegratedImu
from ..kinematics.se3 import SE3


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    """Static capacities + solver options (drives jit specialization).

    Defaults follow the EuRoC reference config
    (/root/reference/config/config_fpga_p2_euroc.yaml:55-62): window of
    5 keyframes + 3 IMU frames, 3..10 LM iterations.
    """

    num_states: int = 8  # S: window capacity (numKeyframes + numImuFrames)
    num_cameras: int = 2  # C
    max_landmarks: int = 512  # L
    max_observations: int = 2048  # O
    imu_samples: int = 32  # P: IMU samples per link window
    max_imu_links: int = 7  # S-1
    max_pose_priors: int = 2
    max_sb_priors: int = 2
    camera_specs: Tuple[CameraSpec, ...] = ()
    estimate_extrinsics: bool = False
    # temporally varying extrinsics: one T_SC block per (state, camera),
    # consecutive blocks linked by RelativePoseError drift factors
    # (ref Estimator.cpp:199-218, 306-340; enabled when both
    # sigma_c_relative_* > 0). Implies estimate_extrinsics semantics for the
    # per-state blocks; the shared C*6 block is then masked out.
    extrinsics_per_state: bool = False
    sigma_c_relative_translation: float = 0.0  # drift densities [m/sqrt(s)],
    sigma_c_relative_orientation: float = 0.0  # [rad/sqrt(s)] (Parameters.hpp:60-80)
    # absolute extrinsics prior sigmas (first-frame PoseError on T_SC when
    # both > 0, Estimator.cpp:287-307; ~0 in per-state mode sets the first
    # block quasi-constant via a stiff gauge prior). Only consumed by the
    # per-state path; shared-block calibration uses add_extrinsics_prior().
    sigma_absolute_translation: float = 0.0
    sigma_absolute_orientation: float = 0.0
    max_iterations: int = 10
    min_iterations: int = 3
    cauchy_scale: float = 1.0  # reference uses CauchyLoss(1)
    init_lambda: float = 1e-4
    algorithm: str = "lm"  # 'lm' | 'dogleg' (reference runs Ceres DOGLEG)
    init_radius: float = 1e4  # dogleg initial trust-region radius
    dense_solver: str = "newton"  # 'newton' (MXU Newton-Schulz) | 'cholesky'
    # Capacity-tiered optimize: the memory-bound assembly cost is
    # proportional to the PADDED capacities, not the active counts, so the
    # estimator compacts the live problem into the smallest precompiled
    # (L/d, O/d) program that fits (measured 1.96x faster at d=4 on the
    # same active problem, v5e). Identical math — padding rows are masked.
    capacity_tiers: bool = True
    tier_divisors: Tuple[int, ...] = (4, 2)

    @property
    def dense_dim(self) -> int:
        d = self.num_states * 15 + self.num_cameras * 6
        if self.extrinsics_per_state:
            d += self.num_states * self.num_cameras * 6
        return d

    @property
    def ext_link_capacity(self) -> int:
        """Relative-extrinsics drift links: one per (IMU link, camera)."""
        return max(1, self.max_imu_links * self.num_cameras)

    def state_offset(self, i: int) -> int:
        return i * 15

    def ext_offset(self, c: int) -> int:
        return self.num_states * 15 + c * 6

    def ext_ps_offset(self, i: int, c: int) -> int:
        """Dense offset of state i's camera-c extrinsics block (per-state)."""
        return (
            self.num_states * 15
            + self.num_cameras * 6
            + (i * self.num_cameras + c) * 6
        )


class WindowStates(NamedTuple):
    """Optimizable window variables (the pytree the solver updates)."""

    r_WS: jnp.ndarray  # (S, 3)
    q_WS: jnp.ndarray  # (S, 4)
    speed_and_bias: jnp.ndarray  # (S, 9)
    r_SC: jnp.ndarray  # (C, 3)
    q_SC: jnp.ndarray  # (C, 4)
    hp_W: jnp.ndarray  # (L, 4)
    # per-state extrinsics (used only when cfg.extrinsics_per_state)
    r_SC_t: jnp.ndarray = None  # (S, C, 3)
    q_SC_t: jnp.ndarray = None  # (S, C, 4)

    def pose(self, i) -> SE3:
        return SE3(r=self.r_WS[i], q=self.q_WS[i])

    def extrinsics(self, c) -> SE3:
        return SE3(r=self.r_SC[c], q=self.q_SC[c])


class Observations(NamedTuple):
    """Padded reprojection-factor table."""

    state_idx: jnp.ndarray  # (O,) int32 — window slot
    cam_idx: jnp.ndarray  # (O,) int32
    lm_idx: jnp.ndarray  # (O,) int32 — landmark slot
    keypoint: jnp.ndarray  # (O, 2)
    sqrt_info: jnp.ndarray  # (O,) isotropic weight (ref: 8/keypoint_size? see estimator)
    mask: jnp.ndarray  # (O,) bool


class ImuLinks(NamedTuple):
    """Padded IMU-factor table: preintegrated increments between state slots."""

    pre: PreintegratedImu  # batched (K, ...)
    idx_a: jnp.ndarray  # (K,) int32
    idx_b: jnp.ndarray  # (K,) int32
    mask: jnp.ndarray  # (K,) bool


class ExtLinks(NamedTuple):
    """Padded relative-extrinsics drift factors between consecutive states'
    per-state T_SC blocks (ref RelativePoseError links with variance
    sigma_c²·dt, Estimator.cpp:306-340)."""

    idx_a: jnp.ndarray  # (Ke,) int32 — older state's window slot
    idx_b: jnp.ndarray  # (Ke,) int32 — newer state's window slot
    cam: jnp.ndarray  # (Ke,) int32
    sqrt_info: jnp.ndarray  # (Ke, 6, 6)
    mask: jnp.ndarray  # (Ke,) bool


class PosePriors(NamedTuple):
    state_idx: jnp.ndarray  # (Kp,) int32
    r_meas: jnp.ndarray  # (Kp, 3)
    q_meas: jnp.ndarray  # (Kp, 4)
    sqrt_info: jnp.ndarray  # (Kp, 6, 6)
    mask: jnp.ndarray  # (Kp,)


class SbPriors(NamedTuple):
    state_idx: jnp.ndarray  # (Ks,) int32
    sb_meas: jnp.ndarray  # (Ks, 9)
    sqrt_info: jnp.ndarray  # (Ks, 9, 9)
    mask: jnp.ndarray  # (Ks,)


class MargPrior(NamedTuple):
    """Dense marginalization prior ½|e0 + J Δχ|² in (H=JᵀJ, b=-Jᵀe0, c0=|e0|²)
    form over the dense parameter vector, with per-state FEJ linearization
    points (reference MarginalizationError keeps an explicit J via
    eigendecomposition; GN only needs H/b/c0 — same information)."""

    H: jnp.ndarray  # (D, D)
    b0: jnp.ndarray  # (D,)  — -Jᵀe0
    c0: jnp.ndarray  # scalar |e0|²
    # FEJ linearization points (only entries covered by H matter)
    r_WS_lin: jnp.ndarray  # (S, 3)
    q_WS_lin: jnp.ndarray  # (S, 4)
    sb_lin: jnp.ndarray  # (S, 9)
    r_SC_lin: jnp.ndarray  # (C, 3)
    q_SC_lin: jnp.ndarray  # (C, 4)
    valid: jnp.ndarray  # scalar bool
    # per-state extrinsics FEJ points (only when cfg.extrinsics_per_state)
    r_SC_t_lin: jnp.ndarray = None  # (S, C, 3)
    q_SC_t_lin: jnp.ndarray = None  # (S, C, 4)


class BaProblem(NamedTuple):
    """Everything one optimize() call needs, fully padded."""

    states: WindowStates
    state_mask: jnp.ndarray  # (S,) bool
    sb_mask: jnp.ndarray  # (S,) bool — False once speed/bias was marginalized
    # (old keyframes keep only their pose as free dims, Estimator.cpp:483-520)
    lm_mask: jnp.ndarray  # (L,) bool
    obs: Observations
    imu_links: ImuLinks
    pose_priors: PosePriors
    sb_priors: SbPriors
    marg: MargPrior
    ext_links: ExtLinks = None  # only when cfg.extrinsics_per_state


def empty_problem(cfg: WindowConfig, dtype=None) -> BaProblem:
    """Allocate an all-masked-out problem (identity quaternions everywhere).

    `dtype=None` follows the runtime x64 setting (f64 under
    `jax_enable_x64`, f32 otherwise) so default allocations never trigger
    XLA truncation warnings on f32-only backends."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    S, C, L, O = cfg.num_states, cfg.num_cameras, cfg.max_landmarks, cfg.max_observations
    K = cfg.max_imu_links
    D = cfg.dense_dim
    qid = jnp.zeros((1, 4), dtype).at[:, 3].set(1.0)

    def q_of(n):
        return jnp.tile(qid, (n, 1))

    per_state = cfg.extrinsics_per_state
    states = WindowStates(
        r_WS=jnp.zeros((S, 3), dtype),
        q_WS=q_of(S),
        speed_and_bias=jnp.zeros((S, 9), dtype),
        r_SC=jnp.zeros((C, 3), dtype),
        q_SC=q_of(C),
        hp_W=jnp.zeros((L, 4), dtype).at[:, 3].set(1.0),
        r_SC_t=jnp.zeros((S, C, 3), dtype) if per_state else None,
        q_SC_t=jnp.tile(qid[None], (S, C, 1)) if per_state else None,
    )
    P = cfg.imu_samples
    pre = PreintegratedImu(
        delta_q=q_of(K),
        C_integral=jnp.zeros((K, 3, 3), dtype),
        C_doubleintegral=jnp.zeros((K, 3, 3), dtype),
        acc_integral=jnp.zeros((K, 3), dtype),
        acc_doubleintegral=jnp.zeros((K, 3), dtype),
        dalpha_db_g=jnp.zeros((K, 3, 3), dtype),
        dv_db_g=jnp.zeros((K, 3, 3), dtype),
        dp_db_g=jnp.zeros((K, 3, 3), dtype),
        P_delta=jnp.tile(jnp.eye(15, dtype=dtype)[None], (K, 1, 1)),
        sqrt_info=jnp.tile(jnp.eye(15, dtype=dtype)[None], (K, 1, 1)),
        delta_t=jnp.zeros((K,), dtype),
        sb_ref=jnp.zeros((K, 9), dtype),
    )
    return BaProblem(
        states=states,
        state_mask=jnp.zeros((S,), bool),
        sb_mask=jnp.ones((S,), bool),
        lm_mask=jnp.zeros((L,), bool),
        obs=Observations(
            state_idx=jnp.zeros((O,), jnp.int32),
            cam_idx=jnp.zeros((O,), jnp.int32),
            lm_idx=jnp.zeros((O,), jnp.int32),
            keypoint=jnp.zeros((O, 2), dtype),
            sqrt_info=jnp.ones((O,), dtype),
            mask=jnp.zeros((O,), bool),
        ),
        imu_links=ImuLinks(
            pre=pre,
            idx_a=jnp.zeros((K,), jnp.int32),
            idx_b=jnp.ones((K,), jnp.int32),
            mask=jnp.zeros((K,), bool),
        ),
        pose_priors=PosePriors(
            state_idx=jnp.zeros((cfg.max_pose_priors,), jnp.int32),
            r_meas=jnp.zeros((cfg.max_pose_priors, 3), dtype),
            q_meas=q_of(cfg.max_pose_priors),
            sqrt_info=jnp.zeros((cfg.max_pose_priors, 6, 6), dtype),
            mask=jnp.zeros((cfg.max_pose_priors,), bool),
        ),
        sb_priors=SbPriors(
            state_idx=jnp.zeros((cfg.max_sb_priors,), jnp.int32),
            sb_meas=jnp.zeros((cfg.max_sb_priors, 9), dtype),
            sqrt_info=jnp.zeros((cfg.max_sb_priors, 9, 9), dtype),
            mask=jnp.zeros((cfg.max_sb_priors,), bool),
        ),
        marg=MargPrior(
            H=jnp.zeros((D, D), dtype),
            b0=jnp.zeros((D,), dtype),
            c0=jnp.zeros((), dtype),
            r_WS_lin=jnp.zeros((S, 3), dtype),
            q_WS_lin=q_of(S),
            sb_lin=jnp.zeros((S, 9), dtype),
            r_SC_lin=jnp.zeros((C, 3), dtype),
            q_SC_lin=q_of(C),
            valid=jnp.asarray(False),
            r_SC_t_lin=jnp.zeros((S, C, 3), dtype) if per_state else None,
            q_SC_t_lin=jnp.tile(qid[None], (S, C, 1)) if per_state else None,
        ),
        ext_links=(
            ExtLinks(
                idx_a=jnp.zeros((cfg.ext_link_capacity,), jnp.int32),
                idx_b=jnp.ones((cfg.ext_link_capacity,), jnp.int32),
                cam=jnp.zeros((cfg.ext_link_capacity,), jnp.int32),
                sqrt_info=jnp.zeros((cfg.ext_link_capacity, 6, 6), dtype),
                mask=jnp.zeros((cfg.ext_link_capacity,), bool),
            )
            if per_state
            else None
        ),
    )

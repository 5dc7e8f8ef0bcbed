"""IMU preintegration as a single `jax.lax.scan` over fixed-size padded windows.

TPU-native re-design of the reference preintegration
(/root/reference/okvis_ceres/src/ImuError.cpp:76-284 `redoPreintegration` and
:287-504 `propagation`): the same trapezoidal integration of the orientation
increment, rotation-matrix integrals, bias sub-Jacobians, and 15x15 covariance
— but expressed as one scan over a fixed number of sample intervals with
per-interval masking, so a whole window of factors preintegrates as one
batched XLA program (vmap over factors) with zero host round-trips.

Design notes vs the reference:
- Boundary handling: the reference interpolates the first/last measurement to
  the clipped integration bounds (ImuError.cpp:131-151). Here every interval
  [t_i, t_i+1] is clipped to [t0, t1] and the measurements are linearly
  interpolated at the clipped endpoints — algebraically identical, branch-free.
- Padded slots (timestamps repeated / dt<=0) contribute nothing: every state
  update is masked with jnp.where on `active = dt > 0`.
- Gyro/accel saturation inflates the corresponding noise sigma 100x for that
  interval instead of failing (ImuError.cpp:156-173).
- Timestamps are float seconds relative to a caller-chosen origin (the host
  keeps int64 ns and rebases per factor so f32 stays exact on TPU).

State-error ordering (15): [δp(3), δα(3), δv(3), δb_g(3), δb_a(3)] — matching
the reference covariance block layout.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..kinematics import so3
from ..kinematics.se3 import SE3


class ImuParams(NamedTuple):
    """IMU noise/saturation parameters (ref okvis::ImuParameters,
    /root/reference/okvis_common/include/okvis/Parameters.hpp:100-133)."""

    sigma_g_c: jnp.ndarray  # gyro noise density [rad/s/sqrt(Hz)]
    sigma_a_c: jnp.ndarray  # accel noise density [m/s^2/sqrt(Hz)]
    sigma_gw_c: jnp.ndarray  # gyro drift noise density
    sigma_aw_c: jnp.ndarray  # accel drift noise density
    g: jnp.ndarray  # gravity magnitude [m/s^2]
    g_max: jnp.ndarray  # gyro saturation [rad/s]
    a_max: jnp.ndarray  # accel saturation [m/s^2]
    sigma_bg: jnp.ndarray  # gyro bias prior std (first-frame prior)
    sigma_ba: jnp.ndarray  # accel bias prior std
    a0: jnp.ndarray  # (3,) prior accelerometer bias
    rate: int = 200  # nominal IMU rate [Hz]

    @staticmethod
    def euroc(dtype=None) -> "ImuParams":
        """Values from /root/reference/config/config_fpga_p2_euroc.yaml:34-47.

        dtype=None follows the runtime x64 setting (no truncation warnings
        on f32-only backends)."""
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return ImuParams(
            sigma_g_c=f(12.0e-4),
            sigma_a_c=f(8.0e-3),
            sigma_gw_c=f(4.0e-6),
            sigma_aw_c=f(4.0e-5),
            g=f(9.81007),
            g_max=f(7.8),
            a_max=f(176.0),
            sigma_bg=f(0.03),
            sigma_ba=f(0.1),
            a0=jnp.zeros(3, dtype=dtype),
            rate=200,
        )


class PreintegratedImu(NamedTuple):
    """Preintegrated increment between two states (all quantities in S0 frame).

    Mirrors the member state of the reference ImuError after
    redoPreintegration (ImuError.cpp:90-105 + 272-283)."""

    delta_q: jnp.ndarray  # (4,) xyzw: orientation increment q_S0_S1
    C_integral: jnp.ndarray  # (3,3) ∫C dt
    C_doubleintegral: jnp.ndarray  # (3,3) ∫∫C dt²
    acc_integral: jnp.ndarray  # (3,) ∫C a dt
    acc_doubleintegral: jnp.ndarray  # (3,) ∫∫C a dt²
    dalpha_db_g: jnp.ndarray  # (3,3)
    dv_db_g: jnp.ndarray  # (3,3)
    dp_db_g: jnp.ndarray  # (3,3)
    P_delta: jnp.ndarray  # (15,15) increment covariance
    sqrt_info: jnp.ndarray  # (15,15) upper-tri L^T with L L^T = P_delta^-1
    delta_t: jnp.ndarray  # scalar total integration time
    sb_ref: jnp.ndarray  # (9,) speed-and-bias linearization point


def gravity_vector(params: ImuParams, dtype=None) -> jnp.ndarray:
    """g_W = g * [0,0,1] (ref uses normalize([0,0,6371009]) — the z axis,
    ImuError.cpp:563)."""
    dtype = dtype or params.g.dtype
    return params.g * jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)


def _interval_quantities(ts, gyro, acc, t0, t1):
    """Per-interval clipped dt and boundary-interpolated measurements.

    Given padded samples ts:(P,), gyro/acc:(P,3), produce per-interval
    (P-1,) arrays: dt (clipped to [t0,t1]) and interpolated (w0,w1,a0,a1).
    """
    t_a, t_b = ts[:-1], ts[1:]
    seg0 = jnp.maximum(t_a, t0)
    seg1 = jnp.minimum(t_b, t1)
    dt = jnp.maximum(seg1 - seg0, 0.0)
    span = t_b - t_a
    safe_span = jnp.where(span > 0, span, 1.0)
    f0 = jnp.clip((seg0 - t_a) / safe_span, 0.0, 1.0)[..., None]
    f1 = jnp.clip((seg1 - t_a) / safe_span, 0.0, 1.0)[..., None]
    g_a, g_b = gyro[:-1], gyro[1:]
    a_a, a_b = acc[:-1], acc[1:]
    w0 = (1.0 - f0) * g_a + f0 * g_b
    w1 = (1.0 - f1) * g_a + f1 * g_b
    a0 = (1.0 - f0) * a_a + f0 * a_b
    a1 = (1.0 - f1) * a_a + f1 * a_b
    return dt, w0, w1, a0, a1


def preintegrate(
    params: ImuParams,
    timestamps: jnp.ndarray,  # (P,) float seconds (padded; padding repeats last)
    gyro: jnp.ndarray,  # (P,3)
    acc: jnp.ndarray,  # (P,3)
    t0: jnp.ndarray,  # scalar start time
    t1: jnp.ndarray,  # scalar end time
    sb_ref: jnp.ndarray,  # (9,) speed-and-bias linearization point [v, b_g, b_a]
    mean_only: bool = False,
) -> PreintegratedImu:
    """Single-factor preintegration (vmap over leading axis for a batch).

    mean_only=True (static) skips the bias Jacobians, the 15×15 covariance
    propagation, and the final inverse/Cholesky — those per-step small
    matmuls are ~80% of the scan's sequential device time, and state
    PREDICTION (Estimator.addStates / real-time publishing, which only read
    delta_q and the acc integrals) never consumes them. The skipped fields
    return as zeros; factor evaluation must use the default full mode."""
    dtype = gyro.dtype
    dt_all, w0_all, w1_all, a0_all, a1_all = _interval_quantities(
        timestamps, gyro, acc, t0, t1
    )
    b_g = sb_ref[3:6]
    b_a = sb_ref[6:9]
    eye3 = jnp.eye(3, dtype=dtype)

    class Carry(NamedTuple):
        delta_q: jnp.ndarray
        C_integral: jnp.ndarray
        C_doubleintegral: jnp.ndarray
        acc_integral: jnp.ndarray
        acc_doubleintegral: jnp.ndarray
        cross: jnp.ndarray
        dalpha_db_g: jnp.ndarray
        dv_db_g: jnp.ndarray
        dp_db_g: jnp.ndarray
        P_delta: jnp.ndarray
        delta_t: jnp.ndarray

    init = Carry(
        delta_q=so3.quat_identity(dtype=dtype),
        C_integral=jnp.zeros((3, 3), dtype),
        C_doubleintegral=jnp.zeros((3, 3), dtype),
        acc_integral=jnp.zeros(3, dtype),
        acc_doubleintegral=jnp.zeros(3, dtype),
        cross=jnp.zeros((3, 3), dtype),
        dalpha_db_g=jnp.zeros((3, 3), dtype),
        dv_db_g=jnp.zeros((3, 3), dtype),
        dp_db_g=jnp.zeros((3, 3), dtype),
        P_delta=jnp.zeros((15, 15), dtype),
        delta_t=jnp.zeros((), dtype),
    )

    def step(c: Carry, xs):
        dt, w0, w1, a0, a1 = xs
        active = dt > 0

        omega_true = 0.5 * (w0 + w1) - b_g
        acc_true = 0.5 * (a0 + a1) - b_a

        # orientation increment (trapezoid midpoint, ImuError.cpp:176-186)
        dq = so3.delta_q(omega_true * dt)
        delta_q_1 = so3.quat_multiply(c.delta_q, dq)
        C = so3.quat_to_matrix(c.delta_q)
        C_1 = so3.quat_to_matrix(delta_q_1)
        C_sum = C + C_1
        acc_integral_1 = c.acc_integral + 0.5 * C_sum @ acc_true * dt
        acc_doubleintegral_1 = (
            c.acc_doubleintegral + c.acc_integral * dt + 0.25 * C_sum @ acc_true * dt * dt
        )

        if mean_only:
            # prediction consumes only delta_q + the acc integrals; carry
            # the heavy fields through untouched (selects on constants fuse
            # to nothing)
            new = Carry(
                delta_q=delta_q_1,
                C_integral=c.C_integral,
                C_doubleintegral=c.C_doubleintegral,
                acc_integral=acc_integral_1,
                acc_doubleintegral=acc_doubleintegral_1,
                cross=c.cross,
                dalpha_db_g=c.dalpha_db_g,
                dv_db_g=c.dv_db_g,
                dp_db_g=c.dp_db_g,
                P_delta=c.P_delta,
                delta_t=c.delta_t + dt,
            )
            out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), new, c
            )
            return out, None

        # saturation -> 100x sigma inflation (ImuError.cpp:156-173)
        sat_g = jnp.any(jnp.abs(jnp.stack([w0, w1])) > params.g_max)
        sat_a = jnp.any(jnp.abs(jnp.stack([a0, a1])) > params.a_max)
        sigma_g = jnp.where(sat_g, 100.0 * params.sigma_g_c, params.sigma_g_c)
        sigma_a = jnp.where(sat_a, 100.0 * params.sigma_a_c, params.sigma_a_c)

        C_integral_1 = c.C_integral + 0.5 * C_sum * dt
        C_doubleintegral_1 = c.C_doubleintegral + c.C_integral * dt + 0.25 * C_sum * dt * dt

        # bias sub-Jacobians (ImuError.cpp:189-198)
        Jr = so3.right_jacobian(omega_true * dt)
        dalpha_db_g_1 = c.dalpha_db_g + C_1 @ Jr * dt
        cross_1 = so3.quat_to_matrix(so3.quat_conjugate(dq)) @ c.cross + Jr * dt
        acc_x = so3.cross_matrix(acc_true)
        mix = C @ acc_x @ c.cross + C_1 @ acc_x @ cross_1
        dv_db_g_1 = c.dv_db_g + 0.5 * dt * mix
        dp_db_g_1 = c.dp_db_g + dt * c.dv_db_g + 0.25 * dt * dt * mix

        # covariance propagation (ImuError.cpp:200-241)
        F = jnp.eye(15, dtype=dtype)
        F = F.at[0:3, 3:6].set(
            -so3.cross_matrix(c.acc_integral * dt + 0.25 * C_sum @ acc_true * dt * dt)
        )
        F = F.at[0:3, 6:9].set(eye3 * dt)
        F = F.at[0:3, 9:12].set(dt * c.dv_db_g + 0.25 * dt * dt * mix)
        F = F.at[0:3, 12:15].set(-c.C_integral * dt + 0.25 * C_sum * dt * dt)
        F = F.at[3:6, 9:12].set(-dt * C_1)
        F = F.at[6:9, 3:6].set(-so3.cross_matrix(0.5 * C_sum @ acc_true * dt))
        F = F.at[6:9, 9:12].set(0.5 * dt * mix)
        F = F.at[6:9, 12:15].set(-0.5 * C_sum * dt)
        P_1 = F @ c.P_delta @ F.T
        diag_noise = jnp.concatenate(
            [
                jnp.full(3, 0.5 * dt * dt * dt * sigma_a * sigma_a, dtype),
                jnp.full(3, dt * sigma_g * sigma_g, dtype),
                jnp.full(3, dt * sigma_a * sigma_a, dtype),
                jnp.full(3, dt * params.sigma_gw_c * params.sigma_gw_c, dtype),
                jnp.full(3, dt * params.sigma_aw_c * params.sigma_aw_c, dtype),
            ]
        )
        P_1 = P_1 + jnp.diag(diag_noise)

        new = Carry(
            delta_q=delta_q_1,
            C_integral=C_integral_1,
            C_doubleintegral=C_doubleintegral_1,
            acc_integral=acc_integral_1,
            acc_doubleintegral=acc_doubleintegral_1,
            cross=cross_1,
            dalpha_db_g=dalpha_db_g_1,
            dv_db_g=dv_db_g_1,
            dp_db_g=dp_db_g_1,
            P_delta=P_1,
            delta_t=c.delta_t + dt,
        )
        # masked update for padded/out-of-range intervals
        out = jax.tree_util.tree_map(lambda n, o: jnp.where(active, n, o), new, c)
        return out, None

    # the scan is latency-bound (tiny 3x3/quaternion ops in a sequential
    # dependence chain; per-iteration loop overhead dominates the math) —
    # unrolling lets XLA fuse across steps and cuts the prediction scan
    # ~4x on TPU. Full unroll is only safe in the cheap mean_only mode on
    # short windows: in full mode the per-step 15x15 covariance/Jacobian
    # math makes unconditional unroll compile pathologically (32 samples:
    # 2.8s -> 15.2s; a 200-interval window never finishes), so long or full
    # windows use a bounded unroll factor instead.
    if mean_only:
        # Parallel-prefix formulation — the prediction path consumes only
        # delta_q + the acc integrals, all of which are associative
        # accumulations: the orientation chain is a quaternion prefix
        # product (lax.associative_scan, O(log N) depth instead of an
        # N-step sequential scan), and both integrals become batched
        # matvecs + cumulative sums over the prefix orientations. Same
        # trapezoid algebra as the sequential scan (identical up to float
        # reassociation); padded dt=0 intervals contribute exact identity/
        # zero terms so no masking is needed.
        omega_true = 0.5 * (w0_all + w1_all) - b_g  # (N,3)
        acc_true = 0.5 * (a0_all + a1_all) - b_a
        dts = dt_all[:, None]
        dq = so3.delta_q(omega_true * dts)  # (N,4), dt=0 -> identity
        Q = jax.lax.associative_scan(so3.quat_multiply, dq)  # inclusive
        ident = so3.quat_identity(dtype=dtype)
        P_pre = jnp.concatenate([ident[None], Q[:-1]], axis=0)  # exclusive
        C_pre = so3.quat_to_matrix(P_pre)  # (N,3,3) at interval starts
        C_post = so3.quat_to_matrix(Q)  # (N,3,3) at interval ends
        C_sum = C_pre + C_post
        incr_v = 0.5 * jnp.einsum("nij,nj->ni", C_sum, acc_true) * dts
        prefix_v = jnp.cumsum(incr_v, axis=0) - incr_v  # exclusive
        acc_integral = jnp.sum(incr_v, axis=0)
        acc_dbl = jnp.sum(prefix_v * dts + 0.5 * incr_v * dts, axis=0)
        zeros33 = jnp.zeros((3, 3), dtype)
        return PreintegratedImu(
            delta_q=Q[-1],
            C_integral=zeros33,
            C_doubleintegral=zeros33,
            acc_integral=acc_integral,
            acc_doubleintegral=acc_dbl,
            dalpha_db_g=zeros33,
            dv_db_g=zeros33,
            dp_db_g=zeros33,
            P_delta=jnp.zeros((15, 15), dtype),
            sqrt_info=jnp.zeros((15, 15), dtype),
            delta_t=jnp.sum(dt_all),
            sb_ref=sb_ref,
        )

    n_intervals = dt_all.shape[0]
    final, _ = jax.lax.scan(
        step,
        init,
        (dt_all, w0_all, w1_all, a0_all, a1_all),
        # bounded unroll: the full-mode per-step 15x15 covariance/Jacobian
        # math makes unconditional unroll compile pathologically on long
        # windows (a 200-interval window never finished)
        unroll=min(8, max(n_intervals, 1)),
    )

    P = 0.5 * (final.P_delta + final.P_delta.T)
    # Invert via the correlation matrix: diag(P) spans ~1e-12 (biases) to
    # ~1e-6 (position) so a raw inverse loses everything in f32; the diagonal
    # scaling makes the factorization dtype-robust (the reference does the
    # raw inverse in f64, ImuError.cpp:274-283).
    d = jnp.sqrt(jnp.clip(jnp.diagonal(P), 1e-24, None))
    Pc = P / (d[:, None] * d[None, :])
    info_c = jnp.linalg.inv(Pc + 1e-9 * jnp.eye(15, dtype=dtype))
    info_c = 0.5 * (info_c + info_c.T)
    Lc = jnp.linalg.cholesky(info_c)
    # sqrt_info = Lcᵀ D⁻¹ satisfies Sᵀ S = D⁻¹ info_c D⁻¹ = P⁻¹
    sqrt_info = Lc.T / d[None, :]

    return PreintegratedImu(
        delta_q=final.delta_q,
        C_integral=final.C_integral,
        C_doubleintegral=final.C_doubleintegral,
        acc_integral=final.acc_integral,
        acc_doubleintegral=final.acc_doubleintegral,
        dalpha_db_g=final.dalpha_db_g,
        dv_db_g=final.dv_db_g,
        dp_db_g=final.dp_db_g,
        P_delta=P,
        sqrt_info=sqrt_info,
        delta_t=final.delta_t,
        sb_ref=sb_ref,
    )


def propagate(
    params: ImuParams,
    T_WS: SE3,
    speed_and_bias: jnp.ndarray,  # (9,)
    timestamps: jnp.ndarray,
    gyro: jnp.ndarray,
    acc: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    mean_only: bool = True,
) -> Tuple[SE3, jnp.ndarray]:
    """Forward state propagation T_WS(t0) -> T_WS(t1)
    (ref static ImuError::propagation, ImuError.cpp:287-504; the reference
    also skips covariance/Jacobian propagation when the caller passes no
    output for them — prediction callers never do — so mean_only is the
    default here).

    Composes the preintegrated increment with gravity in the world frame:
        q1 = q0 * Δq
        v1 = v0 - g Δt + C_WS0 ∫C a dt
        r1 = r0 + v0 Δt - ½ g Δt² + C_WS0 ∫∫C a dt²
    """
    pre = preintegrate(
        params, timestamps, gyro, acc, t0, t1, speed_and_bias,
        mean_only=mean_only,
    )
    g_W = gravity_vector(params, dtype=gyro.dtype)
    C_WS0 = so3.quat_to_matrix(T_WS.q)
    dt = pre.delta_t
    v0 = speed_and_bias[:3]
    r1 = T_WS.r + v0 * dt - 0.5 * g_W * dt * dt + C_WS0 @ pre.acc_doubleintegral
    q1 = so3.quat_normalize(so3.quat_multiply(T_WS.q, pre.delta_q))
    v1 = v0 - g_W * dt + C_WS0 @ pre.acc_integral
    sb1 = speed_and_bias.at[:3].set(v1)
    return SE3(r=r1, q=q1), sb1


def init_pose_from_imu(acc_mean: jnp.ndarray, dtype=None) -> SE3:
    """Gravity-aligned initial pose from mean accelerometer reading
    (ref Estimator::initPoseFromImu, Estimator.cpp:810-840).

    q_WS = delta_q(-angle * axis) with axis = normalize(ez × e_acc) and
    angle = acos(ez · e_acc) — zero position, yaw left free.
    """
    dtype = dtype or acc_mean.dtype
    e_acc = acc_mean / jnp.linalg.norm(acc_mean)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    axis_raw = jnp.cross(ez, e_acc)
    n = so3.safe_norm(axis_raw)
    axis = axis_raw / jnp.where(n < 1e-12, 1.0, n)
    angle = jnp.arccos(jnp.clip(jnp.dot(ez, e_acc), -1.0, 1.0))
    alpha = jnp.where(n < 1e-12, jnp.zeros(3, dtype=dtype), -angle * axis)
    return SE3(r=jnp.zeros(3, dtype=dtype), q=so3.delta_q(alpha))

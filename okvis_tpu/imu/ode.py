"""RK4 continuous-time IMU integration (alternative integrator).

Parity with the reference ode.hpp
(/root/reference/okvis_ceres/include/okvis/ceres/ode/ode.hpp:58-304:
evaluateContinuousTimeOde + integrateOneStep_RungeKutta) — the reference
ships this alongside the trapezoidal path that actually runs; likewise here
the scan-based trapezoid in `preintegration.py` is the production path and
RK4 serves as an accuracy cross-check.

State: (r_W (3), q_WS (4), v_W (3)); biases held constant over the step.
ODE:  ṙ = v,  q̇ = ½ q ⊗ [ω-b_g, 0],  v̇ = C(q)(a-b_a) − g e_z.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..kinematics import so3
from ..kinematics.se3 import SE3
from .preintegration import ImuParams, gravity_vector


def _state_dot(params: ImuParams, r, q, v, omega, acc, b_g, b_a):
    g_W = gravity_vector(params, dtype=r.dtype)
    w = omega - b_g
    q_dot = 0.5 * so3.quat_multiply(q, jnp.concatenate([w, jnp.zeros(1, r.dtype)]))
    v_dot = so3.quat_rotate(q, acc - b_a) - g_W
    return v, q_dot, v_dot


def propagate_rk4(
    params: ImuParams,
    T_WS: SE3,
    speed_and_bias: jnp.ndarray,  # (9,)
    timestamps: jnp.ndarray,  # (P,) seconds, padded
    gyro: jnp.ndarray,  # (P, 3)
    acc: jnp.ndarray,  # (P, 3)
    t0: jnp.ndarray,
    t1: jnp.ndarray,
) -> Tuple[SE3, jnp.ndarray]:
    """Classic RK4 over each clipped sample interval with linear measurement
    interpolation at the half step (ode.hpp integrateOneStep_RungeKutta)."""
    from .preintegration import _interval_quantities

    dt_all, w0_all, w1_all, a0_all, a1_all = _interval_quantities(
        timestamps, gyro, acc, t0, t1
    )
    b_g = speed_and_bias[3:6]
    b_a = speed_and_bias[6:9]

    def step(carry, xs):
        r, q, v = carry
        dt, w0, w1, a0, a1 = xs
        active = dt > 0
        wm = 0.5 * (w0 + w1)
        am = 0.5 * (a0 + a1)

        k1 = _state_dot(params, r, q, v, w0, a0, b_g, b_a)
        k2 = _state_dot(
            params,
            r + 0.5 * dt * k1[0],
            q + 0.5 * dt * k1[1],
            v + 0.5 * dt * k1[2],
            wm, am, b_g, b_a,
        )
        k3 = _state_dot(
            params,
            r + 0.5 * dt * k2[0],
            q + 0.5 * dt * k2[1],
            v + 0.5 * dt * k2[2],
            wm, am, b_g, b_a,
        )
        k4 = _state_dot(
            params, r + dt * k3[0], q + dt * k3[1], v + dt * k3[2], w1, a1, b_g, b_a
        )
        r1 = r + dt / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        q1 = q + dt / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        q1 = so3.quat_normalize(q1)
        v1 = v + dt / 6.0 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        out = (
            jnp.where(active, r1, r),
            jnp.where(active, q1, q),
            jnp.where(active, v1, v),
        )
        return out, None

    (r, q, v), _ = jax.lax.scan(
        step,
        (T_WS.r, T_WS.q, speed_and_bias[:3]),
        (dt_all, w0_all, w1_all, a0_all, a1_all),
    )
    return SE3(r=r, q=q), speed_and_bias.at[:3].set(v)

"""Jitted SE(3) pose-graph optimizer.

TPU-first design: the graph is a fixed-capacity SoA — node poses ``(N,7)``
and edges ``(E,)`` of (i, j, measured T_ij, 6x6 sqrt-information, mask).
One XLA program runs the whole Levenberg-Marquardt loop:

- residuals for ALL edges in one vmapped evaluation,
- Gauss-Newton matvec ``v -> J^T J v`` via ``jax.linearize`` + ``jax.vjp``
  (the Jacobian is never materialized; each matvec is two batched passes
  over the edges — pure fused elementwise + tiny matmuls),
- block-Jacobi preconditioner from per-edge 6x6 Jacobian blocks
  (``vmap(jacfwd)`` of the single-edge residual, segment-summed per node),
- CG inner solver, LM damping with accept/reject on true cost.

Convention matches the rest of the framework (kinematics/se3.py, itself
matching /root/reference/okvis_kinematics/.../Transformation.hpp): an edge
measures ``T_ij = T_WS_i^-1 * T_WS_j``; the residual is the minimal-coords
difference ``minus(T_ij_pred, T_ij_meas)`` weighted by the sqrt-information.
Gauge freedom is removed by a per-node ``free`` mask (fixed nodes get zero
update and an identity preconditioner block).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kinematics import se3


class PoseGraphArrays(NamedTuple):
    """Device-side padded pose graph (all leaves static-shaped)."""

    node_r: jnp.ndarray  # (N, 3)
    node_q: jnp.ndarray  # (N, 4) xyzw
    node_mask: jnp.ndarray  # (N,) bool — slot occupied
    free_mask: jnp.ndarray  # (N,) bool — node is optimized (gauge: fix >=1)
    edge_i: jnp.ndarray  # (E,) int32 node slot of frame i
    edge_j: jnp.ndarray  # (E,) int32 node slot of frame j
    meas_r: jnp.ndarray  # (E, 3) measured T_ij translation
    meas_q: jnp.ndarray  # (E, 4) measured T_ij quaternion
    sqrt_info: jnp.ndarray  # (E, 6, 6) upper-triangular sqrt information
    edge_mask: jnp.ndarray  # (E,) bool


class PgoResult(NamedTuple):
    node_r: jnp.ndarray
    node_q: jnp.ndarray
    final_cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray


def _edge_residual(T_i: se3.SE3, T_j: se3.SE3, T_meas: se3.SE3,
                   sqrt_info: jnp.ndarray) -> jnp.ndarray:
    """Weighted minimal-coordinates error of one edge, (6,)."""
    T_pred = se3.compose(se3.inverse(T_i), T_j)
    e = se3.minus(T_pred, T_meas)
    return sqrt_info @ e


def _all_residuals(g: PoseGraphArrays, deltas: jnp.ndarray) -> jnp.ndarray:
    """(E, 6) residuals after applying deltas (N, 6) to the nodes."""
    d = deltas * g.free_mask[:, None].astype(deltas.dtype)
    nodes = se3.oplus(se3.SE3(g.node_r, g.node_q), d)
    T_i = se3.SE3(nodes.r[g.edge_i], nodes.q[g.edge_i])
    T_j = se3.SE3(nodes.r[g.edge_j], nodes.q[g.edge_j])
    T_m = se3.SE3(g.meas_r, g.meas_q)
    r = jax.vmap(_edge_residual)(T_i, T_j, T_m, g.sqrt_info)
    return r * g.edge_mask[:, None].astype(r.dtype)


def _edge_jacobians(g: PoseGraphArrays) -> tuple:
    """Per-edge 6x6 residual Jacobian blocks (Ji, Jj), edge-masked."""
    T_i = se3.SE3(g.node_r[g.edge_i], g.node_q[g.edge_i])
    T_j = se3.SE3(g.node_r[g.edge_j], g.node_q[g.edge_j])
    T_m = se3.SE3(g.meas_r, g.meas_q)

    def res_of(di, dj, Ti, Tj, Tm, L):
        return _edge_residual(se3.oplus(Ti, di), se3.oplus(Tj, dj), Tm, L)

    z6 = jnp.zeros((g.edge_i.shape[0], 6), g.node_r.dtype)
    Ji = jax.vmap(jax.jacfwd(res_of, argnums=0))(z6, z6, T_i, T_j, T_m, g.sqrt_info)
    Jj = jax.vmap(jax.jacfwd(res_of, argnums=1))(z6, z6, T_i, T_j, T_m, g.sqrt_info)
    w = g.edge_mask[:, None, None].astype(Ji.dtype)
    return Ji * w, Jj * w


def _diag_blocks(g: PoseGraphArrays) -> jnp.ndarray:
    """Per-node 6x6 diagonal Hessian blocks, (N, 6, 6), via per-edge jacfwd."""
    Ji, Jj = _edge_jacobians(g)
    Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
    Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
    N = g.node_r.shape[0]
    B = jnp.zeros((N, 6, 6), Ji.dtype)
    B = B.at[g.edge_i].add(Hii)
    B = B.at[g.edge_j].add(Hjj)
    return B


def _dense_hessian(g: PoseGraphArrays, B_damped: jnp.ndarray) -> jnp.ndarray:
    """Materialize the damped Gauss-Newton Hessian as one dense (6N, 6N).

    Off-diagonal 6x6 blocks are scatter-added per edge (columns of FIXED
    nodes zeroed so the gauge stays out of the system); the block diagonal
    is overwritten with the already-damped ``B_damped`` (identity at fixed
    nodes). At default capacity (N=256 -> 1536 dims) the matrix is 9 MB and
    one Cholesky computes the exact LM step in the same wall time as 60
    latency-bound PCG matvec rounds, with better per-iteration convergence.
    """
    N = g.node_r.shape[0]
    free = g.free_mask.astype(g.node_r.dtype)
    Ji, Jj = _edge_jacobians(g)
    Jim = Ji * free[g.edge_i][:, None, None]
    Jjm = Jj * free[g.edge_j][:, None, None]
    Hij = jnp.einsum("eki,ekj->eij", Jim, Jjm)
    H = jnp.zeros((N, N, 6, 6), Ji.dtype)
    H = H.at[g.edge_i, g.edge_j].add(Hij)
    H = H.at[g.edge_j, g.edge_i].add(jnp.swapaxes(Hij, 1, 2))
    ar = jnp.arange(N)
    H = H.at[ar, ar].set(B_damped)
    return jnp.swapaxes(H, 1, 2).reshape(N * 6, N * 6)


def _spd_inverse_6x6(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form SPD inverse via unrolled 6x6 Cholesky.

    Static 6-step unroll compiles to fused elementwise ops on any backend —
    avoids LU decomposition, which the TPU compiler only implements for f32.
    """
    L = jnp.zeros_like(A)
    for i in range(6):
        s = A[..., i, i]
        for k in range(i):
            s = s - L[..., i, k] * L[..., i, k]
        dii = jnp.sqrt(jnp.maximum(s, 1e-30))
        L = L.at[..., i, i].set(dii)
        for j in range(i + 1, 6):
            s2 = A[..., j, i]
            for k in range(i):
                s2 = s2 - L[..., j, k] * L[..., i, k]
            L = L.at[..., j, i].set(s2 / dii)
    # forward-substitute L @ X = I (unrolled) -> X = L^-1
    Linv = jnp.zeros_like(A)
    for c in range(6):
        for rw in range(c, 6):
            s = (1.0 if rw == c else 0.0)
            for k in range(c, rw):
                s = s - L[..., rw, k] * Linv[..., k, c]
            Linv = Linv.at[..., rw, c].set(s / L[..., rw, rw])
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv)


def _pcg(matvec, b, Minv_blocks, free, iters: int, tol: float):
    """Block-Jacobi preconditioned CG on the (N,6) flattened system."""

    def apply_precond(r):
        y = jnp.einsum("nij,nj->ni", Minv_blocks, r)
        return y * free[:, None]

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(c):
        x, r, p, rz, k = c
        return (k < iters) & (jnp.sum(r * r) > tol * tol * b2)

    def body(c):
        x, r, p, rz, k = c
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, jnp.int32(0)))
    return x


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "pcg_iters", "solver")
)
def optimize_pose_graph(
    g: PoseGraphArrays,
    max_iterations: int = 10,
    pcg_iters: int = 50,
    lambda0: float = 1e-4,
    pcg_tol: float = 1e-6,
    cost_tol: float = 1e-9,
    solver: str = "auto",
) -> PgoResult:
    """Levenberg-Marquardt over the pose graph; whole loop is one XLA program.

    ``solver``: "pcg" (block-Jacobi PCG, matrix-free), "dense" (materialized
    Hessian + Cholesky: the EXACT LM step — measured on v5e at N=256 it
    matches PCG's wall time while converging to half the final cost, since
    60 PCG rounds leave the step unconverged), or "auto" (dense when
    6N <= 2048 — the manager's default capacity — else pcg; XLA's
    panel-sequential Cholesky loses to PCG above ~512 nodes).

    ``pcg_iters``/``pcg_tol`` apply ONLY when the resolved solver is "pcg" —
    under "auto" a graph at capacity <= 341 nodes solves densely and ignores
    them. An explicit solver="dense" materializes an (N,N,6,6) block tensor
    plus the (6N,6N) matrix per LM iteration (~2x ~300 MB at N=1024 in f64);
    requests beyond 4x the auto threshold are refused — pass solver="pcg"
    (or keep "auto") for large graphs.
    """
    if solver == "auto":
        solver = "dense" if g.node_r.shape[0] * 6 <= 2048 else "pcg"
    elif solver == "dense" and g.node_r.shape[0] * 6 > 4 * 2048:
        raise ValueError(
            f"solver='dense' at {g.node_r.shape[0]} nodes would materialize "
            f"a {g.node_r.shape[0] * 6}^2 Hessian (plus the (N,N,6,6) block "
            "tensor) per LM iteration — use solver='pcg' or 'auto'"
        )
    if solver not in ("dense", "pcg"):
        raise ValueError(f"unknown pose-graph solver {solver!r}")
    dtype = g.node_r.dtype
    free = g.free_mask.astype(dtype)

    def cost_of(rr):
        return 0.5 * jnp.sum(rr * rr)

    def gn_pieces(g_now):
        zero = jnp.zeros((g_now.node_r.shape[0], 6), dtype)
        r0, jvp_fn = jax.linearize(lambda d: _all_residuals(g_now, d), zero)
        _, vjp_fn = jax.vjp(lambda d: _all_residuals(g_now, d), zero)
        grad = vjp_fn(r0)[0]  # J^T r
        B = _diag_blocks(g_now)
        return r0, jvp_fn, vjp_fn, grad, B

    r_init = _all_residuals(g, jnp.zeros((g.node_r.shape[0], 6), dtype))
    c_init = cost_of(r_init)

    def lm_body(c):
        g_now, lam, cost, it, done = c
        r0, jvp_fn, vjp_fn, grad, B = gn_pieces(g_now)

        diagB = jnp.diagonal(B, axis1=1, axis2=2)  # (N, 6)

        # NOTE: keep this operator's damping identical to B_damped below —
        # "dense" and "pcg" must solve the SAME damped system (the tests
        # assert step-equivalence between the two paths).
        def matvec(v):
            jtjv = vjp_fn(jvp_fn(v))[0]
            return (jtjv + lam * diagB * v + (lam * 1e-8 + 1e-12) * v) * free[:, None]

        eye = jnp.eye(6, dtype=dtype)
        B_damped = B + lam * diagB[:, :, None] * eye + (lam * 1e-8 + 1e-12) * eye
        # fixed nodes get identity blocks so the inverse is well-defined
        B_damped = jnp.where(g.free_mask[:, None, None], B_damped, eye)

        b = -grad * free[:, None]
        if solver == "dense":
            Hd = _dense_hessian(g_now, B_damped)
            L = jax.scipy.linalg.cholesky(Hd, lower=True)
            x = jax.scipy.linalg.cho_solve((L, True), b.reshape(-1))
            delta = x.reshape(b.shape) * free[:, None]
        else:
            Minv = _spd_inverse_6x6(B_damped)
            delta = _pcg(matvec, b, Minv, free, pcg_iters, pcg_tol)
        r_new = _all_residuals(g_now, delta)
        cost_new = cost_of(r_new)
        accept = cost_new < cost
        nodes_new = se3.oplus(se3.SE3(g_now.node_r, g_now.node_q),
                              delta * free[:, None])
        g_next = g_now._replace(
            node_r=jnp.where(accept, nodes_new.r, g_now.node_r),
            node_q=jnp.where(accept, nodes_new.q, g_now.node_q),
        )
        lam_next = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                             jnp.minimum(lam * 4.0, 1e8))
        cost_next = jnp.where(accept, cost_new, cost)
        rel_drop = (cost - cost_next) / jnp.maximum(cost, 1e-30)
        done_next = accept & (rel_drop < cost_tol)
        return g_next, lam_next, cost_next, it + 1, done_next

    def lm_cond(c):
        _, _, _, it, done = c
        return (it < max_iterations) & (~done)

    g_fin, lam, cost_fin, iters, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (g, jnp.asarray(lambda0, dtype), c_init, jnp.int32(0), jnp.bool_(False)),
    )
    return PgoResult(node_r=g_fin.node_r, node_q=g_fin.node_q,
                     final_cost=cost_fin, initial_cost=c_init, iterations=iters)

"""Distributed sliding-window BA: landmarks/observations sharded over a mesh.

The reference has no distributed code at all (SURVEY.md §2.14) — this is the
new capability named in BASELINE.json: scale the map side of the window across
devices. Design (SURVEY.md §7 step 8):

- mesh axis "map": the landmark table (L) and observation table (O) are
  partitioned contiguously; each landmark's observations live on its shard
  (the host assigns landmark slots round-robin by block — see
  `shard_problem`).
- per-shard reprojection evaluation produces the landmark blocks H_ll/b_l/W
  (shard-local, never communicated) and a partial dense H/b that is
  `psum`-reduced over ICI.
- IMU/prior/marginal factors are tiny and dense-only: evaluated redundantly
  on every shard (identical values, no reduction).
- the reduced (D,D) Schur system is solved redundantly on every shard
  (replicated small solve); landmark back-substitution is shard-local.

Numerics: the psum over shards changes only summation ORDER of the same
H entries; in f64 the sharded result matches single-device to ~1e-12 (tested
on the virtual CPU mesh), satisfying the SURVEY §4 multi-device equivalence
requirement.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..imu.preintegration import ImuParams
from ..solver.assemble import NormalEqs, evaluate_dense_factors, evaluate_reprojection
from ..solver.optimize import apply_update, dense_dim_mask, solve_normal_eqs
from ..solver.structure import BaProblem, WindowConfig, WindowStates


def make_mesh(n_devices: int = None, axis: str = "map") -> Mesh:
    avail = jax.devices()
    if n_devices is not None and len(avail) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(avail)} "
            f"device(s) are visible (set XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N for a virtual CPU mesh)"
        )
    return Mesh(np.asarray(avail[: n_devices or len(avail)]), (axis,))


def make_mesh2d(n_hosts: int, devices_per_host: int) -> Mesh:
    """Multi-host mesh ("host", "map"): the map axis is contiguous devices
    of one host (psum rides ICI); the host axis crosses hosts (psum rides
    DCN). Only the already-reduced (D,D) dense system crosses the host
    axis — the landmark tables never leave their host."""
    devs = jax.devices()[: n_hosts * devices_per_host]
    return Mesh(np.asarray(devs).reshape(n_hosts, devices_per_host),
                ("host", "map"))


def _psum_hier(x, axis):
    """psum over one axis name, or hierarchically over a tuple — innermost
    (last) axis first, so on ("host", "map") the big per-shard reduction
    collapses over ICI before the residue crosses DCN."""
    if isinstance(axis, (tuple, list)):
        for a in reversed(axis):
            x = jax.lax.psum(x, a)
        return x
    return jax.lax.psum(x, axis)


def problem_specs(cfg: WindowConfig, axis="map") -> BaProblem:
    """PartitionSpec pytree for a BaProblem: obs/landmark tables sharded on
    their leading axis, everything else replicated. `axis` may be a tuple
    (e.g. ("host", "map")) — the leading dim then shards over both."""
    rep = P()
    sh = P(tuple(axis) if isinstance(axis, (tuple, list)) else axis)
    jtu = jax.tree_util
    p = jtu.tree_map(lambda _: rep, _template(cfg))
    # states: hp_W sharded
    p = p._replace(states=p.states._replace(hp_W=sh))
    p = p._replace(lm_mask=sh)
    p = p._replace(obs=jtu.tree_map(lambda _: sh, p.obs))
    return p


def _template(cfg: WindowConfig):
    from ..solver.structure import empty_problem

    return empty_problem(cfg, dtype=jnp.float32)


def shard_problem(
    problem: BaProblem, n_shards: int, on_overflow: str = "drop"
) -> BaProblem:
    """Re-map observation landmark/table layout so each landmark's
    observations are contiguous in its landmark-shard's observation block.

    Host-side: landmark slot l belongs to shard l // (L/n). Observations are
    regrouped so shard s's block [s·O/n, (s+1)·O/n) only references landmarks
    of shard s, with lm_idx rewritten shard-locally at shard_map entry (the
    partitioned gather indices stay local automatically since both tables are
    sharded contiguously — indices are made shard-relative here).

    Fully vectorized (stable argsort + cumulative within-shard ranks) — no
    per-observation Python loop on the per-frame path.

    on_overflow: a shard's block holds O/n observations; when one shard's
    landmarks collectively exceed it, 'drop' sheds the excess observations
    (warned — matching the pipeline's drop-on-full policies) while 'raise'
    errors (strict mode for tests).
    """
    import numpy as np

    L = problem.lm_mask.shape[0]
    O = problem.obs.mask.shape[0]
    assert L % n_shards == 0 and O % n_shards == 0
    Ls, Os = L // n_shards, O // n_shards
    obs = problem.obs
    lm_idx = np.asarray(obs.lm_idx)
    mask = np.asarray(obs.mask)

    idx = np.nonzero(mask)[0]
    shard = lm_idx[idx] // Ls
    order = np.argsort(shard, kind="stable")
    idx, shard = idx[order], shard[order]
    counts = np.bincount(shard, minlength=n_shards)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(len(idx)) - offsets[shard]  # rank inside own shard
    keep = within < Os
    if not keep.all():
        n_drop = int((~keep).sum())
        if on_overflow == "raise":
            raise RuntimeError(
                f"shard observation block overflow ({n_drop} over capacity "
                f"{Os}/shard)"
            )
        import logging

        logging.getLogger("okvis_tpu").warning(
            "distributed BA: shedding %d observation(s) over the %d/shard "
            "block capacity", n_drop, Os,
        )
        idx, shard, within = idx[keep], shard[keep], within[keep]
    dst = shard * Os + within

    new = {}
    for k in obs._fields:
        src = np.asarray(getattr(obs, k))
        out = np.zeros_like(src)
        out[dst] = src[idx]
        new[k] = out
    new["lm_idx"][dst] = lm_idx[idx] - shard * Ls  # shard-local index
    new["mask"][:] = False
    new["mask"][dst] = True
    return problem._replace(
        obs=type(obs)(**{k: jnp.asarray(v) for k, v in new.items()})
    )


def make_sharded_optimizer(
    cfg: WindowConfig,
    imu_params: ImuParams,
    intrinsics: List[jnp.ndarray],
    mesh: Mesh,
    axis="map",
):
    """Build a jitted sharded optimize step: problem (sharded) -> new states.

    The returned function expects a problem processed by `shard_problem`
    (shard-local lm_idx) and placed according to `problem_specs`.
    """
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
    else:
        n = mesh.shape[axis]
    assert cfg.max_landmarks % n == 0 and cfg.max_observations % n == 0
    cfg_local = dataclasses.replace(
        cfg,
        max_landmarks=cfg.max_landmarks // n,
        max_observations=cfg.max_observations // n,
    )

    specs = problem_specs(cfg, axis)
    out_spec = (
        specs.states,
        P(),  # diagnostics replicated
    )

    def sharded_evaluate(problem: BaProblem, states_dense: WindowStates,
                         hp_local: jnp.ndarray) -> NormalEqs:
        states = states_dense._replace(hp_W=hp_local)
        H_obs, b_obs, H_ll, b_l, W, cost_obs = evaluate_reprojection(
            cfg_local, intrinsics, problem.obs, states
        )
        H_obs = _psum_hier(H_obs, axis)
        b_obs = _psum_hier(b_obs, axis)
        cost_obs = _psum_hier(cost_obs, axis)
        H_dense, b_dense, cost_dense = evaluate_dense_factors(
            cfg, imu_params, problem, states_dense
        )
        return NormalEqs(
            H_dd=H_obs + H_dense,
            b_d=b_obs + b_dense,
            H_ll=H_ll,
            b_l=b_l,
            W=W,
            cost=cost_obs + cost_dense,
        )

    def step_body(problem: BaProblem):
        # inside shard_map: problem.obs/* and hp_W/lm_mask are LOCAL blocks
        states0 = problem.states
        hp0 = states0.hp_W  # (L/n, 4) local
        dtype = states0.r_WS.dtype

        eqs0 = sharded_evaluate(problem, states0, hp0)
        lam0 = jnp.asarray(cfg.init_lambda, dtype)

        # equations of the current iterate ride the carry: exactly one
        # sharded evaluation (one psum round) per LM iteration
        def lm_iter(carry, _):
            states_dense, hp, eqs, lam = carry
            delta_d, delta_l = _sharded_solve(
                cfg, cfg_local, eqs, problem.state_mask, problem.lm_mask,
                lam, problem.sb_mask, axis,
            )
            cand_full = apply_update(
                cfg_local,
                states_dense._replace(hp_W=hp),
                delta_d,
                delta_l,
                problem.state_mask,
                problem.lm_mask,
            )
            cand_dense = cand_full._replace(hp_W=states_dense.hp_W)
            eqs_cand = sharded_evaluate(problem, cand_dense, cand_full.hp_W)
            accept = eqs_cand.cost < eqs.cost
            states_dense = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), cand_dense, states_dense
            )
            hp = jnp.where(accept, cand_full.hp_W, hp)
            eqs = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), eqs_cand, eqs
            )
            lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e8)
            return (states_dense, hp, eqs, lam), (eqs.cost, accept)

        (states, hp, eqs, lam), (hist, acc) = jax.lax.scan(
            lm_iter, (states0, hp0, eqs0, lam0), None,
            length=cfg.max_iterations,
        )
        return states._replace(hp_W=hp), (eqs.cost, hist, acc, lam)

    smapped = shard_map(
        step_body, mesh=mesh, in_specs=(specs,), out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(smapped)


def _sharded_solve(cfg, cfg_local, eqs, state_mask, lm_mask, lam, sb_mask, axis):
    """Damped Schur solve with the landmark elimination shard-local and the
    reduced system psum-reduced (mirrors solver.optimize.solve_normal_eqs)."""
    from ..solver.optimize import _inv3x3

    dtype = eqs.H_dd.dtype
    D = cfg.dense_dim
    dim_mask = dense_dim_mask(cfg, state_mask, sb_mask)

    diag_d = jnp.diagonal(eqs.H_dd)
    H_dd = eqs.H_dd + jnp.diag(lam * diag_d + 1e-12)
    eye3 = jnp.eye(3, dtype=dtype)
    H_ll = eqs.H_ll + lam * (eqs.H_ll * eye3) + 1e-12 * eye3
    lm_f = lm_mask.astype(dtype)[:, None, None]
    Hl_inv = _inv3x3(H_ll) * lm_f

    # local landmark-Schur contribution, reduced over shards
    S_local = jnp.einsum("lda,lab,leb->de", eqs.W, Hl_inv, eqs.W)
    g_local = jnp.einsum("lda,lab,lb->d", eqs.W, Hl_inv, eqs.b_l)
    H_red = H_dd - _psum_hier(S_local, axis)
    b_red = eqs.b_d - _psum_hier(g_local, axis)

    mf = dim_mask.astype(dtype)
    H_red = H_red * mf[:, None] * mf[None, :] + jnp.diag(1.0 - mf)
    b_red = b_red * mf
    s = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
    Hs = H_red / (s[:, None] * s[None, :]) + 1e-10 * jnp.eye(D, dtype=dtype)
    from ..solver.optimize import solve_scaled_spd

    delta_d = solve_scaled_spd(Hs, b_red / s, cfg.dense_solver) / s
    delta_d = delta_d * mf

    rhs_l = eqs.b_l - jnp.einsum("ldk,d->lk", eqs.W, delta_d)
    delta_l = jnp.einsum("lab,lb->la", Hl_inv, rhs_l)
    return delta_d, delta_l

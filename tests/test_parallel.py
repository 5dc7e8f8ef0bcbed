"""Distributed BA tests on the 8-device virtual CPU mesh: the psum-reduced
sharded solve must match the single-device solve (SURVEY.md §4 multi-node
analog: numerical equivalence single vs sharded)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu.parallel import make_mesh, make_sharded_optimizer, shard_problem
from okvis_tpu.solver import optimize_window

from helpers import build_synthetic_problem


@pytest.fixture(scope="module")
def world():
    return build_synthetic_problem(
        num_frames=4,
        n_landmarks=96,
        cfg_kwargs=dict(max_landmarks=128, max_observations=1024, max_iterations=6),
    )


def perturb(problem, truth, seed=1):
    import okvis_tpu.kinematics as kin

    rng = np.random.default_rng(seed)
    S = truth["r_WS"].shape[0]
    states = problem.states
    d = jnp.asarray(
        np.concatenate([np.zeros((1, 6)), rng.normal(0, 0.03, (S - 1, 6))])
    )
    new_pose = kin.oplus(kin.SE3(r=states.r_WS[:S], q=states.q_WS[:S]), d)
    n_lm = truth["n_landmarks"]
    states = states._replace(
        r_WS=states.r_WS.at[:S].set(new_pose.r),
        q_WS=states.q_WS.at[:S].set(new_pose.q),
        hp_W=states.hp_W.at[:n_lm, :3].add(
            jnp.asarray(rng.normal(0, 0.05, (n_lm, 3)))
        ),
    )
    return problem._replace(states=states)


def test_sharded_matches_single_device(world):
    cfg, imu_params, intrinsics, problem, truth = world
    problem = perturb(problem, truth)

    # single-device reference
    states_ref, diag_ref = jax.jit(
        functools.partial(optimize_window, cfg, imu_params, intrinsics)
    )(problem)

    mesh = make_mesh(8)
    opt = make_sharded_optimizer(cfg, imu_params, intrinsics, mesh)
    sharded = shard_problem(problem, 8)
    states_sh, (cost_sh, hist, _acc, _lam) = opt(sharded)

    np.testing.assert_allclose(
        np.asarray(states_sh.r_WS), np.asarray(states_ref.r_WS), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(states_sh.q_WS), np.asarray(states_ref.q_WS), atol=1e-8
    )
    np.testing.assert_allclose(
        float(cost_sh), float(diag_ref.final_cost), rtol=1e-8
    )
    # landmark table: sharded layout keeps slots in place
    np.testing.assert_allclose(
        np.asarray(states_sh.hp_W), np.asarray(states_ref.hp_W), atol=1e-7
    )


def test_shard_problem_layout(world):
    cfg, _, _, problem, truth = world
    sharded = shard_problem(problem, 8)
    O = cfg.max_observations
    L = cfg.max_landmarks
    Os, Ls = O // 8, L // 8
    lm_idx = np.asarray(sharded.obs.lm_idx)
    mask = np.asarray(sharded.obs.mask)
    # every active observation's (local) landmark index stays within its block
    for s in range(8):
        blk = slice(s * Os, (s + 1) * Os)
        active = mask[blk]
        assert np.all(lm_idx[blk][active] < Ls)
    # same number of active observations overall
    assert mask.sum() == np.asarray(problem.obs.mask).sum()

def test_multihost_2d_mesh_matches_single_device(world):
    """2-host × 4-chip mesh ("host", "map"): hierarchical psum (ICI within
    host, DCN across) must be numerically identical to the flat solve."""
    from okvis_tpu.parallel.sharded_ba import make_mesh2d

    cfg, imu_params, intrinsics, problem, truth = world
    problem = perturb(problem, truth)

    states_ref, diag_ref = jax.jit(
        functools.partial(optimize_window, cfg, imu_params, intrinsics)
    )(problem)

    mesh = make_mesh2d(2, 4)
    opt = make_sharded_optimizer(
        cfg, imu_params, intrinsics, mesh, axis=("host", "map")
    )
    sharded = shard_problem(problem, 8)
    states_sh, (cost_sh, hist, _acc, _lam) = opt(sharded)

    np.testing.assert_allclose(
        np.asarray(states_sh.r_WS), np.asarray(states_ref.r_WS), atol=1e-8
    )
    np.testing.assert_allclose(
        float(cost_sh), float(diag_ref.final_cost), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(states_sh.hp_W), np.asarray(states_ref.hp_W), atol=1e-7
    )


def test_estimator_enable_distributed_matches_single(rng):
    """Estimator.optimize() with enable_distributed(8) equals the
    single-device optimize to f64 tolerance (same window, same factors)."""
    import copy

    from helpers import build_estimator_world

    est_a, world_a = build_estimator_world(seed=5)
    est_b, world_b = build_estimator_world(seed=5, distributed=8)

    for est, world in ((est_a, world_a), (est_b, world_b)):
        est.optimize()

    np.testing.assert_allclose(est_a.r_WS, est_b.r_WS, atol=1e-7)
    np.testing.assert_allclose(est_a.q_WS, est_b.q_WS, atol=1e-7)
    # landmark slots are assigned round-robin under distribution: compare by id
    assert set(est_a.landmarks) == set(est_b.landmarks)
    for lm_id in est_a.landmarks:
        np.testing.assert_allclose(
            np.asarray(est_a.get_landmark(lm_id)),
            np.asarray(est_b.get_landmark(lm_id)),
            atol=1e-6,
        )


def test_shard_problem_overflow_policies(world):
    """One shard's landmarks exceeding its O/n observation block: 'drop'
    sheds the excess (keeps solving), 'raise' errors (strict mode)."""
    import pytest as _pytest

    cfg, imu_params, intrinsics, problem, truth = world
    O = problem.obs.mask.shape[0]
    # point EVERY observation at landmark slot 0 -> all land in shard 0
    obs = problem.obs._replace(lm_idx=jnp.zeros_like(problem.obs.lm_idx))
    bad = problem._replace(obs=obs)
    n_active = int(np.asarray(problem.obs.mask).sum())
    assert n_active > O // 8  # guaranteed overflow at 8 shards

    with _pytest.raises(RuntimeError):
        shard_problem(bad, 8, on_overflow="raise")

    shed = shard_problem(bad, 8)  # default: drop
    kept = int(np.asarray(shed.obs.mask).sum())
    assert kept == O // 8  # exactly one full block survives
    # all kept observations live in shard 0's block with local indices
    m = np.asarray(shed.obs.mask)
    assert not m[O // 8:].any()
    assert (np.asarray(shed.obs.lm_idx)[m] == 0).all()

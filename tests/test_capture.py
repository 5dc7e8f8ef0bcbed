"""Steady-state program capture (utils/capture.py): the bench harness
replays captured per-frame programs to measure pure device time, so the
captured (fn, args) must reproduce the live launch exactly."""

import jax
import numpy as np

from okvis_tpu.utils import capture

from helpers import build_estimator_world


def test_capture_disabled_records_nothing():
    capture.reset()
    capture.enabled = False
    est, _world = build_estimator_world(n_frames=3)
    est.optimize()
    assert capture.programs() == {}


def test_capture_replay_matches_live_optimize():
    capture.reset()
    capture.enabled = True
    try:
        est, _world = build_estimator_world(n_frames=3)
        diag = est.optimize()
        progs = capture.programs()
        # optimize always runs; propagate runs for every non-first state
        assert "optimize" in progs and "propagate" in progs
        fn, args, kwargs = progs["optimize"]
        states2, diag2 = fn(*args, **kwargs)
        jax.block_until_ready(states2)
        # replay of the captured program = the live solve, bit-for-bit
        np.testing.assert_array_equal(
            np.asarray(diag2.final_cost), np.asarray(diag.final_cost)
        )
        np.testing.assert_array_equal(np.asarray(states2.r_WS), est.r_WS)
        # propagate replays without error and returns the same structure
        pfn, pargs, pkw = progs["propagate"]
        T, sb = pfn(*pargs, **pkw)
        assert np.asarray(sb).shape == (9,)
    finally:
        capture.enabled = False
        capture.reset()

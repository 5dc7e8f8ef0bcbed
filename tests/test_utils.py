"""Utility tests: timing registry (TestNsecTimeUtilities/Timer analog), ids,
time conversions, CSV writer."""

import numpy as np

from okvis_tpu.utils import IdProvider, Timer, Timing, ns_from_sec, sec_from_ns


def test_time_conversions():
    assert ns_from_sec(1.5) == 1_500_000_000
    assert sec_from_ns(2_000_000_000) == 2.0
    # round trip at ns resolution
    t = 1403636579763555580
    assert ns_from_sec(sec_from_ns(t)) - t == 0 or abs(ns_from_sec(sec_from_ns(t)) - t) < 200


def test_timing_registry_stats():
    Timing.reset()
    for v in (0.01, 0.02, 0.03):
        Timing.add("x.test", v)
    assert Timing.count("x.test") == 3
    np.testing.assert_allclose(Timing.mean("x.test"), 0.02, atol=1e-12)
    np.testing.assert_allclose(Timing.total("x.test"), 0.06, atol=1e-12)
    table = Timing.print()
    assert "x.test" in table
    # kill switch (ref DEACTIVATE_TIMERS)
    Timing.enabled = False
    Timing.add("x.test", 1.0)
    assert Timing.count("x.test") == 3
    Timing.enabled = True
    Timing.reset()


def test_timer_context_manager():
    Timing.reset()
    import time

    with Timer("y.block"):
        time.sleep(0.01)
    assert Timing.count("y.block") == 1
    assert Timing.mean("y.block") >= 0.009
    Timing.reset()


def test_id_provider_monotone():
    a = IdProvider.new_id()
    b = IdProvider.new_id()
    assert b == a + 1


def test_state_csv_writer(tmp_path):
    """VioInterface CSV writer parity (VioInterface.hpp:95-123)."""
    import jax.numpy as jnp

    from okvis_tpu import kinematics as kin
    from okvis_tpu.config import read_config
    from okvis_tpu.pipeline import ThreadedVio
    from okvis_tpu.pipeline.threaded_vio import StateEstimate

    params = read_config("/root/reference/config/config_fpga_p2_euroc.yaml")
    vio = ThreadedVio(params, rig=None, blocking=True)
    path = str(tmp_path / "states.csv")
    vio.set_state_csv_file(path)
    # push a synthetic result straight through the publisher queue
    res = StateEstimate(
        timestamp_ns=123,
        T_WS=kin.SE3(r=jnp.asarray([1.0, 2, 3]), q=kin.quat_identity()),
        speed_and_bias=np.arange(9, dtype=float),
    )
    vio.result_queue.push_nonblocking_dropping_if_full(res, 10)
    import time

    time.sleep(0.3)
    vio.shutdown()
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("#timestamp_ns")
    assert len(lines) == 2
    fields = lines[1].split(",")
    assert fields[0] == "123"
    assert float(fields[1]) == 1.0 and float(fields[7]) == 1.0  # p_x, q_w

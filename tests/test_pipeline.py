"""Pipeline tests — analogs of the reference Tier-3 suite
(/root/reference/okvis_multisensor_processing/test/): queue semantics,
frame synchronization, and the full ThreadedVio loop with a stubbed detector
(the gmock-equivalent: testDataFlow.cpp:24-113 mocks detection the same way)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import kinematics as kin
from okvis_tpu.config import read_config
from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks, simulate_trajectory
from okvis_tpu.cameras import NCameraSystem, pinhole
from okvis_tpu.eval import ate_rmse
from okvis_tpu.frontend.detection import Keypoints
from okvis_tpu.frontend.frame import FrameData
from okvis_tpu.pipeline import FrameSynchronizer, ThreadSafeQueue, ThreadedVio
from okvis_tpu.pipeline.queues import ShutdownError

NS = 1_000_000_000


# ---------------------------------------------------------------- queues
def test_queue_backpressure_and_drop():
    q = ThreadSafeQueue()
    q.push_nonblocking_dropping_if_full(1, 2)
    q.push_nonblocking_dropping_if_full(2, 2)
    dropped = q.push_nonblocking_dropping_if_full(3, 2)
    assert dropped
    assert q.pop_blocking() == 2  # 1 was dropped (oldest)
    assert q.pop_blocking() == 3


def test_queue_shutdown_wakes_consumer():
    q = ThreadSafeQueue()
    woke = []

    def consumer():
        try:
            q.pop_blocking()
        except ShutdownError:
            woke.append(True)

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    q.shutdown()
    t.join(timeout=2)
    assert woke == [True]


# ---------------------------------------------------------------- synchronizer
def test_frame_synchronizer_groups_stereo():
    """Analog of testSynchronizer.cpp:24-128: correct order, missing frames,
    out-of-order tolerance."""
    fs = FrameSynchronizer(2, tolerance_ns=5_000_000)
    assert fs.add_frame(1000 * NS, 0, "a0") is None
    g = fs.add_frame(1000 * NS + 1_000_000, 1, "a1")
    assert g is not None and set(g["images"]) == {0, 1}
    # missing partner: group dropped after buffer overflow
    assert fs.add_frame(2000 * NS, 0, "b0") is None
    assert fs.add_frame(3000 * NS, 0, "c0") is None
    assert fs.add_frame(4000 * NS, 0, "d0") is None
    assert fs.add_frame(5000 * NS, 0, "e0") is None  # b0's group evicted
    g = fs.add_frame(5000 * NS + 100_000, 1, "e1")
    assert g is not None
    # far-apart timestamps never group
    fs2 = FrameSynchronizer(2, tolerance_ns=5_000_000)
    fs2.add_frame(0, 0, "x")
    assert fs2.add_frame(50_000_000, 1, "y") is None


def install_stub(vio, stub):
    """Route both the single- and multi-camera detection paths to the stub."""
    vio.frontend.detect_and_describe = stub
    vio.frontend.detect_and_describe_multi = lambda images, T_WS=None: [
        stub(c, img, None) for c, img in enumerate(images)
    ]


# ---------------------------------------------------------------- full loop
def _make_params():
    p = read_config("/root/reference/config/config_fpga_p2_euroc.yaml")
    p.optimization.max_num_keypoints = 96
    return p


class StubDetector:
    """Ground-truth detector: projects world landmarks, descriptor per
    landmark = fixed random 512-bit word (+ a few flipped bits of noise)."""

    def __init__(self, rig, lms, max_kp=96, seed=0):
        self.rig = rig
        self.lms = lms
        self.max_kp = max_kp
        rng = np.random.default_rng(seed)
        self.descs = rng.integers(0, 2**32, (len(lms), 16), dtype=np.uint32)
        self.rng = rng
        self.T_WS_true = None  # set per frame by the test

    def __call__(self, cam_idx, image, T_WC=None):
        from okvis_tpu.frontend import kernels

        rig = self.rig
        T_WC = kin.compose(self.T_WS_true, rig.camera_T_SC(cam_idx))
        T_CW = kin.inverse(T_WC)
        uv, ok_j = kernels.project_points(
            rig.specs[cam_idx], rig.intrinsics[cam_idx], T_CW, jnp.asarray(self.lms)
        )
        ok = np.asarray(ok_j)
        idx = np.nonzero(ok)[0][: self.max_kp]
        K = self.max_kp
        uv_full = np.zeros((K, 2), np.float64)
        mask = np.zeros(K, bool)
        desc = np.zeros((K, 16), np.uint32)
        n = len(idx)
        uv_full[:n] = np.asarray(uv)[idx] + self.rng.normal(0, 0.4, (n, 2))
        mask[:n] = True
        desc[:n] = self.descs[idx]
        # flip ~6 random bits per descriptor (sensor noise)
        for i in range(n):
            for _ in range(6):
                w = self.rng.integers(0, 16)
                b = self.rng.integers(0, 32)
                desc[i, w] ^= np.uint32(1) << np.uint32(b)
        kps = Keypoints(
            uv=jnp.asarray(uv_full), score=jnp.ones(K), mask=jnp.asarray(mask)
        )
        return FrameData(
            keypoints=kps,
            descriptors=jnp.asarray(desc),
            landmark_ids=np.zeros(K, np.int64),
        )


@pytest.mark.slow
def test_threaded_vio_synthetic_tracking():
    """Full pipeline with stubbed detection: images+IMU in, trajectory out;
    ATE must be small (the SURVEY §7 step-6 end-to-end slice)."""
    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    traj = simulate_trajectory(duration=3.5, seed=21, motion_scale=0.5)
    lms = make_landmarks(traj, 220, seed=22, radius=(3.0, 10.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    frame_dt = 0.1
    imu_rate = 200
    n_frames = 30
    dummy_img = np.zeros((480, 752), np.float32)

    # feed measurements in timestamp order (okvis_app_synchronous.cpp:361)
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * imu_rate))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, dummy_img)
        vio.add_image(t_ns, 1, dummy_img)
        vio.wait_idle(timeout=60)

    table = vio.shutdown()
    assert len(vio.trajectory) >= n_frames - 3, f"only {len(vio.trajectory)} frames tracked"

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_p, gt_ts, traj.r)
    assert ate is not None
    assert ate < 0.05, f"ATE {ate:.4f} m too large\n{table}"
    # timing table exists for the pipeline stages (SURVEY §5.1)
    assert "3.1 optimization" in table


@pytest.mark.slow
def test_imu_rate_propagated_state_publishing():
    """IMU-rate state publishing (ref imuConsumerLoop real-time propagation):
    once an optimized state exists, every IMU sample yields a propagated
    state close to ground truth."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks

    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=1.2, seed=51, motion_scale=0.4)
    lms = make_landmarks(traj, 200, seed=52, radius=(3.0, 9.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)
    published = []
    vio.propagated_state_callback = lambda t, T, sb: published.append((t, np.asarray(T.r)))

    img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(10):
        t_ns = int(fi * 0.1 * NS)
        idx = int(round(fi * 0.1 * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i])
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.add_image(t_ns, 1, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    # IMU-rate output: ~20 samples per frame interval after the first state
    assert len(published) > 100, f"only {len(published)} propagated states"
    errs = []
    for t_ns, r in published[-60:]:
        idx = int(round(t_ns / NS * 200))
        errs.append(np.linalg.norm(r - traj.r[idx]))
    assert np.median(errs) < 0.05, f"propagated-state error {np.median(errs):.4f}"


def test_visualizer_overlay():
    """VioVisualizer analog: color-coded keypoint overlays render."""
    from okvis_tpu.frontend.detection import Keypoints
    from okvis_tpu.frontend.frame import FrameData, MultiFrame
    from okvis_tpu.pipeline.visualizer import draw_multiframe

    K = 8
    uv = jnp.asarray(np.random.default_rng(0).uniform(10, 90, (K, 2)))
    f = FrameData(
        keypoints=Keypoints(uv=uv, score=jnp.ones(K), mask=jnp.ones(K, bool)),
        descriptors=jnp.zeros((K, 16), jnp.uint32),
        landmark_ids=np.zeros(K, np.int64),
        image=jnp.full((100, 100), 100.0),
    )
    f.landmark_ids[0] = 7  # associated but unknown to estimator -> blue
    mf = MultiFrame(id=1, timestamp=0.0, frames=[f])
    imgs = draw_multiframe(mf)
    assert imgs[0].shape == (100, 100, 3)
    # red ring for unmatched keypoints must appear
    assert (imgs[0] == np.asarray([255, 60, 60], np.uint8)).all(-1).any()


@pytest.mark.slow
def test_mono_vio_tracking():
    """Monocular VIO (BASELINE.json config 1): single camera + IMU; the 2D-2D
    rotation-only vs relative RANSAC drives initialization, landmarks start
    at infinity for parallel rays, and scale comes from the IMU."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks

    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    # single-camera rig
    rig = NCameraSystem(
        specs=(specs[0],),
        T_SC=kin.SE3(r=T_SC.r[:1], q=T_SC.q[:1]),
        intrinsics=[intrinsics[0]],
    )
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=3.5, seed=61, motion_scale=0.6)
    lms = make_landmarks(traj, 240, seed=62, radius=(3.0, 9.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    img = np.zeros((480, 752), np.float32)
    imu_i = 0
    n_frames = 30
    for fi in range(n_frames):
        t_ns = int(fi * 0.1 * NS)
        idx = int(round(fi * 0.1 * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i])
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    assert len(vio.trajectory) >= n_frames - 3
    assert vio.frontend.is_initialized
    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    ate = ate_rmse(est_ts, est_p, (traj.ts * NS).astype(np.int64), traj.r)
    assert ate is not None
    # mono: scale only weakly observable through the IMU over 3.5 s —
    # allow a looser bound than stereo
    assert ate < 0.25, f"mono ATE {ate:.4f} m"


@pytest.mark.slow
def test_dataflow_call_counts():
    """testDataFlow analog (testDataFlow.cpp:24-113): feed 100 Hz IMU +
    10 Hz stereo for 1 s; stage call counts must match the routing."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks

    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=1.2, seed=71, motion_scale=0.3)
    lms = make_landmarks(traj, 150, seed=72)

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    counts = {"detect": 0, "assoc": 0, "opt": 0, "marg": 0}
    orig_multi = vio.frontend.detect_and_describe_multi
    vio.frontend.detect_and_describe_multi = lambda *a, **k: (
        counts.__setitem__("detect", counts["detect"] + 1) or orig_multi(*a, **k)
    )
    orig_assoc = vio.frontend.data_association_and_initialization
    def assoc(*a, **k):
        counts["assoc"] += 1
        return orig_assoc(*a, **k)
    vio.frontend.data_association_and_initialization = assoc
    est = vio.estimator
    orig_opt, orig_marg = est.optimize, est.apply_marginalization_strategy
    def opt(*a, **k):
        counts["opt"] += 1
        return orig_opt(*a, **k)
    def marg(*a, **k):
        counts["marg"] += 1
        return orig_marg(*a, **k)
    est.optimize, est.apply_marginalization_strategy = opt, marg

    img = np.zeros((480, 752), np.float32)
    n_frames = 10
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * 0.1 * NS)
        idx = int(round(fi * 0.1 * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i])
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.add_image(t_ns, 1, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    # one detection batch / association / optimize / marginalization per frame
    assert counts["detect"] == n_frames, counts
    assert counts["assoc"] == n_frames, counts
    assert counts["opt"] == n_frames, counts
    assert counts["marg"] == n_frames, counts
    assert len(vio.trajectory) == n_frames


def test_shutdown_under_load_nonblocking():
    """testThreading.cpp analog: clean construction/shutdown while
    measurements stream in non-blocking mode (queues shed, threads join)."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig

    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.overlaps = np.ones((2, 2), bool)
    vio = ThreadedVio(params, rig=rig, blocking=False, dtype=jnp.float64)

    stop = threading.Event()

    def feed_imu():
        t = 0
        while not stop.is_set():
            vio.add_imu_measurement(t, np.zeros(3), np.asarray([0, 0, 9.81]))
            t += 5_000_000
            time.sleep(0.0005)

    def feed_images():
        t = 0
        img = np.zeros((480, 752), np.float32)
        while not stop.is_set():
            vio.add_image(t, 0, img)
            vio.add_image(t, 1, img)
            t += 100_000_000
            time.sleep(0.005)

    threads = [threading.Thread(target=feed_imu), threading.Thread(target=feed_images)]
    for t in threads:
        t.start()
    time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    vio.shutdown()  # must not hang
    # generous grace under CPU contention (xdist workers share 2 cores with
    # jit compiles); the invariant is that every stage thread terminates
    deadline = time.time() + 20
    while time.time() < deadline and any(t.is_alive() for t in vio._threads):
        time.sleep(0.1)
    for t in vio._threads:
        assert not t.is_alive()


@pytest.mark.slow
def test_long_soak_capacities_bounded():
    """70-frame soak: window/landmark/observation capacities stay bounded
    and no slots leak (SURVEY §5.7 window boundedness)."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks

    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=7.2, seed=91, motion_scale=0.5)
    lms = make_landmarks(traj, 260, seed=92, radius=(3.0, 10.0))
    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    img = np.zeros((480, 752), np.float32)
    imu_i = 0
    est = vio.estimator
    n_frames = 70
    for fi in range(n_frames):
        t_ns = int(fi * 0.1 * NS)
        idx = int(round(fi * 0.1 * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i])
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.add_image(t_ns, 1, img)
        vio.wait_idle(timeout=120)
        # capacity invariants every frame
        assert est.num_frames() <= est.cfg.num_states
        assert est.num_landmarks() <= est.cfg.max_landmarks
        assert len(est.observations) <= est.cfg.max_observations
        # slot accounting never leaks
        assert est.num_frames() + len(est._free_state_slots) == est.cfg.num_states
        assert est.num_landmarks() + len(est._free_lm_slots) == est.cfg.max_landmarks
    vio.shutdown()
    assert len(vio.trajectory) >= n_frames - 3
    # IMU buffer trimmed (not growing unboundedly)
    assert len(vio._imu_ts) < 400
    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    ate = ate_rmse(est_ts, est_p, (traj.ts * NS).astype(np.int64), traj.r)
    assert ate is not None and ate < 0.1, f"soak ATE {ate}"


def test_per_state_extrinsics_config_wiring():
    """Nonzero sigma_c_relative_* must switch the pipeline's estimator into
    per-state (temporally varying) extrinsics mode — previously a silent
    no-op (VERDICT r1). A single nonzero relative sigma warns instead."""
    import logging

    params = _make_params()
    params.camera_params.sigma_c_relative_translation = 1e-4
    params.camera_params.sigma_c_relative_orientation = 1e-5
    params.camera_params.sigma_absolute_translation = 0.05
    params.camera_params.sigma_absolute_orientation = 0.02
    vio = ThreadedVio(params, blocking=True, dtype=jnp.float64)
    cfg = vio.estimator.cfg
    assert cfg.extrinsics_per_state
    assert cfg.sigma_c_relative_translation == 1e-4
    assert cfg.sigma_absolute_translation == 0.05
    assert cfg.dense_dim == cfg.num_states * 15 + cfg.num_cameras * 6 * (
        1 + cfg.num_states
    )
    vio.shutdown()

    params2 = _make_params()
    params2.camera_params.sigma_c_relative_translation = 1e-4  # orientation 0
    import io

    h = logging.StreamHandler(io.StringIO())
    logging.getLogger("okvis_tpu").addHandler(h)
    try:
        vio2 = ThreadedVio(params2, blocking=True, dtype=jnp.float64)
        assert not vio2.estimator.cfg.extrinsics_per_state
        assert "sigma_c_relative" in h.stream.getvalue()
        vio2.shutdown()
    finally:
        logging.getLogger("okvis_tpu").removeHandler(h)


@pytest.mark.slow
def test_online_extrinsics_calibration_pipeline():
    """BASELINE.json config 4 at pipeline level: the config's
    sigma_absolute_* enable T_SC estimation; a perturbed rig converges back
    toward the true inter-camera transform during tracking."""
    from okvis_tpu.datasets.synthetic import euroc_stereo_rig, make_landmarks

    params = _make_params()
    params.camera_params.sigma_absolute_translation = 0.05
    params.camera_params.sigma_absolute_orientation = 0.02

    specs, T_SC_true, intrinsics = euroc_stereo_rig()
    # the vio gets a PERTURBED rig; observations come from the true one
    d = jnp.asarray([[0.008, -0.005, 0.006, 0.004, -0.006, 0.005],
                     [-0.006, 0.007, -0.004, -0.005, 0.004, -0.006]])
    T_SC_bad = kin.oplus(T_SC_true, d)
    rig_bad = NCameraSystem(specs=tuple(specs), T_SC=T_SC_bad, intrinsics=intrinsics)
    rig_bad.overlaps = np.ones((2, 2), bool)
    rig_true = NCameraSystem(specs=tuple(specs), T_SC=T_SC_true, intrinsics=intrinsics)

    # 4.4 s / 42 frames: round 5's noise-floor rule creates the near-
    # static early pairs as bearing-only landmarks (parallax < 0.4 px
    # carries no REAL depth info — the stub's zero-noise observations
    # made tiny-baseline depths look informative, which no real
    # detector provides), so convergence needs the post-excitation
    # frames a 3 s clip barely contains.
    traj = simulate_trajectory(duration=4.4, seed=71, motion_scale=0.5)
    lms = make_landmarks(traj, 220, seed=72, radius=(3.0, 9.0))
    vio = ThreadedVio(params, rig=rig_bad, blocking=True, dtype=jnp.float64)
    assert vio.estimator.cfg.estimate_extrinsics
    stub = StubDetector(rig_true, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    def rel(r_SC, q_SC):
        T0 = kin.SE3(r=r_SC[0], q=q_SC[0])
        T1 = kin.SE3(r=r_SC[1], q=q_SC[1])
        return kin.compose(kin.inverse(T0), T1)

    rel_true = rel(T_SC_true.r, T_SC_true.q)
    err0 = np.abs(np.asarray(kin.minus(rel_true, rel(T_SC_bad.r, T_SC_bad.q)))).max()

    img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(42):
        t_ns = int(fi * 0.1 * NS)
        idx = int(round(fi * 0.1 * 200))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i])
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.add_image(t_ns, 1, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    est = vio.estimator
    err1 = np.abs(
        np.asarray(
            kin.minus(rel_true, rel(jnp.asarray(est.r_SC), jnp.asarray(est.q_SC)))
        )
    ).max()
    # >=20% error reduction over 3 s of data. The margin is deliberately
    # loose: association decisions are discrete (Hamming/chi² thresholds),
    # so per-host XLA:CPU codegen differences flip individual matches and
    # shift the short-clip convergence trajectory by a few percent (measured
    # 27–35% reduction across hosts for the identical seed); the reference-
    # parity triangulation gates also admit slightly fewer landmarks than a
    # fixed-sigma gate, slowing convergence on this short clip.
    assert err1 < 0.8 * err0, f"online calibration did not improve: {err0} -> {err1}"


class TestPoseViewer:
    """Headless PoseViewer analog (ref okvis_app_synchronous.cpp:55-195)."""

    def test_path_rendering_and_readout(self):
        from okvis_tpu.kinematics import se3
        from okvis_tpu.pipeline.pose_viewer import PoseViewer

        v = PoseViewer(image_size=200)
        for i in range(50):
            a = i / 50 * 2 * np.pi
            T = se3.SE3(r=np.array([np.cos(a), np.sin(a), 0.1 * i]),
                        q=np.array([0.0, 0.0, 0.0, 1.0]))
            sb = np.concatenate([[0.3, 0.0, 0.0], np.zeros(6)])
            v.publish_full_state_as_callback(i * 10**8, T, sb)
        img = v.render()
        assert img.shape == (200, 200, 3)
        # the path must actually be drawn (non-background pixels)
        assert (img != 255).any(axis=2).sum() > 100
        ro = v.last_readout()
        assert ro["n_states"] == 50
        assert abs(ro["speed_mps"] - 0.3) < 1e-9

    def test_empty_viewer_renders_blank(self):
        from okvis_tpu.pipeline.pose_viewer import PoseViewer

        v = PoseViewer(image_size=64)
        img = v.render()
        assert (img == 255).all()

    def test_save_png(self, tmp_path):
        from okvis_tpu.kinematics import se3
        from okvis_tpu.pipeline.pose_viewer import PoseViewer

        v = PoseViewer(image_size=64)
        for i in range(5):
            T = se3.SE3(r=np.array([float(i), 0.0, 0.0]),
                        q=np.array([0.0, 0.0, 0.0, 1.0]))
            v.publish_full_state_as_callback(i, T, np.zeros(9))
        p = tmp_path / "path.png"
        v.save(str(p))
        assert p.exists() and p.stat().st_size > 0


@pytest.mark.slow
def test_threaded_vio_distributed_ba():
    """Full pipeline with the sliding-window BA sharded over the 8-device
    virtual mesh (config `distributed: devices: 8`) — live multi-chip VIO.
    Accuracy must match the single-device pipeline bound."""
    params = _make_params()
    params.optimization.distributed_devices = 8
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    traj = simulate_trajectory(duration=2.0, seed=21, motion_scale=0.5)
    lms = make_landmarks(traj, 220, seed=22, radius=(3.0, 10.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    assert vio.estimator._mesh is not None
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    frame_dt = 0.1
    imu_rate = 200
    n_frames = 16
    dummy_img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * imu_rate))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, dummy_img)
        vio.add_image(t_ns, 1, dummy_img)
        vio.wait_idle(timeout=120)

    vio.shutdown()
    assert len(vio.trajectory) >= n_frames - 3
    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_p, gt_ts, traj.r)
    assert ate is not None and ate < 0.05, f"distributed-pipeline ATE {ate}"


@pytest.mark.slow
def test_csv_writers(tmp_path):
    """The VioInterface CSV surface (ref VioInterface.hpp:95-123): imu / pos /
    mag / per-camera tracks / state files get headers and streamed rows."""
    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=1.2, seed=21, motion_scale=0.5)
    lms = make_landmarks(traj, 180, seed=22, radius=(3.0, 10.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    vio.set_imu_csv_file(str(tmp_path / "imu.csv"))
    vio.set_pos_csv_file(str(tmp_path / "pos.csv"))
    vio.set_mag_csv_file(str(tmp_path / "mag.csv"))
    vio.set_tracks_csv_file(0, str(tmp_path / "tracks0.csv"))
    vio.set_state_csv_file(str(tmp_path / "state.csv"))
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    frame_dt, imu_rate, n_frames = 0.1, 200, 8
    dummy_img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * imu_rate))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        vio.add_position_measurement(t_ns, np.asarray([1.0, 2.0, 3.0]))
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, dummy_img)
        vio.add_image(t_ns, 1, dummy_img)
        vio.wait_idle(timeout=60)
    vio.shutdown()

    imu_rows = open(tmp_path / "imu.csv").readlines()
    assert imu_rows[0].startswith("timestamp, omega_tilde_WS_S_x")
    assert len(imu_rows) > imu_i - 5  # one row per accepted measurement
    pos_rows = open(tmp_path / "pos.csv").readlines()
    assert pos_rows[0].startswith("timestamp, pos_E")
    assert len(pos_rows) == 1 + n_frames
    mag_rows = open(tmp_path / "mag.csv").readlines()
    assert mag_rows == ["timestamp, mag_x, mag_y, mag_z\n"]  # header-only (input throws)
    tr_rows = open(tmp_path / "tracks0.csv").readlines()
    assert tr_rows[0].startswith("timestamp, landmark_id")
    assert len(tr_rows) > 10  # landmark-associated keypoints streamed
    st_rows = open(tmp_path / "state.csv").readlines()
    assert len(st_rows) >= n_frames - 2


@pytest.mark.slow
def test_distributed_plus_loop_closure_soak():
    """The two new layers together: sharded BA over the virtual mesh AND the
    pose-graph/loop-closure layer, over a longer run — interaction soak
    (capacities bounded, tracking maintained)."""
    params = _make_params()
    params.optimization.distributed_devices = 8
    params.posegraph.enabled = True
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()

    traj = simulate_trajectory(duration=3.0, seed=21, motion_scale=0.5)
    lms = make_landmarks(traj, 220, seed=22, radius=(3.0, 10.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    assert vio.estimator._mesh is not None and vio.posegraph is not None
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    install_stub(vio, stub)

    frame_dt, imu_rate, n_frames = 0.1, 200, 26
    dummy_img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * imu_rate))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            vio.add_imu_measurement(
                int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
            )
            imu_i += 1
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, dummy_img)
        vio.add_image(t_ns, 1, dummy_img)
        vio.wait_idle(timeout=120)

    est = vio.estimator
    # capacities bounded throughout
    assert len(est.states) <= est.cfg.num_states
    assert len(est.landmarks) <= est.cfg.max_landmarks
    assert len(est.observations) <= est.cfg.max_observations
    vio.shutdown()
    assert len(vio.trajectory) >= n_frames - 3
    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_p, gt_ts, traj.r)
    assert ate is not None and ate < 0.06, f"soak ATE {ate}"


@pytest.mark.slow
def test_fault_injection_blackout_and_imu_gap():
    """SURVEY §5.3 fault injection: a 2-frame detector blackout (lens
    obscured — zero keypoints) followed later by a dropped IMU packet burst
    must not crash or deadlock the pipeline; the faulted frames may shed,
    and tracking must recover on the healthy tail."""
    params = _make_params()
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    rig.compute_overlaps()
    traj = simulate_trajectory(duration=3.0, seed=81, motion_scale=0.4)
    lms = make_landmarks(traj, 220, seed=82, radius=(3.0, 10.0))

    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=jnp.float64)
    stub = StubDetector(rig, lms, max_kp=params.optimization.max_num_keypoints)
    blackout = {10, 11}  # frames where the detector returns nothing

    def faulty(cam_idx, image, T_WC=None):
        fd = stub(cam_idx, image, T_WC)
        if faulty.frame in blackout:
            K = fd.keypoints.uv.shape[0]
            return FrameData(
                keypoints=Keypoints(uv=jnp.zeros((K, 2)), score=jnp.zeros(K),
                                    mask=jnp.zeros(K, bool)),
                descriptors=jnp.zeros_like(fd.descriptors),
                landmark_ids=np.zeros(K, np.int64),
            )
        return fd

    faulty.frame = 0
    vio.frontend.detect_and_describe = faulty
    vio.frontend.detect_and_describe_multi = lambda images, T_WS=None: [
        faulty(c, img, None) for c, img in enumerate(images)
    ]

    frame_dt = 0.1
    imu_rate = 200
    n_frames = 26
    imu_gap_frames = {17}  # IMU packets for this frame interval are dropped
    img = np.zeros((480, 752), np.float32)
    imu_i = 0
    for fi in range(n_frames):
        t_ns = int(fi * frame_dt * NS)
        idx = int(round(fi * frame_dt * imu_rate))
        while imu_i < len(traj.ts) and int(traj.ts[imu_i] * NS) <= t_ns + 25_000_000:
            if fi not in imu_gap_frames:
                vio.add_imu_measurement(
                    int(traj.ts[imu_i] * NS), traj.gyro[imu_i], traj.acc[imu_i]
                )
            imu_i += 1
        faulty.frame = fi
        stub.T_WS_true = kin.SE3(r=jnp.asarray(traj.r[idx]), q=jnp.asarray(traj.q[idx]))
        vio.add_image(t_ns, 0, img)
        vio.add_image(t_ns, 1, img)
        vio.wait_idle(timeout=120)
    vio.shutdown()

    # faulted frames (and their immediate successors while re-associating)
    # may drop; the pipeline must keep the large majority and stay accurate
    # on the healthy tail after BOTH faults
    assert len(vio.trajectory) >= n_frames - 6, (
        f"only {len(vio.trajectory)} of {n_frames} frames survived the faults"
    )
    tail = [s for s in vio.trajectory if s.timestamp_ns >= int(19 * frame_dt * NS)]
    assert len(tail) >= 5, "pipeline never recovered after the IMU gap"
    est_ts = np.asarray([s.timestamp_ns for s in tail])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in tail])
    gt_ts = (traj.ts * NS).astype(np.int64)
    ate = ate_rmse(est_ts, est_p, gt_ts, traj.r)
    assert ate is not None and ate < 0.2, f"post-fault tail ATE {ate}"

"""EuRoC loader + CLI app test on a synthetic ASL-format dataset
(the full reference app path, okvis_app_synchronous.cpp:199-379, without the
real dataset — zero-egress environment)."""

import os

import numpy as np
import pytest

from okvis_tpu.cameras import NCameraSystem
from okvis_tpu.datasets.euroc import EurocDataset, ImageEvent, ImuSample
from okvis_tpu.datasets.synthetic import (
    euroc_stereo_rig,
    make_landmarks,
    simulate_trajectory,
    write_euroc_format,
)


@pytest.fixture(scope="module")
def synthetic_euroc(tmp_path_factory):
    out = tmp_path_factory.mktemp("euroc")
    traj = simulate_trajectory(duration=1.5, seed=41, motion_scale=0.25)
    specs, T_SC, intrinsics = euroc_stereo_rig()
    rig = NCameraSystem(specs=tuple(specs), T_SC=T_SC, intrinsics=intrinsics)
    lms = make_landmarks(traj, 240, seed=42, radius=(4.0, 8.0))
    mav0 = write_euroc_format(str(out), traj, lms, rig, frame_dt=0.1, n_frames=10)
    return mav0, traj, rig


def test_euroc_loader(synthetic_euroc):
    mav0, traj, rig = synthetic_euroc
    ds = EurocDataset(mav0, num_cameras=2)
    assert len(ds.imu) == len(traj.ts)
    assert len(ds.images) == 20  # 10 frames x 2 cams
    # ordering: strictly nondecreasing timestamps
    ms = list(ds.measurements())
    ts = [m.timestamp_ns for m in ms]
    assert ts == sorted(ts)
    # image loads as grayscale float
    img = ds.images[0].load()
    assert img.shape == (480, 752)
    # ground truth present with wxyz -> xyzw conversion
    gt = ds.ground_truth()
    assert gt is not None
    gt_ts, gt_p, gt_q = gt
    np.testing.assert_allclose(gt_p[0], traj.r[0], atol=1e-9)
    np.testing.assert_allclose(gt_q[5], traj.q[5], atol=1e-9)


@pytest.mark.slow
def test_run_euroc_app(synthetic_euroc, tmp_path):
    """The CLI driver end-to-end: config + dataset -> trajectory + ATE."""
    import jax.numpy as jnp

    from okvis_tpu.apps.run_euroc import run

    mav0, traj, rig = synthetic_euroc
    # the stock EuRoC config, with our synthetic rig's intrinsics patched in
    # via the rig override (config compat is covered by test_config)
    out = run(
        "/root/reference/config/config_fpga_p2_euroc.yaml",
        mav0,
        dtype=jnp.float64,
        trajectory_out=str(tmp_path / "traj.tum"),
        rig=rig,
        detection_threshold=15.0,
        max_keypoints=200,
    )
    assert out["frames_processed"] >= 6
    assert out["ate_rmse_m"] is not None
    assert out["ate_rmse_m"] < 0.2, out
    assert os.path.exists(tmp_path / "traj.tum")


@pytest.mark.slow
def test_euroc_sweep(synthetic_euroc, tmp_path):
    """Sweep harness: one present sequence + missing ones -> partial table."""
    import shutil

    from okvis_tpu.apps.euroc_sweep import EUROC_SEQUENCES, sweep

    mav0, traj, rig = synthetic_euroc
    root = tmp_path / "euroc_root"
    (root / "MH_01_easy").mkdir(parents=True)
    shutil.copytree(mav0, root / "MH_01_easy" / "mav0")

    summary = sweep(
        "/root/reference/config/config_fpga_p2_euroc.yaml",
        str(root),
        sequences=("MH_01_easy", "V1_01_easy"),
        out_dir=str(tmp_path / "out"),
    )
    assert len(EUROC_SEQUENCES) == 11
    assert summary["n_ok"] == 1
    assert summary["n_missing"] == 1
    mh = summary["sequences"]["MH_01_easy"]
    assert mh["status"] == "ok"
    # stock config on the synthetic set: generous bound (stock threshold 40)
    assert mh["ate_rmse_m"] is None or mh["ate_rmse_m"] < 1.0
    assert os.path.exists(mh["trajectory"])
    assert summary["sequences"]["V1_01_easy"]["status"] == "missing"


@pytest.mark.slow
def test_checkpoint_resume_cli(synthetic_euroc, tmp_path):
    """Pipeline checkpoint/resume (SURVEY §5.4, new vs reference): run the
    first half of the sequence with --checkpoint-out, resume a FRESH
    pipeline from the checkpoint for the second half, and keep tracking —
    the resumed session must re-associate against the checkpointed
    keyframes' keypoint tables, not re-initialize."""
    import jax.numpy as jnp

    from okvis_tpu.apps.run_euroc import run

    mav0, traj, rig = synthetic_euroc
    ckpt = str(tmp_path / "half.ckpt")
    out1 = run(
        "/root/reference/config/config_fpga_p2_euroc.yaml",
        mav0,
        dtype=jnp.float64,
        trajectory_out=str(tmp_path / "t1.tum"),
        rig=rig,
        detection_threshold=15.0,
        max_keypoints=200,
        max_frames=5,
        checkpoint_out=ckpt,
    )
    assert out1["frames_processed"] >= 3
    assert os.path.exists(ckpt) and os.path.exists(ckpt + ".est")

    out2 = run(
        "/root/reference/config/config_fpga_p2_euroc.yaml",
        mav0,
        0.5,  # skip the first half: continue where the checkpoint stopped
        dtype=jnp.float64,
        trajectory_out=str(tmp_path / "t2.tum"),
        rig=rig,
        detection_threshold=15.0,
        max_keypoints=200,
        resume=ckpt,
    )
    assert out2["frames_processed"] >= 4, out2
    assert out2["ate_rmse_m"] is not None
    assert out2["ate_rmse_m"] < 0.2, out2

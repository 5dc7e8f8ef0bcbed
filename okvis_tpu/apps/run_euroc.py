"""EuRoC dataset CLI driver.

TPU equivalent of the reference demo app
(/root/reference/okvis_apps/src/okvis_app_synchronous.cpp:199-379):

    python -m okvis_tpu.apps.run_euroc <config.yaml> <dataset>/mav0 [skip-sec]

Feeds all measurements in timestamp order in blocking mode, writes the
estimated trajectory in TUM format, and reports ATE RMSE against the EuRoC
ground truth plus the per-stage timing table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax.numpy as jnp
import numpy as np

from ..config import read_config
from ..datasets.euroc import EurocDataset, ImageEvent, ImuSample
from ..eval import ate_rmse, write_tum
from ..pipeline import ThreadedVio


def run(
    config_path: str,
    mav0_dir: str,
    skip_sec: float = 0.0,
    max_frames: int = 0,
    dtype=jnp.float32,
    trajectory_out: str = "trajectory.tum",
    rig=None,
    detection_threshold: float = None,
    max_keypoints: int = None,
    loop_closure: bool = False,
    pose_view: str = None,
    distributed_devices: int = 0,
    profile_dir: str = None,
    checkpoint_out: str = None,
    resume: str = None,
) -> dict:
    import os as _os

    if not _os.path.isdir(mav0_dir):
        raise SystemExit(f"error: dataset directory not found: {mav0_dir}")
    if not _os.path.isfile(config_path):
        raise SystemExit(f"error: config file not found: {config_path}")
    params = read_config(config_path)
    if detection_threshold is not None:
        params.optimization.detection_threshold = detection_threshold
    if max_keypoints is not None:
        params.optimization.max_num_keypoints = max_keypoints
    if loop_closure:
        params.posegraph.enabled = True
    if distributed_devices:
        params.optimization.distributed_devices = distributed_devices
    ds = EurocDataset(mav0_dir, num_cameras=len(params.cameras), skip_sec=skip_sec)
    vio = ThreadedVio(params, rig=rig, blocking=True, dtype=dtype)
    if resume:
        # long-sequence resume (SURVEY §5.4): restore the estimator window,
        # marginal prior, keyframe keypoint tables, and session epoch
        vio.load_checkpoint(resume)

    viewer = None
    if pose_view:
        from ..pipeline.pose_viewer import PoseViewer

        viewer = PoseViewer()
        vio.full_state_callback = viewer.publish_full_state_as_callback

    if profile_dir:
        # device-side observability (SURVEY §5.1): the host-side Timing
        # registry gives stage walls; jax.profiler gives per-kernel device
        # time. View with tensorboard / xprof.
        import jax

        jax.profiler.start_trace(profile_dir)
    n_frames = 0
    t_start = time.perf_counter()
    frame_limit = max_frames or 10**9
    try:
        for m in ds.measurements():
            if isinstance(m, ImuSample):
                vio.add_imu_measurement(m.timestamp_ns, m.gyro, m.acc)
            elif isinstance(m, ImageEvent):
                vio.add_image(m.timestamp_ns, m.cam_idx, m.load())
                if m.cam_idx == 0:
                    n_frames += 1
                    if n_frames >= frame_limit:
                        break
        vio.wait_idle(timeout=600)
        if checkpoint_out:
            vio.save_checkpoint(checkpoint_out)
    finally:
        if profile_dir:
            import jax

            jax.profiler.stop_trace()
    wall = time.perf_counter() - t_start
    timing_table = vio.shutdown()

    est_ts = np.asarray([s.timestamp_ns for s in vio.trajectory])
    est_p = np.stack([np.asarray(s.T_WS.r) for s in vio.trajectory]) if vio.trajectory else np.zeros((0, 3))
    est_q = np.stack([np.asarray(s.T_WS.q) for s in vio.trajectory]) if vio.trajectory else np.zeros((0, 4))
    if trajectory_out and len(est_ts):
        write_tum(trajectory_out, est_ts, est_p, est_q)

    out = {
        "frames_processed": len(vio.trajectory),
        "frames_fed": n_frames,
        "wall_s": wall,
        "frames_per_s": len(vio.trajectory) / wall if wall > 0 else 0.0,
        "ate_rmse_m": None,
    }
    gt = ds.ground_truth()
    if gt is not None and len(est_ts) >= 3:
        gt_ts, gt_p, _ = gt
        out["ate_rmse_m"] = ate_rmse(est_ts, est_p, gt_ts, gt_p)
    if vio.posegraph is not None:
        # the graph holds the loop-consistent keyframe trajectory
        kf_traj = vio.posegraph.trajectory()
        out["loop_closures"] = sum(
            1 for e in vio.posegraph.loop_events if e.accepted)
        out["posegraph_keyframes"] = len(kf_traj)
        if kf_traj:
            kf_ts = np.asarray([t for _, t, _, _ in kf_traj])
            kf_p = np.stack([r for _, _, r, _ in kf_traj])
            kf_q = np.stack([q for _, _, _, q in kf_traj])
            if trajectory_out:
                write_tum(trajectory_out + ".loop", kf_ts, kf_p, kf_q)
            if gt is not None and len(kf_ts) >= 3:
                out["ate_rmse_loop_m"] = ate_rmse(kf_ts, kf_p, gt_ts, gt_p)
    if viewer is not None:
        if vio.posegraph is not None and vio.posegraph.trajectory():
            viewer.add_loop_corrected(
                np.stack([r for _, _, r, _ in vio.posegraph.trajectory()]))
        viewer.save(pose_view)
    out["timing"] = timing_table
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("mav0")
    ap.add_argument("skip_sec", nargs="?", type=float, default=0.0)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--trajectory-out", default="trajectory.tum")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--loop-closure", action="store_true",
                    help="enable the pose-graph/loop-closure layer")
    ap.add_argument("--pose-view", default=None, metavar="OUT.png",
                    help="render the top-down trajectory view to a PNG "
                         "(headless PoseViewer analog)")
    ap.add_argument("--distributed", type=int, default=0, metavar="N",
                    help="shard the sliding-window BA over N devices")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler device trace to DIR")
    ap.add_argument("--checkpoint-out", default=None, metavar="CKPT",
                    help="save a resumable pipeline checkpoint at the end "
                         "of the run (writes CKPT and CKPT.est)")
    ap.add_argument("--resume", default=None, metavar="CKPT",
                    help="resume from a checkpoint written by "
                         "--checkpoint-out (combine with skip_sec to "
                         "continue mid-sequence)")
    args = ap.parse_args(argv)
    out = run(
        args.config,
        args.mav0,
        args.skip_sec,
        max_frames=args.max_frames,
        dtype=jnp.float64 if args.f64 else jnp.float32,
        trajectory_out=args.trajectory_out,
        loop_closure=args.loop_closure,
        pose_view=args.pose_view,
        distributed_devices=args.distributed,
        profile_dir=args.profile,
        checkpoint_out=args.checkpoint_out,
        resume=args.resume,
    )
    timing = out.pop("timing")
    print(timing, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
